"""Pure-numpy pixel kernels: perspective transform, bilinear warp /
resize, quad crop.

Replaces the cv2 calls of the reference's recognition crop path
(davarocr/davar_rcg/datasets/pipelines/utils/loading_utils.py:81-146:
clc_points + crop_and_transform with cv2.minAreaRect / boxPoints /
getPerspectiveTransform / warpPerspective) and the resize kernels
(transforms.py DavarResize) with vectorized numpy — no image library
needed. Codec parsing (png/jpeg byte decode) is the only part still
env-gated in operators/multimodal.py.
"""

from __future__ import annotations

import numpy as np

from .geometry import min_area_rect


def clc_points(points) -> np.ndarray:
    """Reorder 4 corner points to [left_top, right_top, right_bottom,
    left_bottom] (loading_utils.py:81-102: split by x into left/right
    pairs, sort each pair by y)."""
    pts = [list(map(int, p)) for p in np.asarray(points)]
    by_x = sorted(pts, key=lambda p: p[0])
    left = sorted(by_x[:2], key=lambda p: p[1])
    right = sorted(by_x[2:], key=lambda p: p[1])
    return np.asarray([left[0], right[0], right[1], left[1]], dtype=np.float64)


def get_perspective_transform(src, dst) -> np.ndarray:
    """3x3 homography H with dst ~ H @ src for 4 point pairs (the
    cv2.getPerspectiveTransform linear system: 8 unknowns, h22 = 1)."""
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    a = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        a[2 * i] = [x, y, 1, 0, 0, 0, -x * u, -y * u]
        a[2 * i + 1] = [0, 0, 0, x, y, 1, -x * v, -y * v]
        b[2 * i] = u
        b[2 * i + 1] = v
    h = np.linalg.solve(a, b)
    return np.append(h, 1.0).reshape(3, 3)


def _bilinear_sample(img: np.ndarray, xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Sample img at float coords (constant 0 border). img (H, W[, C]);
    xs/ys any shape -> samples of shape xs.shape [+ (C,)]."""
    h, w = img.shape[:2]
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    x0 = np.floor(xs).astype(np.int64)
    y0 = np.floor(ys).astype(np.int64)
    fx = (xs - x0)[..., None]
    fy = (ys - y0)[..., None]

    def at(yy, xx):
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        out = np.zeros(yy.shape + (img.shape[2],), dtype=np.float64)
        out[valid] = img[yy[valid], xx[valid]]
        return out

    top = at(y0, x0) * (1 - fx) + at(y0, x0 + 1) * fx
    bot = at(y0 + 1, x0) * (1 - fx) + at(y0 + 1, x0 + 1) * fx
    res = top * (1 - fy) + bot * fy
    return res[..., 0] if squeeze else res


def warp_perspective(img: np.ndarray, m: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """cv2.warpPerspective semantics: each destination grid coordinate
    (x, y) maps through inv(m) to a source coordinate, bilinear-sampled
    with constant-0 border."""
    inv = np.linalg.inv(np.asarray(m, dtype=np.float64))
    ys, xs = np.mgrid[0:out_h, 0:out_w].astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        denom = inv[2, 0] * xs + inv[2, 1] * ys + inv[2, 2]
        sx = (inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]) / denom
        sy = (inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]) / denom
    # points at infinity (denom 0 under a degenerate homography) sample
    # the constant border, deterministically and without warnings
    sx = np.nan_to_num(sx, nan=-1.0, posinf=-1.0, neginf=-1.0)
    sy = np.nan_to_num(sy, nan=-1.0, posinf=-1.0, neginf=-1.0)
    out = _bilinear_sample(img.astype(np.float64), sx, sy)
    return out.astype(img.dtype) if np.issubdtype(img.dtype, np.integer) else out


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """cv2.resize INTER_LINEAR semantics: pixel-center alignment,
    src = (dst + 0.5) * (in/out) - 0.5, edge-clamped sampling."""
    h, w = img.shape[:2]
    ys = np.clip((np.arange(out_h) + 0.5) * (h / out_h) - 0.5, 0, h - 1)
    xs = np.clip((np.arange(out_w) + 0.5) * (w / out_w) - 0.5, 0, w - 1)
    gx, gy = np.meshgrid(xs, ys)
    # clamp instead of zero-border: indices are inside [0, dim-1] already,
    # but floor+1 can step outside — clamp the integer neighbors
    squeeze = img.ndim == 2
    arr = img.astype(np.float64)
    if squeeze:
        arr = arr[..., None]
    x0 = np.floor(gx).astype(np.int64)
    y0 = np.floor(gy).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = (gx - x0)[..., None]
    fy = (gy - y0)[..., None]
    top = arr[y0, x0] * (1 - fx) + arr[y0, x1] * fx
    bot = arr[y1, x0] * (1 - fx) + arr[y1, x1] * fx
    res = top * (1 - fy) + bot * fy
    if squeeze:
        res = res[..., 0]
    return res.astype(img.dtype) if np.issubdtype(img.dtype, np.integer) else res


def crop_and_transform(img: np.ndarray, bbox, crop_only: bool = False) -> np.ndarray:
    """Quad crop + rectification (loading_utils.py:105-146): clip the
    quad's bbox to the image, slice-crop, then (unless crop_only)
    rectify via min-area-rect corners -> clc order -> perspective warp
    to an axis-aligned (width, height) patch."""
    points = np.int32(np.asarray(bbox).reshape(4, 2))
    min_x, max_x = int(points[:, 0].min()), int(points[:, 0].max())
    min_y, max_y = int(points[:, 1].min()), int(points[:, 1].max())
    min_x, min_y = max(0, min_x), max(0, min_y)
    max_x, max_y = min(img.shape[1], max_x), min(img.shape[0], max_y)
    crop = img[min_y:max_y, min_x:max_x] if img.ndim == 2 else img[min_y:max_y, min_x:max_x, :]
    if crop_only:
        return crop
    shifted = points - np.asarray([[min_x, min_y]])
    rect = min_area_rect(shifted)
    c_points = clc_points(rect)
    width = int(np.linalg.norm(c_points[1] - c_points[0]))
    height = int(np.linalg.norm(c_points[2] - c_points[1]))
    if width <= 0 or height <= 0:
        return crop
    dst = np.asarray([[0, 0], [width, 0], [width, height], [0, height]], dtype=np.float64)
    try:
        m = get_perspective_transform(c_points, dst)
    except np.linalg.LinAlgError:
        # int truncation can collapse a thin quad into collinear /
        # duplicate source points (singular system); cv2 degrades
        # gracefully there — so do we, by returning the plain crop
        return crop
    return warp_perspective(crop, m, width, height)
