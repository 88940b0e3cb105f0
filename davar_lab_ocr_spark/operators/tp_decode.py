"""Text Perceptron fiducial-point decode.

Re-expression of the reference kernel (davarocr/davar_det/core/
post_processing/lib/tp_points_generate.cpp:52-600, wrapper
post_tp_det.py:23-157) in pure python/numpy:

- label map overlay (bond > tail > head > text thresholds; cpp:478-500)
- per center-text component: DFS in (up, down, left, right) order
  collecting center pixels, counting surrounding background vs
  boundary pixels, and keeping the LARGEST adjacent head and tail
  component (cpp:108-205);
- filter: boundary ratio < filter_ratio, missing head/tail, <= 2
  center pixels (cpp:528-541);
- corner fiducials from head/tail regression maps:
  corner = pix * pool - geo[ch] * pool * 8 averaged over the region
  (cpp:546-580);
- remaining fiducials by recursive contour subdivision: midpoint from
  the +-10px band of center pixels, offset channel chosen by contour
  direction, fallback to linear interpolation when the band is empty
  (completeContours, cpp:255-433; integer-division midpoint fraction
  and the y*w_ratio split quirk preserved);
- output coords int-truncated after /scale_factor; (x<=0 and x==y)
  placeholder points dropped (post_tp_det.py:146-153).
"""

from __future__ import annotations

import numpy as np

POOL = 4
GEO_NORM = 8.0


def _label_map(text, head, tail, bond, thres_text, thres_head, thres_bond):
    m = np.zeros(text.shape, dtype=np.int8)
    m[text >= thres_text] = 1
    m[head >= thres_head] = 2
    m[tail >= thres_head] = 3
    m[bond >= thres_bond] = 4
    return m


def _collect_component(m, h0, w0, has_find):
    """DFS from a center pixel, exactly mirroring bfs_search's
    recursion (visit order up, down, left, right)."""
    height, width = m.shape
    points, heads, tails = [], [], []
    counts = {"back": 0, "bond": 0}

    def search_bond(h, w, typ, acc):
        stack = [(h, w)]
        while stack:
            ch, cw = stack.pop()
            if ch < 0 or ch >= height or cw < 0 or cw >= width:
                continue
            if has_find[ch, cw] == 1 or m[ch, cw] != typ:
                continue
            has_find[ch, cw] = 1
            acc.append((cw, ch))
            stack.extend([(ch - 1, cw), (ch + 1, cw), (ch, cw - 1), (ch, cw + 1)])

    stack = [(h0, w0)]
    while stack:
        h, w = stack.pop(0)
        if h < 0 or h >= height or w < 0 or w >= width:
            continue
        if has_find[h, w] == 1 or m[h, w] == -1:
            continue
        v = m[h, w]
        if v == 0:
            counts["back"] += 1
        elif v == 1:
            m[h, w] = -1
            has_find[h, w] = 1
            points.append((w, h))
            stack[0:0] = [(h - 1, w), (h + 1, w), (h, w - 1), (h, w + 1)]
        elif v == 4:
            counts["bond"] += 1
        elif v in (2, 3):
            counts["bond"] += 1
            has_find[h, w] = 1
            tmp = [(w, h)]
            for nh, nw in ((h - 1, w), (h + 1, w), (h, w - 1), (h, w + 1)):
                search_bond(nh, nw, v, tmp)
            target = heads if v == 2 else tails
            if len(tmp) > len(target):
                target[:] = tmp
    return points, heads, tails, counts


def _avg_corners(region, geo, height, width):
    """(top corner, bottom corner) averaged over region pixels."""
    tx = ty = bx = by = 0.0
    g = geo.reshape(4, height, width)
    for (w, h) in region:
        tx += w * POOL - g[0, h, w] * POOL * GEO_NORM
        ty += h * POOL - g[1, h, w] * POOL * GEO_NORM
        bx += w * POOL - g[2, h, w] * POOL * GEO_NORM
        by += h * POOL - g[3, h, w] * POOL * GEO_NORM
    n = len(region)
    return (tx / n, ty / n), (bx / n, by / n)


def _complete_contours(contour, start, end, points, geo_bond, height, width):
    """Recursive midpoint subdivision (completeContours parity)."""
    if end - start <= 1:
        return
    sx, sy = contour[start]
    ex, ey = contour[end]
    horizon = 999.0 if abs(ex - sx) < 1e-5 else abs((ey - sy) / (ex - sx))
    mid = (end + start) // 2
    frac = float(mid) / (end + start)
    mid_x = sx + (ex - sx) * frac
    mid_y = sy + (ey - sy) * frac
    g = geo_bond.reshape(4, height, width)
    if horizon > 1:  # vertical text
        band = [(w, h) for (w, h) in points if abs(h * POOL - mid_y) <= 10]
        top = [(w, h) for (w, h) in points if h * POOL < mid_y]
        bottom = [(w, h) for (w, h) in points if h * POOL >= mid_y]
        if band:
            ch = 0 if sy > ey else 2
            off = sum(w * POOL - g[ch, h, w] * POOL * GEO_NORM for (w, h) in band)
            contour[mid] = (off / len(band), mid_y)
        else:
            contour[mid] = (mid_x, mid_y)
        if sy < ey:
            _complete_contours(contour, start, mid, top, geo_bond, height, width)
            _complete_contours(contour, mid, end, bottom, geo_bond, height, width)
        else:
            _complete_contours(contour, start, mid, bottom, geo_bond, height, width)
            _complete_contours(contour, mid, end, top, geo_bond, height, width)
    else:  # horizontal text
        band = [(w, h) for (w, h) in points if abs(w * POOL - mid_x) <= 10]
        left = [(w, h) for (w, h) in points if w * POOL < mid_x]
        right = [(w, h) for (w, h) in points if w * POOL >= mid_x]
        if band:
            ch = 1 if sx < ex else 3
            off = sum(h * POOL - g[ch, h, w] * POOL * GEO_NORM for (w, h) in band)
            contour[mid] = (mid_x, off / len(band))
        else:
            contour[mid] = (mid_x, mid_y)
        if sx < ex:
            _complete_contours(contour, start, mid, left, geo_bond, height, width)
            _complete_contours(contour, mid, end, right, geo_bond, height, width)
        else:
            _complete_contours(contour, start, mid, right, geo_bond, height, width)
            _complete_contours(contour, mid, end, left, geo_bond, height, width)


def tp_decode_py(
    score_text,
    score_head,
    score_tail,
    score_bond,
    geo_head,
    geo_tail,
    geo_bond,
    h: int,
    w: int,
    scale_factor: float = 1.0,
    point_num: int = 14,
    filter_ratio: float = 0.5,
    thres_text: float = 0.45,
    thres_head: float = 0.5,
    thres_bond: float = 0.5,
) -> list[list[int]]:
    """Full TP decode for one document -> list of fiducial point lists."""
    text = np.asarray(score_text, dtype=np.float64).reshape(h, w)
    head = np.asarray(score_head, dtype=np.float64).reshape(h, w)
    tail = np.asarray(score_tail, dtype=np.float64).reshape(h, w)
    bond = np.asarray(score_bond, dtype=np.float64).reshape(h, w)
    gh = np.asarray(geo_head, dtype=np.float64)
    gt = np.asarray(geo_tail, dtype=np.float64)
    gb = np.asarray(geo_bond, dtype=np.float64)
    m = _label_map(text, head, tail, bond, thres_text, thres_head, thres_bond)

    results = []
    for hh in range(h):
        for ww in range(w):
            if m[hh, ww] != 1:
                continue
            has_find = np.zeros((h, w), dtype=np.int8)
            points, heads, tails, counts = _collect_component(m, hh, ww, has_find)
            denom = counts["bond"] + counts["back"]
            if denom == 0 or counts["bond"] / denom < filter_ratio:
                continue
            if not heads or not tails or len(points) <= 2:
                continue
            if heads == tails:
                continue
            contour = [(-1.0, -1.0)] * point_num
            (tl, bl) = _avg_corners(heads, gh, h, w)
            contour[0], contour[point_num - 1] = tl, bl
            (tr, br) = _avg_corners(tails, gt, h, w)
            contour[point_num // 2 - 1], contour[point_num // 2] = tr, br
            _complete_contours(contour, 0, point_num // 2 - 1, points, gb, h, w)
            _complete_contours(contour, point_num // 2, point_num - 1, points, gb, h, w)
            pts = []
            for (x, y) in contour:
                xi, yi = int(x / scale_factor), int(y / scale_factor)
                if xi <= 0 and xi == yi:
                    continue  # unfilled placeholder
                pts.extend([xi, yi])
            results.append(pts)
    return results


def tp_decode_stage(df, **kwargs):
    """mapInArrow over rows (doc_id, score_text, score_head, score_tail,
    score_bond, geo_head, geo_tail, geo_bond, h, w, scale_factor) ->
    (doc_id, polys array<array<int>>)."""
    import pyarrow as pa
    import pyspark.sql.types as T

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("polys", T.ArrayType(T.ArrayType(T.IntegerType()))),
        ]
    )

    def run(batches):
        for batch in batches:
            cols = {n: batch.column(n).to_pylist() for n in batch.schema.names}
            polys = []
            for i in range(batch.num_rows):
                polys.append(
                    tp_decode_py(
                        cols["score_text"][i], cols["score_head"][i], cols["score_tail"][i],
                        cols["score_bond"][i], cols["geo_head"][i], cols["geo_tail"][i],
                        cols["geo_bond"][i], cols["h"][i], cols["w"][i],
                        cols["scale_factor"][i], **kwargs,
                    )
                )
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), pa.array(polys, type=pa.list_(pa.list_(pa.int32())))],
                names=["doc_id", "polys"],
            )

    return df.mapInArrow(run, schema=out_schema)


def make_tp_fixture(x0=16, y0=16, x1=80, y1=32, h=16, w=28, scale_factor=1.0):
    """Horizontal rect text in image coords; head strip left, tail strip
    right, bond rows top/bottom, center interior. Every region pixel
    regresses to the exact planted corners/edges."""
    fx0, fy0, fx1, fy1 = x0 // 4, y0 // 4, x1 // 4, y1 // 4
    text = np.zeros((h, w))
    head = np.zeros((h, w))
    tail = np.zeros((h, w))
    bond = np.zeros((h, w))
    geo_head = np.zeros((4, h, w))
    geo_tail = np.zeros((4, h, w))
    geo_bond = np.zeros((4, h, w))

    bond[fy0, fx0 : fx1 + 1] = 0.9
    bond[fy1, fx0 : fx1 + 1] = 0.9
    head[fy0 + 1 : fy1, fx0 : fx0 + 2] = 0.9
    tail[fy0 + 1 : fy1, fx1 - 1 : fx1 + 1] = 0.9
    text[fy0 + 1 : fy1, fx0 + 2 : fx1 - 1] = 0.9

    ys, xs = np.nonzero(head > 0)
    geo_head[0, ys, xs] = (xs * 4 - x0) / 32.0
    geo_head[1, ys, xs] = (ys * 4 - y0) / 32.0
    geo_head[2, ys, xs] = (xs * 4 - x0) / 32.0
    geo_head[3, ys, xs] = (ys * 4 - y1) / 32.0
    ys, xs = np.nonzero(tail > 0)
    geo_tail[0, ys, xs] = (xs * 4 - x1) / 32.0
    geo_tail[1, ys, xs] = (ys * 4 - y0) / 32.0
    geo_tail[2, ys, xs] = (xs * 4 - x1) / 32.0
    geo_tail[3, ys, xs] = (ys * 4 - y1) / 32.0
    ys, xs = np.nonzero(text > 0)
    geo_bond[1, ys, xs] = (ys * 4 - y0) / 32.0
    geo_bond[3, ys, xs] = (ys * 4 - y1) / 32.0

    return dict(
        score_text=text.reshape(-1).tolist(),
        score_head=head.reshape(-1).tolist(),
        score_tail=tail.reshape(-1).tolist(),
        score_bond=bond.reshape(-1).tolist(),
        geo_head=geo_head.reshape(-1).tolist(),
        geo_tail=geo_tail.reshape(-1).tolist(),
        geo_bond=geo_bond.reshape(-1).tolist(),
        h=h,
        w=w,
        scale_factor=scale_factor,
    )
