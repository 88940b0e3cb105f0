"""Pure-numpy pixel kernel goldens (perspective / bilinear / quad crop;
semantics: loading_utils.py:81-146 cv2 chain) and the Arrow transform
stage."""

import numpy as np
import pytest

from davar_lab_ocr_spark.functions.image import (
    clc_points,
    crop_and_transform,
    get_perspective_transform,
    resize_bilinear,
    warp_perspective,
)


def test_perspective_transform_identity_and_scale():
    sq = [[0, 0], [10, 0], [10, 10], [0, 10]]
    assert np.allclose(get_perspective_transform(sq, sq), np.eye(3))
    m = get_perspective_transform(sq, [[0, 0], [20, 0], [20, 5], [0, 5]])
    p = m @ np.array([10.0, 10.0, 1.0])
    assert np.allclose(p[:2] / p[2], [20, 5])


def test_warp_identity_and_translation():
    img = np.arange(64, dtype=np.float64).reshape(8, 8)
    assert np.allclose(warp_perspective(img, np.eye(3), 8, 8), img)
    mt = np.eye(3)
    mt[0, 2] = 2.0
    out = warp_perspective(img, mt, 8, 8)
    assert np.allclose(out[:, 2:], img[:, :6])
    assert np.allclose(out[:, :2], 0.0)  # constant border


def test_resize_bilinear_goldens():
    img = np.arange(64, dtype=np.float64).reshape(8, 8)
    assert np.allclose(resize_bilinear(img, 8, 8), img)
    assert np.allclose(resize_bilinear(np.full((5, 7), 3.25), 10, 14), 3.25)
    # hand-computed center-aligned 2 -> 4 upscale with edge clamp
    r = resize_bilinear(np.array([[0.0, 2.0]]), 1, 4)
    assert np.allclose(r, [[0.0, 0.5, 1.5, 2.0]])


def test_crop_axis_aligned_equals_slice():
    img = np.random.default_rng(3).integers(0, 255, size=(20, 30, 3)).astype(np.float64)
    got = crop_and_transform(img, [5, 4, 15, 4, 15, 12, 5, 12])
    assert np.allclose(got, img[4:12, 5:15])
    got = crop_and_transform(img, [5, 4, 15, 4, 15, 12, 5, 12], crop_only=True)
    assert np.allclose(got, img[4:12, 5:15])


def test_crop_rotated_quad_rectifies():
    # 45-degree square quad on a constant field -> near-square patch of
    # the field value (interior), via min-area-rect + perspective warp
    img = np.full((40, 40), 7.0)
    quad = [10, 20, 20, 10, 30, 20, 20, 30]
    out = crop_and_transform(img, quad)
    assert abs(out.shape[0] - out.shape[1]) <= 1 and out.shape[0] >= 12
    assert out[out.shape[0] // 2, out.shape[1] // 2] == pytest.approx(7.0)


def test_clc_points_order():
    assert np.allclose(
        clc_points([[9, 9], [0, 9], [0, 0], [9, 0]]),
        [[0, 0], [9, 0], [9, 9], [0, 9]],
    )


def test_transform_media_stage(spark):
    from davar_lab_ocr_spark.operators.multimodal import (
        fake_payload,
        fetch_media_stage,
        payload_to_array,
        transform_media_stage,
    )
    from davar_lab_ocr_spark.functions.image import crop_and_transform as cat
    from davar_lab_ocr_spark.functions.image import resize_bilinear as rb
    import hashlib

    refs = [("media://t/1.png",), ("media://t/2.png",)]
    df = spark.createDataFrame(refs, "media_ref string")
    out = transform_media_stage(fetch_media_stage(df)).collect()
    assert all(r["t_height"] == 32 and r["t_width"] == 100 for r in out)

    # bit-exact vs a local single-process replay of the same kernels
    for r in out:
        img = payload_to_array(fake_payload(r["media_ref"]))
        h, w = img.shape[:2]
        patch = cat(img, [0.0, 0.0, float(w), 0.0, float(w), float(h), 0.0, float(h)])
        buf = np.ascontiguousarray(np.round(rb(patch, 32, 100)).astype(np.uint8))
        assert r["t_digest"] == hashlib.md5(buf.tobytes()).hexdigest()
