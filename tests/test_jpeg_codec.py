"""Baseline JPEG codec tests (functions/jpeg.py): roundtrips through
the real entropy layer, marker/metadata parse, restart markers,
subsampling, and the honest progressive gate."""

import numpy as np
import pytest

from davar_lab_ocr_spark.functions.jpeg import (
    ZIGZAG,
    jpeg_decode,
    jpeg_encode,
    jpeg_meta,
)


def _smooth_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (100 + yy).clip(0, 255)
    g = (80 + xx).clip(0, 255)
    b = (60 + (yy + xx) // 2).clip(0, 255)
    return np.stack([r, g, b], -1).astype(np.uint8)


def test_zigzag_prefix():
    # first 10 slots of the canonical T.81 zigzag (row-major flat idx)
    assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]


def test_solid_gray_exact_roundtrip():
    img = np.full((16, 24), 200, np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=90))
    assert out.shape == (16, 24, 1)
    assert np.array_equal(out[:, :, 0], img)


def test_gray_gradient_close_odd_dims():
    yy, xx = np.mgrid[0:37, 0:53]
    img = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=95))
    assert out.shape == (37, 53, 1)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 10


def test_gray_sampling_factors_ignored_noninterleaved():
    """T.81 A.2.2: a 1-component scan decodes non-interleaved (one 8x8
    block per MCU, row-major), SOF sampling factors ignored. Patch the
    encoder's grayscale SOF component byte 0x11 -> 0x22: a compliant
    decoder must produce identical pixels; the pre-r5 interleaved path
    scrambled block placement (r4 ADVICE)."""
    yy, xx = np.mgrid[0:32, 0:40]
    img = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    data = jpeg_encode(img, quality=95)
    # locate SOF0 (FF C0); component spec starts 10 bytes after marker:
    # len(2) prec(1) h(2) w(2) ncomp(1) cid(1) -> hv byte
    sof = data.index(b"\xff\xc0")
    hv_at = sof + 2 + 8 + 1
    assert data[hv_at] == 0x11
    patched = data[:hv_at] + b"\x22" + data[hv_at + 1:]
    base = jpeg_decode(data)
    out = jpeg_decode(patched)
    assert np.array_equal(out, base)


def test_color_444_and_420_close():
    img = _smooth_rgb(45, 57)
    out444 = jpeg_decode(jpeg_encode(img, quality=95))
    assert out444.shape == (45, 57, 3)
    assert np.abs(out444.astype(int) - img.astype(int)).max() <= 4
    out420 = jpeg_decode(jpeg_encode(img, quality=95, subsample=2))
    assert out420.shape == (45, 57, 3)
    assert np.abs(out420.astype(int) - img.astype(int)).max() <= 8


def test_restart_markers_do_not_change_pixels():
    img = _smooth_rgb(40, 40)
    plain = jpeg_decode(jpeg_encode(img, quality=92))
    rst = jpeg_decode(jpeg_encode(img, quality=92, restart_interval=3))
    assert np.array_equal(plain, rst)
    rst420 = jpeg_decode(jpeg_encode(img, quality=92, subsample=2, restart_interval=2))
    plain420 = jpeg_decode(jpeg_encode(img, quality=92, subsample=2))
    assert np.array_equal(rst420, plain420)


def test_meta_parses_sof_only():
    b = jpeg_encode(_smooth_rgb(33, 41), quality=80, subsample=2)
    assert jpeg_meta(b) == (33, 41, 3)
    b1 = jpeg_encode(np.zeros((12, 9), np.uint8))
    assert jpeg_meta(b1) == (12, 9, 1)


def test_progressive_roundtrip_matches_baseline():
    """SOF2 decode: the progressive encoder quantizes identically to
    the baseline one, so the progressive decode must be pixel-equal to
    the baseline decode of the same image — DC/AC first scans with
    point transform, successive-approximation refinement, spectral
    bands, per-scan DHT redefinition all in play."""
    from davar_lab_ocr_spark.functions.jpeg import jpeg_encode_progressive

    yy, xx = np.mgrid[0:37, 0:53]
    gray = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    base = jpeg_decode(jpeg_encode(gray, quality=95))
    prog = jpeg_encode_progressive(gray, quality=95)
    assert jpeg_meta(prog) == (37, 53, 1)
    assert np.array_equal(jpeg_decode(prog), base)

    img = _smooth_rgb(45, 57)
    for ss in (1, 2):  # 4:4:4 and 4:2:0 (interleaved DC scan shapes)
        b = jpeg_decode(jpeg_encode(img, quality=90, subsample=ss))
        p = jpeg_decode(jpeg_encode_progressive(img, quality=90, subsample=ss))
        assert np.array_equal(p, b)


def test_progressive_eobrun_and_dense_blocks():
    # flat regions accumulate EOBRUN > 1 across blocks; noise fills
    # bands densely (ZRL + refinement correction-bit paths)
    from davar_lab_ocr_spark.functions.jpeg import jpeg_encode_progressive

    rng = np.random.default_rng(3)
    flat = np.full((64, 64, 3), 130, np.uint8)
    flat[20:28, 24:40] = [250, 10, 60]  # one busy island in a flat sea
    for img in (flat, rng.integers(0, 256, (40, 64, 3), dtype=np.uint8)):
        b = jpeg_decode(jpeg_encode(img, quality=92))
        p = jpeg_decode(jpeg_encode_progressive(img, quality=92))
        assert np.array_equal(p, b)


def test_progressive_restart_markers():
    """RSTn markers inside progressive scans: the decoder must reset
    DC predictors AND the EOB run at each boundary; roundtrips stay
    pixel-equal to baseline for interleaved (DC) and non-interleaved
    (AC) scans at several intervals, color and gray."""
    from davar_lab_ocr_spark.functions.jpeg import jpeg_encode_progressive

    img = _smooth_rgb(45, 57)
    for ri in (1, 3):
        for ss in (1, 2):
            b = jpeg_decode(jpeg_encode(img, quality=90, subsample=ss))
            p = jpeg_decode(
                jpeg_encode_progressive(img, quality=90, subsample=ss,
                                        restart_interval=ri)
            )
            assert np.array_equal(p, b)
    yy, xx = np.mgrid[0:37, 0:53]
    gray = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    base = jpeg_decode(jpeg_encode(gray, quality=95))
    for ri in (1, 5):
        data = jpeg_encode_progressive(gray, quality=95, restart_interval=ri)
        assert b"\xff\xdd" in data  # DRI present
        assert np.array_equal(jpeg_decode(data), base)


def test_progressive_truncated_is_valueerror():
    from davar_lab_ocr_spark.functions.jpeg import jpeg_encode_progressive

    data = jpeg_encode_progressive(_smooth_rgb(24, 24), quality=90)
    with pytest.raises(ValueError):
        jpeg_decode(data[: len(data) * 2 // 3])


def test_non_huffman_sof_still_gated():
    # SOF9 (arithmetic sequential) must stay honestly gated
    b = bytearray(jpeg_encode(np.zeros((8, 8), np.uint8)))
    i = bytes(b).find(b"\xff\xc0")
    b[i + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        jpeg_meta(bytes(b))
    with pytest.raises(NotImplementedError):
        jpeg_decode(bytes(b))


def test_quality_monotone_size():
    img = _smooth_rgb(64, 64)
    assert len(jpeg_encode(img, quality=95)) > len(jpeg_encode(img, quality=40))


def test_payload_paths_accept_jpeg():
    from davar_lab_ocr_spark.operators.multimodal import (
        fake_payload,
        payload_meta,
        payload_to_array,
    )

    ref = "media://doc/7.jpg"
    payload = fake_payload(ref)
    assert payload.startswith(b"\xff\xd8")
    import hashlib

    d = hashlib.md5(ref.encode()).digest()
    h, w = 32 + d[0] % 96, 32 + d[1] % 96
    c = 1 if d[2] % 2 == 0 else 3
    assert payload_meta(payload) == (h, w, c)
    arr = payload_to_array(payload)
    assert arr.shape == (h, w, c) and arr.dtype == np.uint8


def test_noise_roundtrip_tight():
    # regression: dequantization must reorder zigzag->natural BEFORE
    # multiplying by the (natural-order) quant table; with the orders
    # crossed, high-frequency content decodes against wrong quant
    # values and random-noise roundtrip error explodes (~200)
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (40, 56), np.uint8)
    out = jpeg_decode(jpeg_encode(img, quality=95))
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 12


def test_truncated_stream_is_valueerror_and_none_payload():
    # corrupt/truncated payloads: ValueError from the codec (not a
    # private exception), None from the payload path
    from davar_lab_ocr_spark.operators.multimodal import payload_to_array

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (32, 32, 3), np.uint8)
    b = jpeg_encode(img, quality=90, subsample=2)
    trunc = b[: len(b) // 2] + b"\xff\xd9"
    with pytest.raises(ValueError):
        jpeg_decode(trunc)
    assert payload_to_array(trunc) is None
