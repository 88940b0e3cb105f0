"""Pure-stdlib PNG codec tests: roundtrips across every filter type and
channel count, metadata fast path, and gate behavior."""

import numpy as np
import pytest

from davar_lab_ocr_spark.functions.png import png_decode, png_encode, png_meta


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_roundtrip_all_filters_and_channels(channels, filter_type):
    rng = np.random.default_rng(10 * channels + filter_type)
    arr = rng.integers(0, 256, size=(13, 17, channels), dtype=np.uint8)
    data = png_encode(arr, filter_type=filter_type)
    assert png_meta(data) == (13, 17, channels)
    out = png_decode(data)
    assert (out == arr).all()


def test_gradient_image_roundtrip():
    # smooth gradients are where Sub/Average/Paeth filters actually bite
    y, x = np.mgrid[0:40, 0:60]
    arr = np.stack([(x * 4) % 256, (y * 3) % 256, (x + y) % 256], axis=-1).astype(np.uint8)
    for ft in range(5):
        assert (png_decode(png_encode(arr, filter_type=ft)) == arr).all()


def test_grayscale_2d_input():
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = png_decode(png_encode(arr))
    assert out.shape == (8, 8, 1)
    assert (out[:, :, 0] == arr).all()


def test_meta_rejects_non_png():
    with pytest.raises(ValueError):
        png_meta(b"\xff\xd8\xffjpegdata")


def test_unsupported_shapes_gated():
    import struct
    import zlib

    from davar_lab_ocr_spark.functions.png import MAGIC, _chunk

    # 16-bit and Adam7 are real as of r5; what remains gated is e.g.
    # a bogus bit depth for the color type (palette at depth 16)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 3, 0, 0, 0)
    data = MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(NotImplementedError):
        png_meta(data)


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_palette_roundtrip_all_depths(depth):
    from davar_lab_ocr_spark.functions.png import png_decode, png_encode_palette, png_meta

    rng = np.random.default_rng(depth)
    n = 1 << depth
    h, w = 13, 21  # odd width exercises sub-byte row padding
    idx = rng.integers(0, n, size=(h, w), dtype=np.uint8)
    palette = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    data = png_encode_palette(idx, palette, depth=depth)
    assert png_meta(data) == (h, w, 3)
    out = png_decode(data)
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, palette[idx])


def test_palette_trns_alpha_and_filters():
    from davar_lab_ocr_spark.functions.png import png_decode, png_encode_palette, png_meta

    rng = np.random.default_rng(7)
    idx = rng.integers(0, 5, size=(9, 17), dtype=np.uint8)
    palette = rng.integers(0, 256, size=(5, 3), dtype=np.uint8)
    # tRNS shorter than the palette: trailing entries default opaque
    trns = np.array([0, 128, 255], dtype=np.uint8)
    for ft in (0, 1, 2):
        data = png_encode_palette(idx, palette, trns=trns, depth=8, filter_type=ft)
        assert png_meta(data) == (9, 17, 4)
        out = png_decode(data)
        assert out.shape == (9, 17, 4)
        assert np.array_equal(out[:, :, :3], palette[idx])
        alpha_lut = np.array([0, 128, 255, 255, 255], dtype=np.uint8)
        assert np.array_equal(out[:, :, 3], alpha_lut[idx])


def test_palette_sub_byte_filters_use_bpp1():
    """Sub filter on a 4-bit palette row operates on raw BYTES (two
    pixels per unit) — regression for the generalized _unfilter."""
    from davar_lab_ocr_spark.functions.png import png_decode, png_encode_palette

    idx = np.tile(np.arange(16, dtype=np.uint8), (6, 3))  # (6, 48)
    palette = np.arange(48, dtype=np.uint8).reshape(16, 3)
    a = png_decode(png_encode_palette(idx, palette, depth=4, filter_type=0))
    b = png_decode(png_encode_palette(idx, palette, depth=4, filter_type=1))
    c = png_decode(png_encode_palette(idx, palette, depth=4, filter_type=2))
    assert np.array_equal(a, b) and np.array_equal(a, c)


@pytest.mark.parametrize("shape", [(13, 21), (13, 21, 3), (16, 16, 4), (1, 1), (7, 9, 2)])
def test_adam7_interlaced_roundtrip(shape):
    """Adam7 decode: per-pass unfilter + scatter equals the source for
    every channel count, including dims smaller than a full pass grid
    (1x1 exercises the empty-pass skip)."""
    from davar_lab_ocr_spark.functions.png import png_decode, png_encode_adam7

    rng = np.random.default_rng(sum(shape))
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = png_decode(png_encode_adam7(img))
    ref = img[:, :, None] if img.ndim == 2 else img
    assert np.array_equal(out, ref)


def test_16bit_depth_high_byte():
    from davar_lab_ocr_spark.functions.png import png_decode, png_encode_16bit, png_meta

    rng = np.random.default_rng(9)
    img16 = rng.integers(0, 65536, size=(11, 17, 3), dtype=np.uint16)
    for ft in (0, 2):
        data = png_encode_16bit(img16, filter_type=ft)
        assert png_meta(data) == (11, 17, 3)
        assert np.array_equal(png_decode(data), (img16 >> 8).astype(np.uint8))


def test_palette_malformed_rejected():
    import struct
    import zlib as _z

    from davar_lab_ocr_spark.functions.png import (
        MAGIC,
        _chunk,
        png_decode,
        png_encode_palette,
    )

    idx = np.zeros((4, 4), np.uint8)
    palette = np.zeros((2, 3), np.uint8)
    good = png_encode_palette(idx, palette)
    # strip the PLTE chunk -> ValueError, not a crash
    plte_at = good.index(b"PLTE") - 4
    (ln,) = struct.unpack(">I", good[plte_at : plte_at + 4])
    no_plte = good[:plte_at] + good[plte_at + 12 + ln :]
    with pytest.raises(ValueError):
        png_decode(no_plte)
    # index beyond the palette -> ValueError
    with pytest.raises(ValueError):
        png_encode_palette(np.full((2, 2), 7, np.uint8), palette)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = _z.compress(bytes([0, 5, 5, 0, 5, 5]))
    oob = (
        MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", bytes(6))
        + _chunk(b"IDAT", raw)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        png_decode(oob)


def test_fake_payload_is_real_png_with_stable_dims():
    """fake_payload now emits real PNG; dims/pixels still follow the
    md5 arithmetic the media_decode oracle reproduces in SQL."""
    import hashlib

    from davar_lab_ocr_spark.operators.multimodal import (
        fake_payload,
        payload_meta,
        payload_to_array,
    )

    ref = "media://doc/42.png"
    payload = fake_payload(ref)
    assert payload.startswith(b"\x89PNG")
    digest = hashlib.md5(ref.encode()).digest()
    want = (32 + digest[0] % 96, 32 + digest[1] % 96, 1 + digest[2] % 3)
    assert payload_meta(payload) == want
    arr = payload_to_array(payload)
    assert arr.shape == want
    rng = np.random.default_rng(int.from_bytes(digest[:4], "little"))
    expect = rng.integers(0, 256, size=want[0] * want[1] * want[2], dtype=np.uint8)
    assert (arr.reshape(-1) == expect).all()


def test_corrupt_png_payloads_yield_none_not_crash():
    from davar_lab_ocr_spark.operators.multimodal import (
        fake_payload,
        payload_meta,
        payload_to_array,
    )

    good = fake_payload("media://x/1.png")
    truncated = good[:40]                      # cut inside IHDR/IDAT
    garbage_idat = good[:33] + b"\x00" * (len(good) - 33)
    for bad in (truncated, garbage_idat):
        assert payload_to_array(bad) is None
    assert payload_meta(good[:20]) is None     # short IHDR -> struct.error path
