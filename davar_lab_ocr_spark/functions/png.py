"""Pure-stdlib PNG codec — no PIL/cv2 in this environment.

Decode (the real codec boundary for media payloads): color types 0
(gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA) at 8- AND 16-bit depth
(16-bit big-endian samples downconvert to 8-bit via the high byte),
and 3 (palette, PLTE + optional tRNS alpha) at depths 1/2/4/8 — the
full sub-byte ladder, since paletted web PNGs are commonly 4-bit or
less. Both interlace methods: none and Adam7 (7 sub-image passes,
each filtered independently, scattered into the full grid). All five
row filters (None/Sub/Up/Average/Paeth) per the public PNG
specification (RFC 2083 §6.2-6.6); the filter operates on BYTES with
the unit bpp = max(1, channels * depth / 8), so sub-byte palette rows
filter with bpp=1 (spec §6.2). Filters None/Sub/Up unfilter fully
vectorized (Sub is a mod-256 prefix sum along x); Average/Paeth need
the reconstructed left neighbor, so those rows fall back to an x-loop
vectorized across the filter unit — our own encoder emits filter 0,
so the hot path never takes it. Palette images decode to RGB (or
RGBA when tRNS is present) via a vectorized palette gather.

Encode (fixture generator): truecolor/gray via png_encode (any single
filter type per image, one IDAT), paletted via png_encode_palette
(PLTE + optional tRNS, sub-byte packing), Adam7 via png_encode_adam7,
16-bit via png_encode_16bit. CRC via zlib.crc32.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"\x89PNG\r\n\x1a\n"
_COLOR_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_CHANNELS_COLOR = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor (spec §6.6), vectorized over a row."""
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def png_encode(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 (h, w) or (h, w, c) array -> PNG bytes, one IDAT chunk,
    the same ``filter_type`` (0-4) on every row."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in _CHANNELS_COLOR:
        raise NotImplementedError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CHANNELS_COLOR[c], 0, 0, 0)
    raw = bytearray()
    prev = np.zeros((w, c), np.uint8)
    for y in range(h):
        row = arr[y]
        left = np.zeros_like(row)
        left[1:] = row[:-1]
        if filter_type == 0:
            f = row
        elif filter_type == 1:
            f = row - left
        elif filter_type == 2:
            f = row - prev
        elif filter_type == 3:
            f = row - ((left.astype(np.uint16) + prev.astype(np.uint16)) // 2).astype(
                np.uint8
            )
        elif filter_type == 4:
            ul = np.zeros_like(row)
            ul[1:] = prev[:-1]
            f = row - _paeth(left, prev, ul)
        else:
            raise ValueError(f"bad filter type {filter_type}")
        raw.append(filter_type)
        raw += f.astype(np.uint8).tobytes()
        prev = row
    return (
        MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _iter_chunks(data: bytes):
    pos = len(MAGIC)
    n = len(data)
    while pos + 8 <= n:
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        yield tag, data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + tag + data + crc
        if tag == b"IEND":
            break


def _parse_ihdr(data: bytes) -> tuple[int, int, int, int, int]:
    """-> (h, w, depth, color, interlace), gated to supported shapes."""
    if not data.startswith(MAGIC):
        raise ValueError("not a PNG")
    for tag, payload in _iter_chunks(data):
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", payload
            )
            if inter not in (0, 1):
                raise ValueError(f"bad PNG interlace method {inter}")
            if color == 3:
                if depth not in (1, 2, 4, 8):
                    raise NotImplementedError(f"palette PNG depth {depth}")
            elif color not in _COLOR_CHANNELS or depth not in (8, 16):
                raise NotImplementedError(
                    f"unsupported PNG shape (depth={depth} color={color} interlace={inter})"
                )
            return h, w, depth, color, inter
    raise ValueError("PNG missing IHDR")


# Adam7 pass grid (spec §8.2): (x0, y0, dx, dy) per pass
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def png_meta(data: bytes) -> tuple[int, int, int]:
    """(height, width, channels) without inflating any IDAT — the
    cheap path for metadata-only decode stages. Paletted images report
    their POST-gather channel count (3, or 4 when a tRNS chunk adds
    per-entry alpha), matching png_decode's output shape."""
    h, w, depth, color, _ = _parse_ihdr(data)
    if color != 3:
        return h, w, _COLOR_CHANNELS[color]
    has_trns = any(tag == b"tRNS" for tag, _ in _iter_chunks(data))
    return h, w, 4 if has_trns else 3


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo the per-row byte filters -> (h, stride) uint8 matrix.
    ``bpp`` is the filter unit in bytes (spec §6.2: sub-byte depths
    filter with bpp=1); ``stride`` is always a multiple of bpp."""
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    units = stride // bpp
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        base = y * (stride + 1)
        ft = raw[base]
        line = np.frombuffer(raw, np.uint8, stride, base + 1).copy()
        if ft == 0:
            row = line
        elif ft == 1:  # Sub: mod-256 prefix sum over bpp-units along x
            u = line.reshape(units, bpp)
            row = (
                (np.cumsum(u.astype(np.uint64), axis=0) & 0xFF)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif ft == 2:  # Up
            row = line + prev
        elif ft == 3:  # Average: needs reconstructed left -> x-loop
            lineu = line.reshape(units, bpp)
            prevu = prev.reshape(units, bpp)
            rowu = np.zeros_like(lineu)
            left = np.zeros(bpp, np.uint16)
            for x in range(units):
                rowu[x] = lineu[x] + (
                    (left + prevu[x].astype(np.uint16)) // 2
                ).astype(np.uint8)
                left = rowu[x].astype(np.uint16)
            row = rowu.reshape(stride)
        elif ft == 4:  # Paeth: needs reconstructed left -> x-loop
            lineu = line.reshape(units, bpp)
            prevu = prev.reshape(units, bpp)
            rowu = np.zeros_like(lineu)
            left = np.zeros(bpp, np.uint8)
            ul = np.zeros(bpp, np.uint8)
            for x in range(units):
                rowu[x] = lineu[x] + _paeth(left, prevu[x], ul)
                left = rowu[x]
                ul = prevu[x]
            row = rowu.reshape(stride)
        else:
            raise ValueError(f"bad row filter {ft}")
        out[y] = row
        prev = row
    return out


def _unpack_indices(rows: np.ndarray, w: int, depth: int) -> np.ndarray:
    """(h, stride) filtered-out palette bytes -> (h, w) index array,
    MSB-first sub-byte unpacking per spec §2.3."""
    if depth == 8:
        return rows[:, :w]
    bits = np.unpackbits(rows, axis=1)
    weights = 1 << np.arange(depth - 1, -1, -1)
    idx = bits.reshape(rows.shape[0], -1, depth) @ weights
    return idx[:, :w].astype(np.uint8)


def _pass_layout(w: int, h: int, inter: int):
    """-> [(x0, y0, dx, dy, pass_w, pass_h)] — one entry for the
    whole image when non-interlaced, the 7 Adam7 sub-images otherwise.
    Empty passes (0 width or height) contribute NO bytes (not even
    filter bytes) per spec §8.2 and are skipped by the decoder."""
    if inter == 0:
        return [(0, 0, 1, 1, w, h)]
    return [
        (x0, y0, dx, dy, (w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy)
        for (x0, y0, dx, dy) in _ADAM7
    ]


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, c) uint8 array. Paletted images come back
    as RGB after the PLTE gather, or RGBA when tRNS supplies
    per-palette-entry alpha (missing tail entries default opaque,
    spec §4.2.1.1). Adam7-interlaced streams decode pass-by-pass (each
    pass filters independently) and scatter into the full grid; 16-bit
    samples (big-endian per spec) downconvert to 8-bit by taking the
    high byte."""
    h, w, depth, color, inter = _parse_ihdr(data)
    idat = b"".join(payload for tag, payload in _iter_chunks(data) if tag == b"IDAT")
    raw = zlib.decompress(idat)
    passes = _pass_layout(w, h, inter)
    offset = 0
    if color == 3:
        plte = next(
            (payload for tag, payload in _iter_chunks(data) if tag == b"PLTE"), None
        )
        if plte is None or len(plte) % 3:
            raise ValueError("palette PNG missing/malformed PLTE")
        palette = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        trns = next(
            (payload for tag, payload in _iter_chunks(data) if tag == b"tRNS"), None
        )
        idx = np.zeros((h, w), np.uint8)
        for (x0, y0, dx, dy, pw, ph) in passes:
            if pw == 0 or ph == 0:
                continue
            stride = (pw * depth + 7) // 8
            size = ph * (stride + 1)
            rows = _unfilter(raw[offset : offset + size], ph, stride, 1)
            offset += size
            idx[y0::dy, x0::dx] = _unpack_indices(rows, pw, depth)
        if offset != len(raw):
            raise ValueError("IDAT size mismatch")
        if idx.max(initial=0) >= len(palette):
            raise ValueError("palette index out of range")
        rgb = palette[idx]  # vectorized gather -> (h, w, 3)
        if trns is None:
            return rgb
        alpha = np.full(len(palette), 255, np.uint8)
        alpha[: min(len(trns), len(palette))] = np.frombuffer(
            trns[: len(palette)], np.uint8
        )
        return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
    c = _COLOR_CHANNELS[color]
    bps = depth // 8  # bytes per sample (1 or 2)
    out = np.zeros((h, w, c), np.uint8)
    for (x0, y0, dx, dy, pw, ph) in passes:
        if pw == 0 or ph == 0:
            continue
        stride = pw * c * bps
        size = ph * (stride + 1)
        rows = _unfilter(raw[offset : offset + size], ph, stride, c * bps)
        offset += size
        px = rows.reshape(ph, pw, c, bps)
        out[y0::dy, x0::dx] = px[..., 0]  # big-endian: high byte first
    if offset != len(raw):
        raise ValueError("IDAT size mismatch")
    return out


def png_encode_palette(
    idx: np.ndarray,
    palette: np.ndarray,
    trns: np.ndarray | None = None,
    depth: int = 8,
    filter_type: int = 0,
) -> bytes:
    """Fixture generator for color-type-3 PNGs: (h, w) uint8 index
    array + (n, 3) palette (+ optional (n,) alpha) -> PNG bytes with
    sub-byte packing at ``depth`` in 1/2/4/8."""
    idx = np.ascontiguousarray(idx, dtype=np.uint8)
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"palette depth {depth}")
    if idx.max(initial=0) >= min(len(palette), 1 << depth):
        raise ValueError("palette index out of range for depth/palette")
    h, w = idx.shape
    if depth == 8:
        rows = idx
    else:
        per = 8 // depth
        padded = np.zeros((h, ((w + per - 1) // per) * per), np.uint8)
        padded[:, :w] = idx
        shifts = np.arange(depth - 1, -1, -1)  # MSB-first bit order
        bits = ((padded.reshape(h, -1, 1) >> shifts) & 1).astype(np.uint8)
        rows = np.packbits(bits.reshape(h, -1), axis=1)
    stride = rows.shape[1]
    raw = bytearray()
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        line = rows[y]
        if filter_type == 0:
            f = line
        elif filter_type == 1:
            left = np.zeros_like(line)
            left[1:] = line[:-1]
            f = line - left
        elif filter_type == 2:
            f = line - prev
        else:
            raise NotImplementedError("palette fixture filters: 0/1/2")
        raw.append(filter_type)
        raw += f.astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0)
    chunks = MAGIC + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", palette.tobytes())
    if trns is not None:
        chunks += _chunk(b"tRNS", np.ascontiguousarray(trns, np.uint8).tobytes())
    return chunks + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


def png_encode_adam7(arr: np.ndarray) -> bytes:
    """Fixture generator for Adam7-interlaced truecolor/gray PNGs:
    passes serialized in spec order, filter 0 on every row, empty
    passes wholly absent."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in _CHANNELS_COLOR:
        raise NotImplementedError(f"unsupported channel count {c}")
    raw = bytearray()
    for (x0, y0, dx, dy, pw, ph) in _pass_layout(w, h, 1):
        if pw == 0 or ph == 0:
            continue
        sub = arr[y0::dy, x0::dx]
        for y in range(ph):
            raw.append(0)
            raw += sub[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CHANNELS_COLOR[c], 0, 0, 1)
    return (
        MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def png_encode_16bit(arr16: np.ndarray, filter_type: int = 0) -> bytes:
    """Fixture generator for 16-bit-depth truecolor/gray PNGs
    (big-endian samples per spec §7.1). Filters 0/2 only — enough to
    exercise the byte-unit (bpp = 2*c) unfilter path."""
    arr16 = np.ascontiguousarray(arr16, dtype=np.uint16)
    if arr16.ndim == 2:
        arr16 = arr16[:, :, None]
    h, w, c = arr16.shape
    if c not in _CHANNELS_COLOR:
        raise NotImplementedError(f"unsupported channel count {c}")
    if filter_type not in (0, 2):
        raise NotImplementedError("16-bit fixture filters: 0/2")
    # PNG wants big-endian samples; gate on EFFECTIVE endianness ('='
    # means native, which is already big-endian on a BE host)
    be = arr16.astype(">u2", copy=False)
    rows = be.view(np.uint8).reshape(h, w * c * 2)
    raw = bytearray()
    prev = np.zeros(w * c * 2, np.uint8)
    for y in range(h):
        raw.append(filter_type)
        line = rows[y] if filter_type == 0 else rows[y] - prev
        raw += line.astype(np.uint8).tobytes()
        prev = rows[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 16, _CHANNELS_COLOR[c], 0, 0, 0)
    return (
        MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
