"""Pure-stdlib PNG codec — no PIL/cv2 in this environment.

Decode (the real codec boundary for media payloads): non-interlaced
8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha) and
6 (RGBA), all five row filters (None/Sub/Up/Average/Paeth) per the
public PNG specification (RFC 2083 §6.2-6.6). Filters None/Sub/Up
unfilter fully vectorized (Sub is a mod-256 prefix sum along x);
Average/Paeth need the reconstructed left neighbor, so those rows fall
back to an x-loop vectorized across channels — our own encoder emits
filter 0, so the hot path never takes it.

Encode (fixture generator): any single filter type per image, one IDAT,
CRC via zlib.crc32. Interlacing, 16-bit depth, and palette images are
out of scope (raise NotImplementedError, honestly gated).
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


def png_meta(data: bytes) -> tuple[int, int, int]:
    """(height, width, channels) from IHDR alone — no inflate; the
    cheap path for metadata-only decode stages."""
    if not data.startswith(MAGIC):
        raise ValueError("not a PNG")
    for tag, payload in _iter_chunks(data):
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or inter != 0 or color not in _COLOR_CHANNELS:
                raise NotImplementedError(
                    f"unsupported PNG shape (depth={depth} color={color} interlace={inter})"
                )
            return h, w, _COLOR_CHANNELS[color]
    raise ValueError("PNG missing IHDR")


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, c) uint8 array."""
    h, w, c = png_meta(data)
    idat = b"".join(payload for tag, payload in _iter_chunks(data) if tag == b"IDAT")
    raw = zlib.decompress(idat)
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.zeros((h, w, c), np.uint8)
    prev = np.zeros((w, c), np.uint8)
    for y in range(h):
        base = y * (stride + 1)
        ft = raw[base]
        line = (
            np.frombuffer(raw, np.uint8, stride, base + 1).reshape(w, c).copy()
        )
        if ft == 0:
            row = line
        elif ft == 1:  # Sub: mod-256 prefix sum along x
            row = (np.cumsum(line.astype(np.uint64), axis=0) & 0xFF).astype(np.uint8)
        elif ft == 2:  # Up
            row = line + prev
        elif ft == 3:  # Average: needs reconstructed left -> x-loop
            row = np.zeros_like(line)
            left = np.zeros(c, np.uint16)
            for x in range(w):
                row[x] = line[x] + ((left + prev[x].astype(np.uint16)) // 2).astype(
                    np.uint8
                )
                left = row[x].astype(np.uint16)
        elif ft == 4:  # Paeth: needs reconstructed left -> x-loop
            row = np.zeros_like(line)
            left = np.zeros(c, np.uint8)
            ul = np.zeros(c, np.uint8)
            for x in range(w):
                row[x] = line[x] + _paeth(left, prev[x], ul)
                left = row[x]
                ul = prev[x]
        else:
            raise ValueError(f"bad row filter {ft}")
        out[y] = row
        prev = row
    return out
