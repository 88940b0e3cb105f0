"""Text decode kernels: CTC collapse, attention EOS-trim, charsets.

Semantics follow the reference converters (re-expressed, not copied):
- CTC: charset = ['[blank]'] + chars (blank id 0); keep step i iff
  id != blank and not (i>0 and raw id[i-1] == id[i]) — i.e. repeats are
  collapsed on the RAW sequence, so a repeated character separated by a
  blank survives.  Reference: davarocr/davar_rcg/core/converters/
  ctc_converter.py:166-179 (decode), charset build :76-86.
- Attention: join chars for every step, truncate at the first '[s]'.
  Reference: davarocr/davar_rcg/models/sequence_heads/att_head.py:238-258
  and att_converter.py:135-153.

Two implementations on purpose:
- ``*_decode_py``: simple pure-python loops — the ORACLE used by the
  synthetic-corpus generator and golden tests.
- ``*_decode_batch``: vectorized numpy over a padded [B, T] id matrix —
  what runs inside the Spark Arrow batch UDF (the hot path).
"""

from __future__ import annotations

import numpy as np

# 36-class scene-text charset (digits + lowercase), mirroring
# demo/text_recognition/__dictionary__/Scene_text_36.txt
CHARS36 = "0123456789abcdefghijklmnopqrstuvwxyz"

# CTC: index 0 is the blank
CTC_CHARSET = ["[blank]"] + list(CHARS36)
CTC_BLANK = 0

# Attention: 0 = GO, 1 = EOS ('[s]'), chars at 2..
ATTN_CHARSET = ["[GO]", "[s]"] + list(CHARS36)
ATTN_EOS = 1
ATTN_GO = 0

PAD_ID = -1  # padding for ragged [B, T] matrices


def ctc_decode_py(ids: list[int], charset: list[str] | None = None) -> str:
    """Oracle CTC greedy decode (collapse repeats, drop blank)."""
    charset = charset or CTC_CHARSET
    out = []
    prev = None
    for i in ids:
        if i == PAD_ID:
            break
        if i != CTC_BLANK and i != prev:
            out.append(charset[min(i, len(charset) - 1)])
        prev = i
    return "".join(out)


def attn_decode_py(ids: list[int], charset: list[str] | None = None) -> str:
    """Oracle attention decode (map all, truncate at '[s]')."""
    charset = charset or ATTN_CHARSET
    chars = []
    for i in ids:
        if i == PAD_ID:
            break
        chars.append(charset[min(i, len(charset) - 1)])
    text = "".join(chars)
    pos = text.find("[s]")
    return text[:pos] if pos >= 0 else text


def ctc_decode_batch(id_mat: np.ndarray, charset: list[str] | None = None) -> list[str]:
    """Vectorized CTC greedy decode over a padded [B, T] int matrix.

    The keep mask (id != blank) & (id != previous raw id) & (id != PAD)
    is computed for the whole batch at once; only the final join per row
    is python-level.
    """
    charset = np.asarray(charset or CTC_CHARSET, dtype=object)
    if id_mat.size == 0:
        return [""] * id_mat.shape[0]
    prev = np.empty_like(id_mat)
    prev[:, 0] = PAD_ID - 1  # sentinel: first step never equals previous
    prev[:, 1:] = id_mat[:, :-1]
    keep = (id_mat != CTC_BLANK) & (id_mat != prev) & (id_mat != PAD_ID)
    clipped = np.minimum(id_mat, len(charset) - 1)
    out = []
    for row_ids, row_keep in zip(clipped, keep):
        out.append("".join(charset[row_ids[row_keep]]))
    return out


def attn_decode_batch(id_mat: np.ndarray, charset: list[str] | None = None) -> list[str]:
    """Vectorized attention decode over a padded [B, T] int matrix."""
    charset = np.asarray(charset or ATTN_CHARSET, dtype=object)
    if id_mat.size == 0:
        return [""] * id_mat.shape[0]
    valid = id_mat != PAD_ID
    clipped = np.minimum(np.maximum(id_mat, 0), len(charset) - 1)
    out = []
    for row_ids, row_valid in zip(clipped, valid):
        text = "".join(charset[row_ids[row_valid]])
        pos = text.find("[s]")
        out.append(text[:pos] if pos >= 0 else text)
    return out


def ctc_encode_with_noise(text: str, rng: np.random.Generator, max_t: int = 48) -> list[int]:
    """Deterministically encode ``text`` into a raw CTC id sequence whose
    greedy decode equals ``text`` (blanks between repeats, random blank
    padding, random repetition). Used by the synthetic corpus generator.
    """
    ids: list[int] = []
    prev = None
    for ch in text:
        cid = CTC_CHARSET.index(ch)
        if prev == cid or rng.random() < 0.3:
            ids.append(CTC_BLANK)
        reps = 1 + int(rng.random() < 0.25)
        ids.extend([cid] * reps)
        prev = cid
    while len(ids) < min(max_t, len(ids) + int(rng.integers(0, 3))):
        ids.append(CTC_BLANK)
    return ids[:max_t]


def attn_encode(text: str, rng: np.random.Generator, max_t: int = 26) -> list[int]:
    """Encode text to attention ids: chars, EOS, then garbage steps
    (which decode must ignore past '[s]')."""
    ids = [ATTN_CHARSET.index(ch) for ch in text]
    ids.append(ATTN_EOS)
    n_garbage = int(rng.integers(0, 3))
    for _ in range(n_garbage):
        ids.append(int(rng.integers(2, len(ATTN_CHARSET))))
    return ids[:max_t]
