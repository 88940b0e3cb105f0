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

# scene-text charsets, mirroring the reference's shipped dictionary
# files demo/text_recognition/__dictionary__/Scene_text_{36,62,68}.txt
# (byte-for-byte parity pinned by tests/test_ref_golden_eval.py)
CHARS36 = "0123456789abcdefghijklmnopqrstuvwxyz"
CHARS62 = CHARS36 + "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
CHARS68 = CHARS36 + ":('-,%>.[?)\"=_*];&+$@/|!<#`{~\\}^"


def load_dictionary(path: str) -> list[str]:
    """Character dictionary file -> ordered char list (the reference's
    one-chars-per-file format, davar_rcg loaders)."""
    with open(path, encoding="utf-8") as fh:
        return list(fh.read().rstrip("\n"))

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


# ---------------------------------------------------------------------------
# end-to-end spotting transcription rules
# (semantics: davarocr/davar_spotting/core/evaluation/e2e_hmean.py:111-234)
# ---------------------------------------------------------------------------
E2E_SPECIAL_CHARACTERS = "!?.:,*\"()·[]/'"
E2E_MIN_LENGTH_CARE_WORD = 3

# dictionary-eligible codepoint ranges: basic latin letters, latin
# supplement/extended, greek, plus '-'
_DICT_RANGES = (
    (ord("a"), ord("z")),
    (ord("A"), ord("Z")),
    (ord("À"), ord("ƿ")),   # À..ƿ (U+01BF; click letters U+01C0-U+01C3 excluded, e2e_hmean.py:191)
    (ord("Ǆ"), ord("ɿ")),   # Ǆ..ɿ
    (ord("Ά"), ord("Ͽ")),   # Ά..Ͽ
    (ord("-"), ord("-")),
)
_DICT_FORBIDDEN = "×÷·"  # × ÷ ·


def transcription_match(
    gt: str,
    det: str,
    special_characters: str = E2E_SPECIAL_CHARACTERS,
    only_remove_first_last_gt: bool = True,
) -> bool:
    """Transcription equality with the IC15 special-character tolerance
    (e2e_hmean.py:111-157): in the default mode a special character is
    forgiven only at the first/last position of the GT; otherwise both
    strings are stripped of leading/trailing specials iteratively."""
    if only_remove_first_last_gt:
        if gt == det:
            return True
        head = bool(gt) and gt[0] in special_characters
        tail = bool(gt) and gt[-1] in special_characters
        if head and gt[1:] == det:
            return True
        if tail and gt[:-1] == det:
            return True
        if head and tail and gt[1:-1] == det:
            return True
        return False
    while gt and gt[0] in special_characters:
        gt = gt[1:]
    while det and det[0] in special_characters:
        det = det[1:]
    while gt and gt[-1] in special_characters:
        gt = gt[:-1]
    while det and det[-1] in special_characters:
        det = det[:-1]
    return gt == det


def _strip_word_endings(transcription: str, special_characters: str) -> str:
    if transcription[-2:] in ("'s", "'S"):
        transcription = transcription[:-2]
    transcription = transcription.strip("-")
    for ch in special_characters:
        transcription = transcription.replace(ch, " ")
    return transcription.strip()


def include_in_dictionary(
    transcription: str,
    special_characters: str = E2E_SPECIAL_CHARACTERS,
    min_length: int = E2E_MIN_LENGTH_CARE_WORD,
) -> bool:
    """Word-spotting dictionary eligibility (e2e_hmean.py:159-210): a GT
    word failing these rules is demoted to don't-care."""
    t = _strip_word_endings(transcription, special_characters)
    if " " in t:
        return False
    if len(t) < min_length:
        return False
    for ch in t:
        if ch in _DICT_FORBIDDEN:
            return False
        if not any(lo <= ord(ch) <= hi for lo, hi in _DICT_RANGES):
            return False
    return True


def dictionary_transcription(
    transcription: str, special_characters: str = E2E_SPECIAL_CHARACTERS
) -> str:
    """GT transcription normalization applied before word-spotting
    comparison (e2e_hmean.py:212-234)."""
    return _strip_word_endings(transcription, special_characters)
