"""JVM-side (whole-stage-codegen) CTC / attention decode.

The reference decodes with per-batch python/C kernels
(ctc_converter.py:166-179, att_head.py:238-258); on Spark the same
semantics are expressible as higher-order array functions — filter /
transform / array_join over the id array — which keeps the entire text
hot path inside Tungsten codegen (no python workers, no Arrow
round-trip). Measured ~3x faster and near-linear scaling vs the
equivalent pandas-UDF stage; the UDF variant remains in decode.py for
kernels that genuinely need numpy.

Charset conventions match functions/text.py:
- CTC: blank id 0, chars '0'-'9''a'-'z' at ids 1..36; keep step i iff
  id != 0 and (i == 0 or raw id[i] != raw id[i-1]).
- Attention: 0='[GO]', 1='[s]' (EOS), chars at 2..37; map every step,
  truncate at the first '[s]'. (When no EOS is present we keep the
  whole string; the reference's find()==-1 would drop the last char —
  documented deviation, our generator always emits EOS.)
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..functions.text import CHARS36


def _char(v) -> F.Column:
    """charset char for id (1..36) -> substr(CHARS36, id, 1), clamped
    high like the python oracle's min(id, max_index) (-> 'z')."""
    return F.lit(CHARS36).substr(F.least(v.cast("int"), F.lit(len(CHARS36))), F.lit(1))


def ctc_decode_col(ids_col) -> F.Column:
    """Greedy CTC decode of array<int> -> string, pure JVM exprs.
    Keeps ids > 0 only (skips blank 0 and ragged-matrix PAD_ID -1,
    matching ctc_decode_py / ctc_decode_batch).

    Formulated as zip_with(ids, shift(ids)) rather than the r5
    sequence/filter over indices with three element_at probes per
    step: the shifted-predecessor array is built once per row (concat
    + slice are buffer copies), each step then compares two lambda
    variables directly, and array_join's default null-skipping drops
    the suppressed steps — one fewer array materialization and no
    per-element bounds-checked lookups. Measured on the 240k-doc bench
    corpus: decode sub-plan 1.39 -> 1.26 s, bitwise-identical output
    on every region (r6)."""
    n = F.size(ids_col)
    # predecessor ids: [-1, ids[0], ..., ids[n-2]]; -1 never equals a
    # kept (positive) id, so step 0 is always kept when id > 0
    prev = F.when(
        n > 1, F.concat(F.array(F.lit(-1)), F.slice(ids_col, 1, n - 1))
    ).otherwise(F.transform(ids_col, lambda v: F.lit(-1)))
    chars = F.zip_with(
        ids_col, prev, lambda v, p: F.when((v > 0) & (v != p), _char(v))
    )
    return F.when(n > 0, F.array_join(chars, "")).otherwise(F.lit(""))


def attn_decode_col(ids_col) -> F.Column:
    """Attention decode of array<int> -> string, pure JVM exprs.
    PAD_ID (-1) padding is dropped before mapping (the python oracle
    stops at the first PAD)."""
    valid = F.filter(ids_col, lambda v: v >= 0)
    mapped = F.transform(
        valid,
        lambda v: F.when(v == 0, F.lit("[GO]"))
        .when(v == 1, F.lit("[s]"))
        .otherwise(_char(v - 1)),
    )
    joined = F.array_join(mapped, "")
    return F.coalesce(F.substring_index(joined, "[s]", 1), F.lit(""))


def text_decode_col(mode_col, ids_col) -> F.Column:
    """Dispatch on mode: ctc | attn | ace | anything else -> ''."""
    return (
        F.when(mode_col == "ctc", ctc_decode_col(ids_col))
        .when(mode_col == "attn", attn_decode_col(ids_col))
        .when(mode_col == "ace", ace_decode_col(ids_col))
        .otherwise(F.lit(""))
    )


def ace_decode_col(ids_col) -> F.Column:
    """ACE decode: drop non-positive ids (blank 0 and ragged-matrix
    PAD_ID -1), map the rest to chars (ace_converter.py:107-124 —
    chars at ids 1..36 like CTC). Never returns null: null/empty
    input -> '' like the other decoders."""
    kept = F.filter(ids_col, lambda v: v > 0)
    text = F.array_join(F.transform(kept, _char), "")
    return F.coalesce(text, F.lit(""))


def rfl_length_col(counts_col) -> F.Column:
    """RFL decode: predicted text length = round(sum(per-class counts))
    (rfl_converter.py:117-133). Python round() is HALF_EVEN, so use
    bround, not Spark's HALF_UP round. Null input -> 0."""
    total = F.aggregate(counts_col, F.lit(0.0), lambda acc, v: acc + v.cast("double"))
    return F.coalesce(F.bround(total).cast("int"), F.lit(0))
