"""Region decode stage: ctc/attn text decode + table recovery, batched.

One mapInPandas over exploded region rows. Within each Arrow batch the
rows are grouped by mode: ctc/attn ids are padded into one [B, T] int
matrix and decoded with a single vectorized numpy pass (the Spark
analog of the reference's per-batch C kernels, post_east.py:60-74 /
ctc_converter.py:166); table rows run the small per-table LGPMA chain.
Media rows pass through (text='').
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.types as T

from ..functions.text import PAD_ID, attn_decode_batch, ctc_decode_batch
from .table import recover_table_html

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("salt", T.IntegerType(), False),
        T.StructField("y0", T.DoubleType(), False),
        T.StructField("x0", T.DoubleType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
    ]
)


def _pad_matrix(seqs: pd.Series) -> np.ndarray:
    n = len(seqs)
    if n == 0:
        return np.full((0, 1), PAD_ID, dtype=np.int64)
    max_t = max((len(s) for s in seqs), default=1) or 1
    mat = np.full((n, max_t), PAD_ID, dtype=np.int64)
    for i, s in enumerate(seqs):
        if len(s):
            mat[i, : len(s)] = s
    return mat


def decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Decode one Arrow batch of region rows (already carries kind)."""
    text_out = np.empty(len(pdf), dtype=object)
    text_out[:] = ""
    mode = pdf["mode"].to_numpy()

    for m, decoder in (("ctc", ctc_decode_batch), ("attn", attn_decode_batch)):
        sel = np.flatnonzero(mode == m)
        if len(sel):
            mat = _pad_matrix(pdf["pred_ids"].iloc[sel])
            text_out[sel] = decoder(mat)

    tables = np.flatnonzero(mode == "table")
    for i in tables:
        bb = pdf["cell_bboxes"].iloc[i]
        tt = pdf["cell_texts"].iloc[i]
        text_out[i] = recover_table_html(
            [list(b) for b in bb] if bb is not None else [],
            list(tt) if tt is not None else [],
        )

    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "salt": pdf["salt"],
            "y0": pdf["y0"],
            "x0": pdf["x0"],
            "kind": pdf["kind"],
            "text": text_out,
            "media_ref": pdf["media_ref"],
        }
    )


def decode_stage(df):
    """mapInPandas wrapper around decode_batch."""

    def run(batches):
        for pdf in batches:
            yield decode_batch(pdf)

    return df.mapInPandas(run, schema=DECODED_SCHEMA)
