"""Canonical Spark schemas for the extraction engine.

The authoritative I/O shape (BASELINE.json input_hint) is the
``documents`` table: one row per document, spans as an ordered struct
array. All other schemas are fixture/stage shapes mirroring the
reference's datalist model (SURVEY.md §1; reference
davarocr/davar_common/datasets/davar_custom.py:30-63).
"""

from __future__ import annotations

import pyspark.sql.types as T

# --- the north contract: interleaved text+media documents -----------------
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN, False), False),
    ]
)

# --- raw (pre-extraction) document: what the pipeline consumes ------------
# One row per document; regions are un-ordered, un-decoded instances.
# Mirrors content_ann parallel arrays zipped into one struct array
# (index alignment by construction; davar_custom.py:40).
RAW_REGION = T.StructType(
    [
        T.StructField("bbox", T.ArrayType(T.DoubleType(), False), False),  # [x0,y0,x1,y1]
        T.StructField("kind_scores", T.ArrayType(T.DoubleType(), False), False),
        T.StructField("pred_ids", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("mode", T.StringType(), False),  # 'ctc' | 'attn' | 'media' | 'table'
        T.StructField("care", T.IntegerType(), False),
        T.StructField("media_ref", T.StringType(), False),
        # table-mode payload: cell rects flattened [x0,y0,x1,y1]*n
        T.StructField("cell_bboxes", T.ArrayType(T.ArrayType(T.DoubleType(), False), False), True),
        T.StructField("cell_texts", T.ArrayType(T.StringType(), False), True),
    ]
)

RAW_DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("regions", T.ArrayType(RAW_REGION, False), False),
    ]
)

# --- detection fixture (EAST-style maps; FIXTURES.md F2) -------------------
DET_MAPS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("score_map", T.ArrayType(T.DoubleType(), False), False),  # H*W
        T.StructField("geo_map", T.ArrayType(T.DoubleType(), False), False),  # 5*H*W RBOX / 8*H*W QUAD
        T.StructField("h", T.IntegerType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("mode", T.StringType(), False),  # 'RBOX' | 'QUAD'
        T.StructField("scale_factor", T.DoubleType(), False),
    ]
)

QUAD = T.StructType(
    [
        T.StructField("points", T.ArrayType(T.DoubleType(), False), False),  # x1,y1..x4,y4
        T.StructField("conf", T.DoubleType(), False),
    ]
)

DET_QUADS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("quads", T.ArrayType(QUAD, False), False),
    ]
)

# --- evaluation fixture (FIXTURES.md F7) -----------------------------------
EVAL_PAIRS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField(
            "pred",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("poly", T.ArrayType(T.DoubleType(), False), False),
                        T.StructField("conf", T.DoubleType(), False),
                        T.StructField("text", T.StringType(), True),
                    ]
                ),
                False,
            ),
            False,
        ),
        T.StructField(
            "gt",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("poly", T.ArrayType(T.DoubleType(), False), False),
                        T.StructField("care", T.IntegerType(), False),
                        T.StructField("text", T.StringType(), True),
                    ]
                ),
                False,
            ),
            False,
        ),
    ]
)

# --- video track fixture (FIXTURES.md F8): one row per (track, frame) ------
TRACK_EVENTS = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("track_id", T.IntegerType(), False),
        T.StructField("frame_id", T.IntegerType(), False),
        T.StructField("bbox", T.ArrayType(T.DoubleType(), False), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)
