"""Layout operators: region-kind classification + chargrid rasterization.

- classify_regions: argmax over per-region class scores -> kind string
  (the VSR token-cls decode shape, vsr.py:420-437); pure JVM exprs
  (also used inline by plans/extract.classify_kind).
- chargrid: paint per-character class ids into an H x W int grid from
  character boxes (chargrid_embedding.py:56-87 semantics: boxes
  rounded to int, later lines/chars overwrite earlier ones,
  half-open [start, end) slices). The grid is produced and consumed
  inside one Arrow batch stage — never materialized in a table
  (SURVEY.md §1.4: score/geo tensors stay inside the stage).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame


def classify_regions(df: DataFrame, scores_col: str = "scores", kinds: list[str] | None = None) -> DataFrame:
    from ..corpus import KINDS

    kinds = kinds or KINDS
    arr = F.array(*[F.lit(k) for k in kinds])
    idx = F.array_position(F.col(scores_col), F.array_max(F.col(scores_col))).cast("int")
    return df.withColumn("kind", F.element_at(arr, idx))


def chargrid_py(h: int, w: int, char_ids: list[list[int]], cbboxes: list[list[list[float]]]) -> np.ndarray:
    """One document's chargrid: int64 [h, w], 0 = background."""
    grid = np.zeros((h, w), dtype=np.int64)
    for line_ids, line_boxes in zip(char_ids, cbboxes):
        n = min(len(line_ids), len(line_boxes))
        for k in range(n):
            x0, y0, x1, y1 = [int(round(v)) for v in line_boxes[k]]
            # clamp page-edge boxes: negative indices would wrap to the
            # far side of the grid in numpy
            x0, x1 = max(x0, 0), min(max(x1, 0), w)
            y0, y1 = max(y0, 0), min(max(y1, 0), h)
            grid[y0:y1, x0:x1] = line_ids[k]
    return grid


def chargrid_histogram_stage(df: DataFrame) -> DataFrame:
    """mapInArrow: (doc_id, h, w, char_ids array<array<int>>, cbboxes
    array<array<array<double>>>) -> per-doc grid statistics
    (n_painted pixels, n_distinct ids) — the grid itself stays inside
    the stage (it would feed the model embedding there)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("n_painted", T.LongType()),
            T.StructField("n_ids", T.IntegerType()),
        ]
    )

    def run(batches):
        for batch in batches:
            doc_ids = batch.column("doc_id")
            hs = batch.column("h").to_pylist()
            ws = batch.column("w").to_pylist()
            ids = batch.column("char_ids").to_pylist()
            boxes = batch.column("cbboxes").to_pylist()
            painted, nids = [], []
            for h, w, ci, cb in zip(hs, ws, ids, boxes):
                grid = chargrid_py(h, w, ci or [], cb or [])
                painted.append(int((grid != 0).sum()))
                nids.append(int(len(np.unique(grid[grid != 0]))))
            yield pa.RecordBatch.from_arrays(
                [doc_ids, pa.array(painted, type=pa.int64()), pa.array(nids, type=pa.int32())],
                names=["doc_id", "n_painted", "n_ids"],
            )

    return df.mapInArrow(run, schema=out_schema)
