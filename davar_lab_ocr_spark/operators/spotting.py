"""Spotting decode kernels: segmentation grouping + MANGO char voting.

- connected_components: the BFS instance grouping of MANGO's seg map
  (davarocr/davar_spotting/core/post_processing/post_mango.py:214 /
  lib/bfs_search.cpp) — plain 4-connectivity labeling in numpy/python.
- mask_to_quads: Mask-RCNN-style mask -> region polygon
  (post_mask_rcnn.py:35-68): axis-aligned bounding quad by default
  (the reference's use_rotated_box=False), or the minimum rotated
  rectangle via pure-numpy rotating calipers (functions/geometry
  .min_area_rect) with rotated=True — no cv2 needed.
- mango_char_vote: exact MANGO voting (post_mango.py:150-200): each
  grid's text gets an appended '#' end symbol; per character position,
  weighted vote over grids; ties resolved by first insertion (the
  reference's stable sort); voting stops when '#' wins.
- mango_vote_stage: groupBy(doc, instance).applyInPandas over
  (text, weight) rows.
"""

from __future__ import annotations

from collections import deque

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame


def connected_components(seg: np.ndarray) -> np.ndarray:
    """4-connectivity component labels (0 = background, 1..K)."""
    seg = np.asarray(seg, dtype=bool)
    h, w = seg.shape
    labels = np.zeros((h, w), dtype=np.int32)
    cur = 0
    for y in range(h):
        for x in range(w):
            if seg[y, x] and labels[y, x] == 0:
                cur += 1
                que = deque([(y, x)])
                labels[y, x] = cur
                while que:
                    cy, cx = que.popleft()
                    for ny, nx in ((cy - 1, cx), (cy + 1, cx), (cy, cx - 1), (cy, cx + 1)):
                        if 0 <= ny < h and 0 <= nx < w and seg[ny, nx] and labels[ny, nx] == 0:
                            labels[ny, nx] = cur
                            que.append((ny, nx))
    return labels


def mask_to_quads(
    seg: np.ndarray, min_area: int = 1, rotated: bool = False
) -> list[tuple[list[float], int]]:
    """Components -> [(quad, pixel area)], largest first (the reference
    keeps the max-area contour per mask). ``rotated=False`` (the
    reference's use_rotated_box default, post_mask_rcnn.py:23) emits the
    axis-aligned bounding quad; ``rotated=True`` emits the minimum-area
    rotated rectangle (cv2.minAreaRect + boxPoints semantics,
    post_mask_rcnn.py:56-59) via pure-numpy rotating calipers."""
    from ..functions.geometry import min_area_rect

    labels = connected_components(seg)
    out = []
    for k in range(1, labels.max() + 1):
        ys, xs = np.nonzero(labels == k)
        area = len(ys)
        if area < min_area:
            continue
        if rotated:
            corners = min_area_rect(np.stack([xs, ys], axis=1))
            out.append(([float(v) for v in corners.reshape(-1)], area))
        else:
            x0, x1 = float(xs.min()), float(xs.max())
            y0, y1 = float(ys.min()), float(ys.max())
            out.append(([x0, y0, x1, y0, x1, y1, x0, y1], area))
    out.sort(key=lambda t: -t[1])
    return out


def mango_char_vote(texts: list[str], weights: list[float]) -> str:
    """Weighted per-position character voting with '#' end symbol."""
    text_dict: dict[int, dict[str, float]] = {}
    for text, weight in zip(texts, weights):
        text = text + "#"
        for index, char in enumerate(text):
            pos = text_dict.setdefault(index, {})
            pos[char] = pos.get(char, 0.0) + weight
    voted = ""
    for index in range(len(text_dict)):
        # stable sort desc by weight: ties keep insertion order
        ranked = sorted(text_dict[index].items(), key=lambda x: x[1], reverse=True)
        if ranked[0][0] == "#":
            break
        voted += ranked[0][0]
    return voted


_VOTE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("instance", T.IntegerType()),
        T.StructField("voted", T.StringType()),
    ]
)


def mango_vote_stage(df: DataFrame) -> DataFrame:
    """(doc_id, instance, text, weight) rows -> per-instance voted text."""

    def vote(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [
                {
                    "doc_id": pdf["doc_id"].iloc[0],
                    "instance": int(pdf["instance"].iloc[0]),
                    "voted": mango_char_vote(list(pdf["text"]), list(pdf["weight"])),
                }
            ]
        )

    return df.groupBy("doc_id", "instance").applyInPandas(vote, schema=_VOTE_SCHEMA)


SEG_QUADS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField(
            "quads",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("points", T.ArrayType(T.DoubleType())),
                        T.StructField("area", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def seg_group_stage(df: DataFrame, seg_col: str = "seg", h_col: str = "h", w_col: str = "w") -> DataFrame:
    """mapInArrow: (doc_id, seg flattened 0/1, h, w) -> component quads."""
    import pyarrow as pa

    pa_type = pa.list_(pa.struct([("points", pa.list_(pa.float64())), ("area", pa.int32())]))

    def run(batches):
        for batch in batches:
            segs = batch.column(seg_col).to_pylist()
            hs = batch.column(h_col).to_pylist()
            ws = batch.column(w_col).to_pylist()
            quads = []
            for s, h, w in zip(segs, hs, ws):
                comps = mask_to_quads(np.asarray(s, dtype=np.int8).reshape(h, w))
                quads.append([{"points": q, "area": a} for q, a in comps])
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), pa.array(quads, type=pa_type)],
                names=["doc_id", "quads"],
            )

    return df.mapInArrow(run, schema=SEG_QUADS_SCHEMA)


def make_seg_fixture(doc_idx: int, seed: int = 67, h: int = 48, w: int = 48):
    """Deterministic binary seg map with 1-3 planted, well-separated
    axis-aligned rectangles. Returns (row for seg_group_stage, golden
    [(x0, y0, x1, y1, n_pixels)]) — the golden is pure planted geometry,
    independent of the decode (components of an axis-aligned rect must
    come back as exactly its bounding quad)."""
    rng = np.random.default_rng(seed * 65537 + doc_idx)
    seg = np.zeros((h, w), dtype=np.int8)
    golden = []
    for b in range(int(rng.integers(1, 4))):
        y0 = 2 + b * (h // 3)
        y1 = y0 + int(rng.integers(3, h // 4))
        x0 = int(rng.integers(2, 8))
        x1 = x0 + int(rng.integers(6, w - 12))
        seg[y0 : y1 + 1, x0 : x1 + 1] = 1
        golden.append((x0, y0, x1, y1, (y1 - y0 + 1) * (x1 - x0 + 1)))
    row = {"doc_id": f"seg-{doc_idx}", "seg": seg.reshape(-1).tolist(), "h": h, "w": w}
    return row, golden
