"""Video-text track operators: sequence merge + best-frame selection.

Reference semantics (davarocr/davar_videotext/tools/merge_seq.py:36-230,
test_utils.py:113-128):

- per track: best (highest-quality-score) frame provides the track's
  word; tracks with an empty best word are dropped;
- two tracks merge when seq1.start <= seq2.start <= seq1.end +
  max_interval AND, comparing seq2's start bbox with seq1's bbox at
  the frame nearest to seq2's start:
    (iou >= thresh_tight and edit_dist_iou >= edit_thresh_loose) or
    (iou >= thresh_loose and edit_dist_iou >= edit_thresh_tight)
  where edit_dist_iou(a, b) = (max(|a|,|b|) - lev(a,b)) /
  (|a| + |b| - (max(|a|,|b|) - lev(a,b)));
- merged group keeps the word/frame of its highest-score member.

The reference iterates merge-to-fixpoint mutating group state; we take
the transitive closure of the pairwise predicate over ORIGINAL tracks
(union-find) — equivalent grouping whenever merges are evidence of the
same physical text instance (documented simplification).

Spark shape: per-frame rows -> groupBy(video_id).applyInPandas (a video
is small; the corpus is huge). The same logic runs streaming via
session windows (streaming/tracks.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from ..functions.geometry import rect_iou_matrix


def edit_dist_iou(a: str, b: str) -> float:
    """(max(len) - lev) / (len_a + len_b - (max(len) - lev))."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    dist = _levenshtein(a, b)
    inter = max(la, lb) - dist
    union = la + lb - inter
    return inter / union if union > 0 else 0.0


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


MERGED_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("merged_id", T.IntegerType()),
        T.StructField("frame_start", T.IntegerType()),
        T.StructField("frame_end", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("n_tracks", T.IntegerType()),
    ]
)


def merge_video_tracks(
    pdf: pd.DataFrame,
    max_interval: int = 30,
    thresh_tight: float = 0.5,
    thresh_loose: float = 0.3,
    edit_thresh_tight: float = 0.8,
    edit_thresh_loose: float = 0.5,
) -> pd.DataFrame:
    """Pure-pandas per-video merge (runs inside applyInPandas)."""
    video_id = pdf["video_id"].iloc[0]
    tracks = {}
    for tid, grp in pdf.groupby("track_id"):
        best = grp.loc[grp["score"].idxmax()]
        word = best["text"]
        if not word:
            continue
        frames = grp.sort_values("frame_id")
        tracks[int(tid)] = {
            "start": int(frames["frame_id"].iloc[0]),
            "end": int(frames["frame_id"].iloc[-1]),
            "start_bbox": np.asarray(frames["bbox"].iloc[0], dtype=np.float64),
            "frames": frames["frame_id"].to_numpy(),
            "bboxes": np.stack([np.asarray(b, dtype=np.float64) for b in frames["bbox"]]),
            "word": word,
            "score": float(best["score"]),
        }
    ids = sorted(tracks)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for i in ids:
        t1 = tracks[i]
        for j in ids:
            if i == j:
                continue
            t2 = tracks[j]
            if not (t1["start"] <= t2["start"] <= t1["end"] + max_interval):
                continue
            # bbox of t1 at the frame nearest to t2's start
            near = int(np.argmin(np.abs(t1["frames"] - t2["start"])))
            iou = rect_iou_matrix(
                t2["start_bbox"].reshape(1, 4), t1["bboxes"][near].reshape(1, 4)
            )[0, 0]
            ed = edit_dist_iou(t1["word"], t2["word"])
            if (iou >= thresh_tight and ed >= edit_thresh_loose) or (
                iou >= thresh_loose and ed >= edit_thresh_tight
            ):
                union(i, j)

    groups: dict[int, list[int]] = {}
    for i in ids:
        groups.setdefault(find(i), []).append(i)
    rows = []
    for root, members in sorted(groups.items()):
        best = max(members, key=lambda m: (tracks[m]["score"], -m))
        rows.append(
            {
                "video_id": video_id,
                "merged_id": root,
                "frame_start": min(tracks[m]["start"] for m in members),
                "frame_end": max(tracks[m]["end"] for m in members),
                "text": tracks[best]["word"],
                "score": tracks[best]["score"],
                "n_tracks": len(members),
            }
        )
    return pd.DataFrame(rows, columns=[f.name for f in MERGED_SCHEMA.fields])


def track_merge_stage(frames: DataFrame, **kwargs) -> DataFrame:
    """groupBy(video).applyInPandas merge over per-frame track rows
    (video_id, track_id, frame_id, bbox, text, score)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return merge_video_tracks(pdf, **kwargs)

    return frames.groupBy("video_id").applyInPandas(run, schema=MERGED_SCHEMA)


def make_track_fixture(n_videos: int = 6, seed: int = 41):
    """Deterministic per-frame track rows with planted same-instance
    splits (a track interrupted mid-way resumes with a new id, same
    bbox/word) plus unrelated tracks. Returns (rows, expected merged
    count per video)."""
    rng = np.random.default_rng(seed)
    rows, expected = [], {}
    for v in range(n_videos):
        vid = f"vid-{v}"
        n_instances = int(rng.integers(1, 4))
        merged_count = 0
        tid = 0
        for inst in range(n_instances):
            word = "".join("abcdefgh"[i] for i in rng.integers(0, 8, size=5))
            x0 = float(rng.integers(0, 400))
            y0 = float(rng.integers(0, 300))
            bbox = [x0, y0, x0 + 60, y0 + 20]
            start = int(rng.integers(0, 40))
            length = int(rng.integers(6, 20))
            split = rng.random() < 0.5 and length > 10
            pieces = (
                [(start, start + length // 2), (start + length // 2 + 5, start + length + 5)]
                if split
                else [(start, start + length)]
            )
            for (s, e) in pieces:
                for f in range(s, e + 1):
                    rows.append(
                        {
                            "video_id": vid,
                            "track_id": tid,
                            "frame_id": f,
                            "bbox": bbox,
                            "text": word,
                            "score": float(0.5 + rng.random() * 0.5),
                        }
                    )
                tid += 1
            merged_count += 1
        expected[vid] = merged_count
    return rows, expected
