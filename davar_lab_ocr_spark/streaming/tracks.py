"""Structured Streaming variants of the video-text operators.

The reference's video pipeline is batch over frame sequences
(multi_frame_dataset.py, merge_seq.py); its streaming analog
(SURVEY.md §2.9):

- event time  = frame timestamp,
- track window = session window with gap = merge_max_interval (a track
  sequence ends when no observation arrives within the gap),
- best-frame selection = max_by(text, score) inside the window,
- late frames handled by watermark.

Also a streaming variant of the extraction pipeline: every per-doc
stage is stateless, so the same plan runs under readStream with an
append sink (see stream_extract).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def sessionized_tracks(
    frames: DataFrame,
    gap_seconds: int = 30,
    watermark: str = "60 seconds",
) -> DataFrame:
    """Streaming track aggregation: group per (video, track) into
    session windows over the frame event time; emit per-session best
    text + bounds. ``frames`` must carry ``frame_ts`` (timestamp).
    Works identically on a batch DataFrame (session_window is allowed
    in batch) — tested both ways."""
    df = frames
    if df.isStreaming:
        df = df.withWatermark("frame_ts", watermark)
    return (
        df.groupBy(
            "video_id",
            "track_id",
            F.session_window("frame_ts", f"{gap_seconds} seconds").alias("w"),
        )
        .agg(
            F.count("*").alias("n_frames"),
            F.max_by("text", "score").alias("best_text"),
            F.max("score").alias("best_score"),
            F.min("frame_id").alias("frame_start"),
            F.max("frame_id").alias("frame_end"),
        )
        .select(
            "video_id",
            "track_id",
            F.col("w.start").alias("session_start"),
            "n_frames",
            "best_text",
            F.round("best_score", 6).alias("best_score"),
            "frame_start",
            "frame_end",
        )
    )


def stream_extract(spark, source_path: str, schema, out_path: str, checkpoint: str):
    """Streaming extraction: readStream on an append-only raw-documents
    directory -> the same extract() plan -> parquet append sink with a
    checkpoint (exactly-once per microbatch). Demonstrates that every
    per-doc stage is stateless; only corpus metrics need output-mode
    care."""
    from ..plans.extract import extract

    raw = spark.readStream.schema(schema).parquet(source_path)
    # the final groupBy(doc_id) is a streaming aggregation; with
    # append-only per-doc rows we instead run extract per microbatch
    # (foreachBatch), which keeps the batch plan untouched.
    # Idempotent under microbatch REPLAY: each batch overwrites its own
    # batch_id-keyed directory, so an at-least-once retry rewrites the
    # same data instead of appending duplicates.
    def _process(batch_df, batch_id):
        extract(batch_df).write.mode("overwrite").parquet(
            f"{out_path}/batch={batch_id}"
        )

    return (
        raw.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
