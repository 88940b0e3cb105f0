"""Custom stateful streaming operators (applyInPandasWithState).

Two operators a training-data stream needs that plain windowed aggs
can't express:

- stream_dedup: exactly-once emission of first-seen keys across
  microbatches (the streaming form of dedup.exact_dedup_groups) —
  state per digest remembers that it was emitted.
- stream_best_frame: running best-scored observation per (video,
  track), emitting an update only when the best improves (the
  streaming form of the video quality-filter best-frame selection,
  filter.py:41-115).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT = T.StructType(
    [
        T.StructField("digest", T.StringType()),
        T.StructField("doc_id", T.LongType()),
    ]
)
DEDUP_STATE = T.StructType([T.StructField("seen", T.BooleanType())])


def _make_dedup_fn(ttl_ms: int | None):
    def _dedup_fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return iter(())
        if state.exists:
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)  # hot keys stay deduped
            return iter(())
        first = None
        for pdf in pdfs:
            if len(pdf):
                row = pdf.sort_values("doc_id").iloc[0]
                if first is None or row["doc_id"] < first:
                    first = int(row["doc_id"])
        if first is None:
            return iter(())
        state.update((True,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        return iter([pd.DataFrame({"digest": [key[0]], "doc_id": [first]})])

    return _dedup_fn


def stream_dedup(events, ttl_ms: int | None = None):
    """events: streaming df with (digest string, doc_id long). Emits
    each digest exactly once (first doc_id wins), across microbatches.

    ``ttl_ms``: optional processing-time state TTL. Without it, state
    holds one entry per distinct digest FOREVER — unbounded at
    10^12-doc scale. With it, a digest idle for ttl_ms is forgotten
    (bounded state, the production trade: a duplicate arriving after
    the TTL re-emits; exact once-ever dedup is the batch
    exact_dedup path).

    Constraint: processing-time timeouts fire only while the query
    runs on a periodic trigger — use ``trigger(processingTime=...)``;
    ``availableNow``/one-shot runs never fire the timeouts (and can
    keep scheduling batches while timeouts are pending), so ttl_ms
    with a one-shot trigger is unsupported."""
    fn = _make_dedup_fn(ttl_ms)
    return events.groupBy("digest").applyInPandasWithState(
        fn,
        outputStructType=DEDUP_OUT,
        stateStructType=DEDUP_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


BEST_OUT = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("track_id", T.IntegerType()),
        T.StructField("best_text", T.StringType()),
        T.StructField("best_score", T.DoubleType()),
    ]
)
BEST_STATE = T.StructType(
    [T.StructField("score", T.DoubleType()), T.StructField("text", T.StringType())]
)


def _best_fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    best_score, best_text = (state.get if state.exists else (-1.0, ""))
    improved = False
    for pdf in pdfs:
        for _, row in pdf.iterrows():
            if row["score"] > best_score:
                best_score, best_text = float(row["score"]), row["text"]
                improved = True
    if not improved:
        return iter(())
    state.update((best_score, best_text))
    return iter(
        [
            pd.DataFrame(
                {
                    "video_id": [key[0]],
                    "track_id": [key[1]],
                    "best_text": [best_text],
                    "best_score": [best_score],
                }
            )
        ]
    )


def stream_best_frame(frames):
    """frames: streaming df with (video_id, track_id, text, score).
    Emits an update whenever a track's best quality score improves."""
    return frames.groupBy("video_id", "track_id").applyInPandasWithState(
        _best_fn,
        outputStructType=BEST_OUT,
        stateStructType=BEST_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
