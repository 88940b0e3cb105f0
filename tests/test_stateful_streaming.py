"""applyInPandasWithState operators: cross-microbatch dedup and
running best-frame, driven through a real multi-batch stream
(maxFilesPerTrigger=1 forces one microbatch per file)."""

import pyspark.sql.functions as F


def _run_stream(spark, src, schema, op, query_name, n_batches):
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        op(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    return spark.sql(f"select * from {query_name}").collect()


def test_stream_dedup_across_batches(spark, tmp_path):
    from davar_lab_ocr_spark.streaming.stateful import stream_dedup

    src = str(tmp_path / "src")
    schema = "digest string, doc_id long"
    # batch 1: digests a, b; batch 2: b again (dup) + c
    spark.createDataFrame(
        [("a", 1), ("b", 2)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [("b", 9), ("c", 3)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    rows = _run_stream(spark, src, schema, stream_dedup, "dedup_out", 2)
    got = {r["digest"]: r["doc_id"] for r in rows}
    assert got == {"a": 1, "b": 2, "c": 3}  # 'b' emitted once, first doc wins
    assert len(rows) == 3


def test_stream_best_frame_updates_only_on_improvement(spark, tmp_path):
    from davar_lab_ocr_spark.streaming.stateful import stream_best_frame

    src = str(tmp_path / "src")
    schema = "video_id string, track_id int, text string, score double"
    spark.createDataFrame(
        [("v", 1, "lo", 0.5), ("v", 2, "x", 0.9)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [("v", 1, "hi", 0.8), ("v", 2, "worse", 0.1)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    rows = _run_stream(spark, src, schema, stream_best_frame, "best_out", 2)
    by_track = {}
    for r in rows:
        by_track.setdefault(r["track_id"], []).append((r["best_text"], r["best_score"]))
    # track 1 improved in batch 2 -> two emissions ending at 'hi'
    assert by_track[1][-1] == ("hi", 0.8) and len(by_track[1]) == 2
    # track 2 never improved after batch 1 -> single emission
    assert by_track[2] == [("x", 0.9)]


def test_sessionized_tracks_drops_late_frames(spark, tmp_path):
    """Watermark semantics on the session-window path: a frame arriving
    a microbatch later but older than the watermark must NOT join (or
    re-open) its already-finalized session."""
    from davar_lab_ocr_spark.streaming.tracks import sessionized_tracks

    src = str(tmp_path / "late_src")
    schema = "video_id string, track_id int, frame_id long, text string, score double"
    # batch 1: track 1 session (frames 100, 103) + a watermark pusher at
    # t=1000 on another track (watermark -> 940 at the next batch)
    spark.createDataFrame(
        [("v", 1, 100, "abc", 0.9), ("v", 1, 103, "abd", 0.8), ("v", 2, 1000, "zz", 0.5)],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    # FileStreamSource orders pending files by modification time; the
    # writes must not share a timestamp or batches can reorder. The
    # watermark derived from batch N's max event time becomes OPERATIVE
    # at batch N+2 (computed after N, applied to the next planned
    # batch), so the late frame goes in the third file
    import time

    time.sleep(1.2)
    # batch 2: keeps the stream moving; state for track 1 is evicted
    # here (watermark 940 > session end)
    spark.createDataFrame([("v", 2, 1001, "zz", 0.6)], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.2)
    # batch 3: LATE frame for track 1 (t=101 < watermark 940) + pusher
    spark.createDataFrame(
        [("v", 1, 101, "late", 0.99), ("v", 2, 1002, "zz", 0.6)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    def op(stream):
        return sessionized_tracks(
            stream.withColumn("frame_ts", F.timestamp_seconds(F.col("frame_id"))),
            gap_seconds=5,
            watermark="60 seconds",
        )

    rows = _run_stream(spark, src, schema, op, "late_out", 3)
    t1 = [r for r in rows if r["track_id"] == 1]
    assert len(t1) == 1
    # the finalized session holds exactly the 2 on-time frames; the late
    # high-score frame neither joined it nor spawned an emitted session
    assert t1[0]["n_frames"] == 2
    assert t1[0]["best_text"] == "abc"
    assert not [r for r in rows if r["track_id"] == 1 and r["n_frames"] == 1]


def test_stream_dedup_ttl_bounds_state(spark, tmp_path):
    """With a processing-time TTL, a digest idle past the TTL is
    forgotten (bounded state at corpus scale) and a later duplicate
    re-emits. Processing-time timeouts fire only while the query runs
    on a periodic trigger (documented constraint), so this test keeps
    one query alive across the TTL window instead of using
    availableNow."""
    import time

    from davar_lab_ocr_spark.streaming.stateful import stream_dedup

    src = str(tmp_path / "ttl_src")
    chk = str(tmp_path / "ttl_chk")
    out = str(tmp_path / "ttl_out")
    schema = "digest string, doc_id long"

    spark.createDataFrame([("a", 1)], schema).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        stream_dedup(stream, ttl_ms=500)
        .writeStream.format("parquet")
        .option("checkpointLocation", chk)
        .option("path", out)
        .outputMode("append")
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        # wait for the first emission, then well past the TTL
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 1:
                    break
            except Exception:
                pass
            time.sleep(0.5)
        time.sleep(3)  # several trigger intervals beyond the 500ms TTL
        spark.createDataFrame([("a", 9)], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            try:
                rows = sorted(
                    (r["digest"], r["doc_id"]) for r in spark.read.parquet(out).collect()
                )
            except Exception:
                rows = []
            if len(rows) >= 2:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    # 'a' emitted twice: once per TTL window (state was forgotten between)
    assert rows == [("a", 1), ("a", 9)]
