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
