"""Video track merge + streaming session-window tests."""

import pyspark.sql.functions as F

from davar_lab_ocr_spark.operators.video import (
    edit_dist_iou,
    make_track_fixture,
    merge_video_tracks,
    track_merge_stage,
)
from davar_lab_ocr_spark.schemas import TRACK_EVENTS


def test_edit_dist_iou_golden():
    # identical: inter=max len, union=len -> 1.0
    assert edit_dist_iou("abc", "abc") == 1.0
    # 'abc' vs 'abd': lev=1, inter=2, union=4 -> 0.5
    assert edit_dist_iou("abc", "abd") == 0.5
    assert edit_dist_iou("", "") == 1.0
    assert edit_dist_iou("a", "") == 0.0


def test_merge_splits_same_instance(spark):
    rows, expected = make_track_fixture(6)
    df = spark.createDataFrame(rows, schema=TRACK_EVENTS)
    merged = track_merge_stage(df).collect()
    by_video = {}
    for r in merged:
        by_video.setdefault(r["video_id"], []).append(r)
    for vid, want_count in expected.items():
        assert len(by_video[vid]) == want_count, (
            vid,
            [(r["merged_id"], r["text"], r["frame_start"], r["frame_end"]) for r in by_video[vid]],
        )


def test_merge_respects_interval(spark):
    # same word+bbox but gap > max_interval -> no merge
    rows = []
    for tid, (s, e) in enumerate([(0, 5), (100, 105)]):
        for f in range(s, e + 1):
            rows.append(
                {
                    "video_id": "v",
                    "track_id": tid,
                    "frame_id": f,
                    "bbox": [10.0, 10.0, 60.0, 30.0],
                    "text": "hello",
                    "score": 0.9,
                }
            )
    df = spark.createDataFrame(rows, schema=TRACK_EVENTS)
    assert track_merge_stage(df, max_interval=30).count() == 2
    assert track_merge_stage(df, max_interval=200).count() == 1


def test_merge_requires_similarity(spark):
    # adjacent in time+space but different words -> no merge
    rows = []
    for tid, word in ((0, "hello"), (1, "zzzzz")):
        for f in range(tid * 8, tid * 8 + 6):
            rows.append(
                {
                    "video_id": "v",
                    "track_id": tid,
                    "frame_id": f,
                    "bbox": [10.0, 10.0, 60.0, 30.0],
                    "text": word,
                    "score": 0.9,
                }
            )
    assert track_merge_stage(spark.createDataFrame(rows, schema=TRACK_EVENTS)).count() == 2


def test_sessionized_tracks_batch_and_stream(spark, tmp_path):
    from davar_lab_ocr_spark.streaming.tracks import sessionized_tracks

    rows, _ = make_track_fixture(3, seed=43)
    df = spark.createDataFrame(rows, schema=TRACK_EVENTS).withColumn(
        "frame_ts", F.timestamp_seconds(F.col("frame_id"))
    )
    batch_out = sessionized_tracks(df, gap_seconds=3).collect()
    assert len(batch_out) > 0
    assert all(r["best_text"] for r in batch_out)

    # same data through a real stream (file source, availableNow)
    src = str(tmp_path / "src")
    df.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(df.schema).parquet(src)
    )
    q = (
        sessionized_tracks(stream, gap_seconds=3)
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream_out = spark.sql("select * from sess_out").collect()
    key = lambda r: (r["video_id"], r["track_id"], r["session_start"])
    assert sorted(map(key, stream_out)) == sorted(map(key, batch_out))


def test_stream_extract_end_to_end(spark, tmp_path):
    from davar_lab_ocr_spark.corpus import expected_df, make_raw_corpus, raw_df
    from davar_lab_ocr_spark.schemas import RAW_DOCUMENTS
    from davar_lab_ocr_spark.streaming.tracks import stream_extract

    raw_rows, expected_rows = make_raw_corpus(25, seed=29, giant_every=0)
    src = str(tmp_path / "raw")
    out = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    raw_df(spark, raw_rows).write.mode("overwrite").parquet(src)
    q = stream_extract(spark, src, RAW_DOCUMENTS, out, ckpt)
    q.awaitTermination(180)
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in expected_df(spark, expected_rows).collect()
    }
    assert got == want
