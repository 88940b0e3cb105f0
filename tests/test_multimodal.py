"""Multimodal plumbing tests: binary columns, batched decode metadata,
resize arithmetic, frame sampling."""

import pyspark.sql.functions as F

from davar_lab_ocr_spark.operators.multimodal import (
    decode_media_stage,
    fake_payload,
    fetch_media_stage,
    frame_sample_col,
    resize_meta_cols,
)


def test_media_pipeline_deterministic(spark):
    refs = [(f"media://doc/{i}.png",) for i in range(50)] + [("",)]
    df = spark.createDataFrame(refs, ["media_ref"])
    out = decode_media_stage(fetch_media_stage(df))
    rows = out.collect()
    assert len(rows) == 51
    import hashlib

    for r in rows:
        if r["media_ref"]:
            want = fake_payload(r["media_ref"])
            assert bytes(r["payload"]) == want
            assert bytes(r["payload"]).startswith(b"\x89PNG")  # real codec bytes
            digest = hashlib.md5(r["media_ref"].encode()).digest()
            assert r["m_height"] == 32 + digest[0] % 96
            assert r["m_width"] == 32 + digest[1] % 96
            assert r["m_channels"] == 1 + digest[2] % 3
        else:
            assert r["payload"] is None and r["m_height"] is None


def test_media_pipeline_partition_invariant(spark):
    refs = [(f"media://x/{i}",) for i in range(40)]
    df = spark.createDataFrame(refs, ["media_ref"])
    a = {r["media_ref"]: bytes(r["payload"]) for r in fetch_media_stage(df.repartition(1)).collect()}
    b = {r["media_ref"]: bytes(r["payload"]) for r in fetch_media_stage(df.repartition(8)).collect()}
    assert a == b


def test_resize_meta_keep_ratio(spark):
    df = spark.createDataFrame([(720, 1280), (1080, 1920), (500, 500)], ["h", "w"])
    out = df.select("h", "w", *resize_meta_cols(F.col("h"), F.col("w"), 1280, 720)).collect()
    by_hw = {(r["h"], r["w"]): r for r in out}
    r = by_hw[(720, 1280)]
    assert (r["resized_h"], r["resized_w"], r["scale_factor"]) == (720, 1280, 1.0)
    r = by_hw[(1080, 1920)]
    # scale = min(1280/1920, 720/1080) = 2/3
    assert abs(r["scale_factor"] - 2 / 3) < 1e-6
    assert (r["resized_h"], r["resized_w"]) == (720, 1280)
    r = by_hw[(500, 500)]
    # scale = min(1280/500, 720/500) = 1.44
    assert (r["resized_h"], r["resized_w"]) == (720, 720)


def test_frame_sample(spark):
    df = spark.createDataFrame([(12,)], ["n"])
    row = df.select(frame_sample_col(F.col("n"), 5).alias("f")).collect()[0]
    assert row["f"] == [0, 5, 10]


def test_frame_sample_zero_frames(spark):
    df = spark.createDataFrame([(0,), (1,)], ["n"])
    rows = {r["n"]: r["f"] for r in df.select(
        F.col("n"), frame_sample_col(F.col("n"), 5).alias("f")).collect()}
    assert rows[0] == []
    assert rows[1] == [0]
