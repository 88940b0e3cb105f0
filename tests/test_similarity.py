"""Similarity-search operator tests: bucket keys, multi-probe recall,
brute-force agreement."""

import pyspark.sql.functions as F

from davar_lab_ocr_spark.operators.similarity import (
    brute_force_topk,
    bucket_key_expr,
    lsh_topk,
    probe_buckets_expr,
)


def test_probe_buckets_cover_hamming_one(spark):
    df = spark.createDataFrame([(0, [1.0, -1.0, 1.0, 1.0])], "vec_id int, embedding array<double>")
    row = df.select(
        bucket_key_expr(F.col("embedding"), 4).alias("b"),
        probe_buckets_expr(F.col("embedding"), 4).alias("probes"),
    ).collect()[0]
    assert row["b"] == "1011"
    assert row["probes"] == ["1011", "0011", "1111", "1001", "1010"]


def test_multiprobe_recovers_boundary_neighbor(spark):
    # neighbor is nearly identical but its first component sits on the
    # other side of the hyperplane -> different bucket; single-probe
    # misses it, multi-probe finds it
    rows = [
        (0, [0.001, 1.0, 1.0, 1.0, 0.5]),    # query
        (1, [-0.001, 1.0, 1.0, 1.0, 0.5]),   # true neighbor, flipped sign
        (2, [1.0, -1.0, -1.0, 1.0, -0.5]),   # same bucket as nothing useful
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = df.filter(F.col("vec_id") == 0)
    c = df.filter(F.col("vec_id") > 0)
    single = lsh_topk(q, c, k=1, n_bits=4).collect()
    multi = lsh_topk(q, c, k=1, n_bits=4, multiprobe=True).collect()
    assert [r["neighbor_id"] for r in single] == []  # bucket empty
    assert [r["neighbor_id"] for r in multi] == [1]
    # and the multi-probe answer agrees with exact search
    exact = brute_force_topk(q, c, k=1).collect()
    assert exact[0]["neighbor_id"] == 1
    assert abs(multi[0]["cos_sim"] - exact[0]["cos_sim"]) < 1e-9
