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


def test_kmeans_centroids_converge_on_planted_clusters(spark):
    """Three well-separated planted clusters: Lloyd must place one
    centroid in each (assignment partitions the data exactly)."""
    import numpy as np

    from davar_lab_ocr_spark.operators.similarity import kmeans_centroids

    rng = np.random.default_rng(5)
    rows = []
    centers = [np.zeros(8), np.full(8, 10.0), np.full(8, -10.0)]
    for i in range(90):
        c = centers[i % 3]
        rows.append((i, (c + rng.normal(0, 0.1, 8)).tolist()))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cents = kmeans_centroids(df, k=3, iters=4)
    # each planted center is within 0.5 of exactly one learned centroid
    for c in centers:
        dists = [float(np.linalg.norm(np.array(cc) - c)) for cc in cents]
        assert min(dists) < 0.5


def test_ivf_topk_matches_brute_force_with_full_probe(spark):
    """nprobe = n_centroids makes IVF exhaustive: results must equal
    brute force exactly (same ids, same sims, same ranks)."""
    import numpy as np

    from davar_lab_ocr_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )

    rng = np.random.default_rng(9)
    corpus_rows = [(i, rng.normal(0, 1, 12).tolist()) for i in range(60)]
    corpus = spark.createDataFrame(corpus_rows, "vec_id int, embedding array<double>")
    queries = corpus.filter(F.col("vec_id") < 5)
    body = corpus.filter(F.col("vec_id") >= 5)
    cents = kmeans_centroids(body, k=4, iters=2)
    got = {
        (r["query_id"], r["rk"]): (r["neighbor_id"], r["cos_sim"])
        for r in ivf_topk(queries, body, cents, k=3, nprobe=4).collect()
    }
    want = {
        (r["query_id"], r["rk"]): (r["neighbor_id"], r["cos_sim"])
        for r in brute_force_topk(queries, body, k=3).collect()
    }
    assert got == want


def test_ivf_topk_partial_probe_recall(spark):
    """With clustered data and nprobe=1, IVF finds the true neighbor
    whenever it shares the query's cluster — planted so it always does."""
    import numpy as np

    from davar_lab_ocr_spark.operators.similarity import ivf_topk, kmeans_centroids

    rng = np.random.default_rng(13)
    centers = [np.full(6, v, dtype=float) for v in (0.0, 20.0)]
    rows = []
    for i in range(40):
        c = centers[i % 2]
        rows.append((i, (c + rng.normal(0, 0.05, 6) + 1.0).tolist()))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cents = kmeans_centroids(df, k=2, iters=3)
    out = ivf_topk(df.filter(F.col("vec_id") < 4), df.filter(F.col("vec_id") >= 4),
                   cents, k=1, nprobe=1).collect()
    assert len(out) == 4
    for r in out:
        # nearest neighbor of query i is i+4 mod parity cluster: same
        # parity (same planted cluster) is sufficient to assert
        assert r["neighbor_id"] % 2 == r["query_id"] % 2


def test_assign_clusters_arrow_matches_expr(spark):
    # the broadcast-matrix Arrow assign must agree with the JVM literal
    # expression path (and with probe_clusters' first probe)
    import random

    from davar_lab_ocr_spark.operators.similarity import (
        assign_clusters,
        probe_clusters,
    )

    rng = random.Random(11)
    dim, k = 16, 6
    cents = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(k)]
    rows = [
        (i, [c + rng.uniform(-0.05, 0.05) for c in cents[i % k]])
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    by_expr = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(df, cents, method="expr").collect()
    }
    by_arrow = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(df, cents, method="arrow").collect()
    }
    assert by_expr == by_arrow
    probe_expr = {
        (r["vec_id"], r["cluster"])
        for r in probe_clusters(df, cents, nprobe=2, vec_col="embedding", method="expr").collect()
    }
    probe_arrow = {
        (r["vec_id"], r["cluster"])
        for r in probe_clusters(df, cents, nprobe=2, vec_col="embedding", method="arrow").collect()
    }
    assert probe_expr == probe_arrow
    # nearest probe == assigned cluster
    assert {(v, c) for v, c in by_arrow.items()} <= probe_arrow


def test_ivf_large_k_uses_arrow_and_matches(spark):
    # k*dim over the dispatch threshold: end-to-end ivf_topk on the
    # arrow path must equal brute force under exhaustive probing
    import random

    from davar_lab_ocr_spark.operators.similarity import (
        _ASSIGN_EXPR_MAX_TERMS,
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )

    rng = random.Random(5)
    dim, k = 32, 16 + 1  # 17*32 = 544 > 512
    assert (k * dim) > _ASSIGN_EXPR_MAX_TERMS
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    queries = df.filter("vec_id < 5")
    corpus = df.filter("vec_id >= 5")
    cents = kmeans_centroids(corpus, k=k, iters=2)
    got = {
        (r["query_id"], r["rk"]): r["neighbor_id"]
        for r in ivf_topk(queries, corpus, cents, k=3, nprobe=k).collect()
    }
    want = {
        (r["query_id"], r["rk"]): r["neighbor_id"]
        for r in brute_force_topk(queries, corpus, k=3).collect()
    }
    assert got == want
