"""Similarity search over embedding columns.

- cosine_expr: JVM-side cosine via zip_with + aggregate (no UDF).
- brute_force_topk: exact top-k neighbors; broadcast the (small) query
  side so the big side streams without a shuffle.
- lsh_buckets / lsh_topk: sign-projection LSH (axis-aligned random
  hyperplanes = first ``n_bits`` dimensions' signs). Bucket key is a
  small string; candidate generation is an equi-join on the bucket —
  the 100 TB path: the big side is hash-partitioned by bucket, each
  query probes one bucket.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def cosine_expr(a, b) -> F.Column:
    """Cosine similarity of two array<float|double> columns, JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))
    return dot / (na * nb)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.
    (query_id, neighbor_id, cos_sim) — deterministic tiebreak on id."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = c.join(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(cosine_expr(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
    )


def bucket_key_expr(vec_col, n_bits: int = 4) -> F.Column:
    """Sign-LSH bucket key: concatenated signs of the first n_bits dims.
    Null-safe indexing: vectors shorter than n_bits pad with '0'."""
    parts = [
        F.when(F.try_element_at(vec_col, F.lit(i + 1)) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ]
    return F.concat(*parts)


def lsh_buckets(df: DataFrame, n_bits: int = 4, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Bucket histogram: (bucket, n_vectors) — the IVF-style partition map."""
    return (
        df.select(bucket_key_expr(F.col(vec_col), n_bits).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
    )


def probe_buckets_expr(vec_col, n_bits: int = 4) -> F.Column:
    """Multi-probe key set: the query's own bucket plus every bucket at
    Hamming distance 1 (one sign flipped) — the standard multi-probe
    LSH recall fix: a true neighbor lands in another bucket only when
    some component sits near the hyperplane, and flipping that one bit
    reaches it. n_bits+1 probes instead of 2^n_bits buckets scanned."""
    base = bucket_key_expr(vec_col, n_bits)
    probes = [base]
    for i in range(n_bits):
        flipped = F.when(F.substring(base, i + 1, 1) == "1", F.lit("0")).otherwise(F.lit("1"))
        probes.append(
            F.concat(F.substring(base, 1, i), flipped, F.substring(base, i + 2, n_bits - i - 1))
        )
    return F.array(*probes)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 1,
    n_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = False,
) -> DataFrame:
    """ANN: probe the query's LSH bucket (plus all 1-flip buckets when
    ``multiprobe``), exact rank inside. (query_id, neighbor_id,
    cos_sim). Corpus vectors live in exactly one bucket, so multi-probe
    never produces duplicate candidate pairs."""
    if multiprobe:
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.explode(probe_buckets_expr(F.col(vec_col), n_bits)).alias("bucket"),
        )
    else:
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            bucket_key_expr(F.col(vec_col), n_bits).alias("bucket"),
        )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        bucket_key_expr(F.col(vec_col), n_bits).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id",
        "neighbor_id",
        F.round(cosine_expr(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )
