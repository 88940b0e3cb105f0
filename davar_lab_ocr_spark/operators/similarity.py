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


# ---------------------------------------------------------------------------
# IVF (k-means coarse quantizer) — the other classic ANN scale path
# ---------------------------------------------------------------------------
def _sq_dist_expr(vec_col, centroid: list[float]) -> F.Column:
    """Squared L2 distance of an array column to one literal centroid,
    JVM-side (zip_with + aggregate, no UDF)."""
    lit_c = F.array(*[F.lit(float(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(vec_col, lit_c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign_expr(vec_col, centroids: list[list[float]]) -> F.Column:
    """Nearest-centroid index (0-based) via array_min over
    struct<dist, idx> — struct ordering gives min-dist, tie -> lower
    idx. All JVM expressions. The expression tree is O(k*dim) nodes
    built into the PLAN itself, so it only suits a small coarse
    quantizer — above _ASSIGN_EXPR_MAX_TERMS the dispatcher
    (assign_clusters) switches to the broadcast-matrix Arrow path."""
    structs = [
        F.struct(_sq_dist_expr(vec_col, c).alias("d"), F.lit(i).alias("i"))
        for i, c in enumerate(centroids)
    ]
    # array() re-derives element field names; pin them with a cast so
    # the getField below is version-stable
    arr = F.array(*structs).cast("array<struct<d:double,i:int>>")
    return F.array_min(arr)["i"]


# k*dim above this: the literal expression tree (and its codegen) costs
# more than one Arrow crossing — switch to the broadcast numpy assign
_ASSIGN_EXPR_MAX_TERMS = 512


def _centroid_matrix(df: DataFrame, centroids: list[list[float]]):
    """Ship the centroid matrix to executors ONCE via a real Spark
    broadcast variable (not closure capture): at k ~ sqrt(n) the matrix
    is MBs, and per-task closure serialization would re-ship it with
    every task."""
    import numpy as np

    return df.sparkSession.sparkContext.broadcast(
        np.asarray(centroids, dtype=np.float64)
    )


def _list_to_matrix(col, dim: int):
    """Arrow list column -> (n, dim) float64 matrix, zero-ragged check."""
    import numpy as np

    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    if flat.size != len(col) * dim:
        raise ValueError(
            f"ragged or wrong-dim vectors: {flat.size} values for "
            f"{len(col)} rows of dim {dim}"
        )
    return flat.reshape(len(col), dim)


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
    method: str = "auto",
) -> DataFrame:
    """Append nearest-centroid index for every row.

    method='expr': JVM literal-expression path (small k*dim — zero
    Python crossings, lives inside whole-stage codegen).
    method='arrow': broadcast the centroid matrix, one mapInArrow
    crossing computing argmin(-2 V C^T + |c|^2) per record batch —
    O(k*dim) work per ROW but O(1) plan size; the path that holds at
    k ~ sqrt(n). 'auto' switches on k*dim > _ASSIGN_EXPR_MAX_TERMS.
    Ties: both paths pick the lowest centroid index (struct-min / first
    argmin); the arrow path's factored distance can differ from the
    sequential JVM sum only by float rounding on near-exact ties.
    """
    import pyspark.sql.types as ST

    k, dim = len(centroids), len(centroids[0])
    use_arrow = method == "arrow" or (method == "auto" and k * dim > _ASSIGN_EXPR_MAX_TERMS)
    if not use_arrow:
        return df.withColumn(out_col, _assign_expr(F.col(vec_col), centroids))

    bc = _centroid_matrix(df, centroids)
    out_schema = ST.StructType(df.schema.fields + [ST.StructField(out_col, ST.IntegerType())])

    def run(batches):
        import numpy as np
        import pyarrow as pa

        C = bc.value
        c_sq = (C * C).sum(axis=1)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            V = _list_to_matrix(batch.column(vec_col), dim)
            # |v-c|^2 = |v|^2 - 2 v.c + |c|^2; |v|^2 is constant per row
            d = c_sq[None, :] - 2.0 * (V @ C.T)
            idx = np.argmin(d, axis=1).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)] + [pa.array(idx)],
                names=list(batch.schema.names) + [out_col],
            )

    return df.mapInArrow(run, schema=out_schema)


def probe_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    nprobe: int,
    vec_col: str = "qv",
    out_col: str = "cluster",
    method: str = "auto",
) -> DataFrame:
    """Explode each row into its ``nprobe`` nearest centroid ids
    (query-side IVF probe). Same expr/arrow dispatch as
    assign_clusters; the arrow path appends a list column of the
    nprobe nearest ids (argsort, deterministic lowest-index ties via
    stable sort on (dist, idx)) and explodes JVM-side."""
    import pyspark.sql.types as ST

    k, dim = len(centroids), len(centroids[0])
    use_arrow = method == "arrow" or (method == "auto" and k * dim > _ASSIGN_EXPR_MAX_TERMS)
    if not use_arrow:
        probe_structs = F.array(
            *[
                F.struct(_sq_dist_expr(F.col(vec_col), c).alias("d"), F.lit(i).alias("i"))
                for i, c in enumerate(centroids)
            ]
        ).cast("array<struct<d:double,i:int>>")
        probes = F.transform(F.slice(F.array_sort(probe_structs), 1, nprobe), lambda s: s["i"])
        return df.withColumn(out_col, F.explode(probes))

    bc = _centroid_matrix(df, centroids)
    tmp = "__probe_list"
    out_schema = ST.StructType(
        df.schema.fields + [ST.StructField(tmp, ST.ArrayType(ST.IntegerType()))]
    )

    def run(batches):
        import numpy as np
        import pyarrow as pa

        C = bc.value
        c_sq = (C * C).sum(axis=1)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            V = _list_to_matrix(batch.column(vec_col), dim)
            d = c_sq[None, :] - 2.0 * (V @ C.T)
            # stable argsort -> equal distances keep ascending index,
            # matching the struct<d,i> ordering of the expr path
            order = np.argsort(d, axis=1, kind="stable")[:, :nprobe].astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(batch.num_columns)]
                + [pa.array(order.tolist(), type=pa.list_(pa.int32()))],
                names=list(batch.schema.names) + [tmp],
            )

    out = df.mapInArrow(run, schema=out_schema)
    return out.withColumn(out_col, F.explode(F.col(tmp))).drop(tmp)


def kmeans_centroids(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Distributed Lloyd iterations for the IVF coarse quantizer.
    Deterministic init (the k smallest ids); each iteration assigns
    every vector JVM-side and averages per-cluster per-dimension with
    posexplode + groupBy. Only k*dim floats ever reach the driver (the
    centroids themselves — that is the coarse quantizer's job).
    Empty clusters keep their previous centroid."""
    init_rows = df.orderBy(F.col(id_col)).limit(k).select(F.col(vec_col).alias("v")).collect()
    centroids = [[float(x) for x in r["v"]] for r in init_rows]
    dim = len(centroids[0])
    for _ in range(iters):
        assigned = assign_clusters(
            df.select(F.col(vec_col)), centroids, vec_col=vec_col
        ).select(
            "cluster",
            F.posexplode(F.col(vec_col)).alias("pos", "x"),
        )
        rows = (
            assigned.groupBy("cluster", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        new = [list(c) for c in centroids]
        for r in rows:
            new[int(r["cluster"])][int(r["pos"])] = float(r["m"])
        centroids = new
    return centroids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: corpus vectors live in their nearest centroid's list;
    each query probes its ``nprobe`` nearest lists; exact cosine rank
    inside the candidate set. (query_id, neighbor_id, cos_sim, rk).
    The probe join is a plain equi-join on cluster id — at scale the
    corpus side is hash-partitioned (or bucketed) by cluster and only
    nprobe/k of it is touched per query."""
    q = probe_clusters(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        centroids,
        nprobe,
        vec_col="qv",
    )
    c = assign_clusters(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        centroids,
        vec_col="cv",
    )
    scored = c.join(F.broadcast(q), "cluster").select(
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
