"""Direct operator tests for the dedup family (the contract queries
cover oracle parity; these cover the operator API on planted data)."""

import pyspark.sql.functions as F

from davar_lab_ocr_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)


def test_embedding_near_dup(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.001, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    pairs = embedding_near_dup_pairs(df, threshold=0.98).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(0, 1)]


def test_minhash_finds_planted_near_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(0, base), (1, base + " extra"), (2, "completely different words here entirely unrelated text")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    pairs = {(p["id_a"], p["id_b"]) for p in minhash_lsh_pairs(df).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs
    jac = {(p["id_a"], p["id_b"]): p["jaccard"] for p in ngram_jaccard_pairs(df).collect()}
    assert jac[(0, 1)] > 0.8


def test_simhash_similar_docs_close(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon eta"),  # one token differs
        (2, "nine eight seven six five four"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    h = {r["doc_id"]: r["simhash"] for r in simhash(df).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(h[0], h[1]) < ham(h[0], h[2])


def test_exact_dedup_normalization(spark):
    rows = [(0, "Hello, World!"), (1, "hello world"), (2, "other text")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    groups = exact_dedup_groups(df).filter(F.col("n_docs") > 1).collect()
    assert len(groups) == 1 and groups[0]["keep_id"] == 0
