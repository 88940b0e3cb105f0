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


def test_stop_shingle_cap_drops_boilerplate(spark):
    # 4 docs share the boilerplate tail; two also share real content.
    boiler = "all rights reserved worldwide"
    rows = [
        (0, "quick brown fox jumps high " + boiler),
        (1, "quick brown fox jumps high " + boiler + " x"),
        (2, "completely different payload here " + boiler),
        (3, "another unrelated body of text " + boiler),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    uncapped = {
        (p["id_a"], p["id_b"])
        for p in ngram_jaccard_pairs(df, threshold=0.1).collect()
    }
    capped = {
        (p["id_a"], p["id_b"])
        for p in ngram_jaccard_pairs(df, threshold=0.1, max_shingle_df=3).collect()
    }
    # the boilerplate-only links (2,3), (0,2)... vanish; the real dup stays
    assert (0, 1) in capped
    assert (2, 3) in uncapped and (2, 3) not in capped


def test_shingles_respect_position_adjacency(spark):
    # double space: no shingle spans the gap (positional adjacency)
    from davar_lab_ocr_spark.operators.dedup import word_shingles

    df = spark.createDataFrame([(0, "a b  c d e")], "doc_id int, text string")
    got = {r["shingle"] for r in word_shingles(df).collect()}
    assert got == {"c d e"}


def test_embedding_near_dup_bucketed_vs_exact(spark):
    rows = [
        (0, [1.0, 0.2, 0.1, 0.3, 0.5, 0.1, 0.2, 0.4]),
        (1, [0.999, 0.2, 0.1, 0.3, 0.5, 0.1, 0.2, 0.4]),  # near-dup of 0
        (2, [-1.0, 0.5, -0.2, 0.1, 0.3, -0.1, 0.2, 0.6]),
        (3, [0.1, -0.9, 0.4, -0.3, 0.2, 0.7, -0.5, 0.1]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    bucketed = [(p["id_a"], p["id_b"]) for p in embedding_near_dup_pairs(df).collect()]
    exact = [
        (p["id_a"], p["id_b"])
        for p in embedding_near_dup_pairs(df, exact=True).collect()
    ]
    assert bucketed == [(0, 1)]
    assert exact == [(0, 1)]


def test_bpe_tokenize_gpt2_shape(spark):
    from davar_lab_ocr_spark.operators.textstats import bpe_tokenize

    df = spark.createDataFrame([(0, "It's 42 degrees, isn't it?  yes!")],
                               "doc_id int, text string")
    pieces = [r["piece"] for r in bpe_tokenize(df).orderBy("ord").collect()]
    assert pieces == ["It", "'s", " 42", " degrees", ",", " isn", "'t", " it", "?", "yes", "!"]


def test_repetition_stats_golden(spark):
    """Hand-computed Gopher-style repetition signals."""
    import pytest

    from davar_lab_ocr_spark.operators.textstats import repetition_stats

    rows = [
        # "a b a b c": 5 tokens, 3 uniq -> dup_token_frac = 0.4
        # bigrams: 'a b' x2 (chars 2), 'b a', 'b c' -> top = 2*2=4 over 5 chars
        # trigrams: 'a b a','b a b','a b c' all unique -> 0
        (1, "a b a b c"),
        # all distinct -> zeros except top bigram (each bigram count 1)
        (2, "xx yy zz"),
        # 'w w w w': dup_token 0.75; bigram 'w w' x3 chars2 -> 6/4=1.5;
        # trigram 'w w w' x2 chars3 -> 6/4 = 1.5
        (3, "w w w w"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert got[1]["dup_token_frac"] == pytest.approx(0.4)
    assert got[1]["top_bigram_char_frac"] == pytest.approx(round(4 / 5, 6))
    assert got[1]["dup_trigram_char_frac"] == 0.0
    assert got[2]["dup_token_frac"] == 0.0
    # top bigram of doc2: count 1 * chars 4 over 6 chars
    assert got[2]["top_bigram_char_frac"] == pytest.approx(round(4 / 6, 6))
    assert got[3]["dup_token_frac"] == pytest.approx(0.75)
    assert got[3]["top_bigram_char_frac"] == pytest.approx(1.5)
    assert got[3]["dup_trigram_char_frac"] == pytest.approx(1.5)


def test_jaccard_cap_is_default(spark):
    # 300 docs whose ONLY shared shingles are boilerplate appearing in
    # all 300 (> the default cap of 256): the default plan must drop
    # them (no pairs); the explicit None opt-out links everything.
    rows = [(i, f"unique{i} token{i} word{i} all rights reserved worldwide")
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    assert ngram_jaccard_pairs(df, threshold=0.1).count() == 0
    assert ngram_jaccard_pairs(df, threshold=0.1, max_shingle_df=None).count() == 300 * 299 // 2


def test_minhash_band_bucket_cap_bounds_identical_cluster(spark):
    # d=1000 identical docs: all signatures equal, every band bucket is
    # oversized -> star pairing emits d-1 edges (vs d*(d-1)/2 uncapped)
    d = 1000
    text = "the same document text repeated for the dedup cluster test body"
    df = spark.createDataFrame([(i, text) for i in range(d)], "doc_id int, text string")
    pairs = minhash_lsh_pairs(df).collect()
    assert len(pairs) == d - 1
    assert all(p["id_a"] == 0 and p["n_bands"] == 4 for p in pairs)
    # no oversized bucket -> cap is a no-op (matches the exhaustive path)
    small = spark.createDataFrame([(i, text) for i in range(10)], "doc_id int, text string")
    assert minhash_lsh_pairs(small).count() == 45
    assert minhash_lsh_pairs(small, max_band_bucket=None).count() == 45


def test_top_bigram_is_most_frequent_not_max_weight(spark):
    import pytest

    from davar_lab_ocr_spark.operators.textstats import repetition_stats

    # 'a b' occurs 3x (chars 2, weight 6); 'lengthy bigramword' occurs
    # once (chars 17, weight 17). Gopher picks the most FREQUENT bigram
    # ('a b', coverage 6), not the max-weight one (17).
    text = "a b a b a b lengthy bigramword"
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    row = repetition_stats(df).collect()[0]
    total_chars = sum(len(t) for t in text.split())
    assert row["top_bigram_char_frac"] == pytest.approx(round(6 / total_chars, 6))


def test_dup_clusters_recovers_components(spark):
    from davar_lab_ocr_spark.operators.dedup import dup_clusters

    # two components: a star {0,1,2,3} (edges to rep 0) and a CHAIN
    # 10-11-12 (diameter 2: propagation needs >1 round)
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (10, 11), (11, 12)], "id_a int, id_b int"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 12: 10}


def test_dup_clusters_raises_when_unconverged(spark):
    import pytest as _pytest

    from davar_lab_ocr_spark.operators.dedup import dup_clusters

    # a 6-node chain has diameter 5; min-label propagation moves the
    # label one hop per round, so max_iters=2 cannot converge — the
    # loop must raise rather than silently return split clusters
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "id_a int, id_b int"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        dup_clusters(pairs, max_iters=2)
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert got == {i: 0 for i in range(6)}


def test_dup_clusters_closes_star_pairing(spark):
    from davar_lab_ocr_spark.operators.dedup import dup_clusters, minhash_lsh_pairs

    # 200 identical docs: capped LSH emits 199 star edges; the closure
    # must still put all 200 in ONE cluster keyed by the min id
    text = "identical document body for the closure test case here"
    df = spark.createDataFrame([(i, text) for i in range(200)], "doc_id int, text string")
    clusters = dup_clusters(minhash_lsh_pairs(df)).collect()
    assert len(clusters) == 200
    assert {r["cluster_id"] for r in clusters} == {0}
