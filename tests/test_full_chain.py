"""Full sensor-to-spans chain: EAST maps -> quads -> recognize -> order
must reproduce the independently computed expected spans."""

from davar_lab_ocr_spark.plans.full_chain import (
    FULLCHAIN_SCHEMA,
    extract_from_maps,
    make_fullchain_fixture,
)


def test_full_chain_matches_expected(spark):
    rows, expected = make_fullchain_fixture(30, seed=83)
    df = spark.createDataFrame(rows, FULLCHAIN_SCHEMA)
    out = extract_from_maps(df)
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in out.collect()
    }
    want = {
        e["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in e["spans"]]
        for e in expected
    }
    assert got == want


def test_full_chain_partition_invariant(spark):
    rows, _ = make_fullchain_fixture(12, seed=89)
    df = spark.createDataFrame(rows, FULLCHAIN_SCHEMA)
    a = {r["doc_id"]: r["spans"] for r in extract_from_maps(df.repartition(1)).collect()}
    b = {r["doc_id"]: r["spans"] for r in extract_from_maps(df.repartition(8)).collect()}
    assert a == b
