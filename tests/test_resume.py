"""Snapshot commit / resume / lineage tests (north-rule ops story)."""

import json
import os

import pyspark.sql.functions as F

from davar_lab_ocr_spark.corpus import expected_df, make_raw_corpus, raw_df
from davar_lab_ocr_spark.plans.resume import SnapshotSink, run_resumable_extract


def _spans_map(df):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in df.collect()
    }


def test_resume_after_partial_commit(spark, tmp_path):
    out = str(tmp_path / "sink")
    raw_rows, expected_rows = make_raw_corpus(60, seed=21, giant_every=0)
    full = raw_df(spark, raw_rows)

    # batch 1: first 25 docs committed
    first = full.filter(F.col("doc_id") < "doc-21-0000025")
    m1 = run_resumable_extract(spark, first, out, batch_id="b1")
    assert m1["n_docs"] > 0

    # simulate a CRASHED batch: data dir written, NO manifest
    crashed_dir = os.path.join(out, "batch=crashed")
    first.limit(3).write.mode("overwrite").parquet(crashed_dir)

    # batch 2 over the FULL input: must process only the remainder
    m2 = run_resumable_extract(spark, full, out, batch_id="b2")
    assert m1["n_docs"] + m2["n_docs"] == 60

    sink = SnapshotSink(out)
    got = _spans_map(sink.read(spark))
    want = _spans_map(expected_df(spark, expected_rows))
    assert got == want  # crashed partial output invisible, no dups, no gaps


def test_rerun_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "sink2")
    raw_rows, _ = make_raw_corpus(20, seed=22, giant_every=0)
    full = raw_df(spark, raw_rows)
    run_resumable_extract(spark, full, out, batch_id="a")
    m = run_resumable_extract(spark, full, out, batch_id="b")
    assert m["n_docs"] == 0  # nothing left to do
    sink = SnapshotSink(out)
    assert sink.read(spark).count() == 20


def test_lineage_counters(spark, tmp_path):
    out = str(tmp_path / "sink3")
    raw_rows, expected_rows = make_raw_corpus(30, seed=23, giant_every=0)
    run_resumable_extract(spark, raw_df(spark, raw_rows), out, batch_id="x")
    sink = SnapshotSink(out)
    manifest = sink.committed_batches()[0]
    lineage = spark.read.parquet(manifest["lineage_path"])
    rows = lineage.collect()
    assert sum(r["n_docs"] for r in rows) == manifest["n_docs"]
    assert sum(r["n_spans"] for r in rows) == manifest["n_spans"]
    total_spans = sum(len(e["spans"]) for e in expected_rows)
    assert manifest["n_spans"] == total_spans
    # manifest is valid json on disk
    with open(os.path.join(out, "_manifests", "x.json")) as fh:
        assert json.load(fh)["batch_id"] == "x"


def test_time_travel_read(spark, tmp_path):
    import pytest

    out = str(tmp_path / "tt")
    raw_rows, _ = make_raw_corpus(30, seed=71, giant_every=0)
    full = raw_df(spark, raw_rows)
    half = full.filter(F.col("doc_id") < "doc-71-0000015")
    run_resumable_extract(spark, half, out, batch_id="b1")
    run_resumable_extract(spark, full, out, batch_id="b2")

    sink = SnapshotSink(out)
    hist = sink.history()
    assert [m["batch_id"] for m in hist] == ["b1", "b2"]
    n_b1 = sink.read(spark, as_of="b1").count()
    n_all = sink.read(spark).count()
    assert 0 < n_b1 < n_all
    # as_of the latest batch == current state
    assert sink.read(spark, as_of="b2").count() == n_all
    with pytest.raises(KeyError):
        sink.read(spark, as_of="nope")


def test_snapshot_read_merges_evolved_schema(spark, tmp_path):
    """A later batch may add columns (Iceberg schema-evolution analog):
    the unioned read surfaces the new column, nulls for old batches,
    and the resume anti-join keeps working."""
    import pyspark.sql.functions as F

    from davar_lab_ocr_spark.plans.resume import SnapshotSink

    sink = SnapshotSink(str(tmp_path / "evo"))
    spans = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    d1 = spark.createDataFrame(
        [("a", [("text", "x", "", 0)])], f"doc_id string, spans {spans}"
    )
    sink.write_batch(d1, batch_id="b1")
    d2 = spark.createDataFrame(
        [("b", [("text", "y", "", 0)], "en")],
        f"doc_id string, spans {spans}, lang string",
    )
    sink.write_batch(d2, batch_id="b2")

    got = sink.read(spark)
    assert "lang" in got.columns
    rows = {r["doc_id"]: r for r in got.collect()}
    assert rows["a"]["lang"] is None and rows["b"]["lang"] == "en"
    # time travel to b1 shows the pre-evolution schema
    old = sink.read(spark, as_of="b1")
    assert "lang" not in old.columns
    assert sink.processed_doc_ids(spark).count() == 2


def test_empty_span_lineage_counter(spark, tmp_path):
    # content-free spans (no text, no media ref) are counted into
    # lineage + manifest — the SCALE.md short-payload silent-empty case
    out = str(tmp_path / "sink4")
    rows = [
        ("d1", [("text", "hello", "", 0), ("figure", "", "media://x.png", 1), ("text", "", "", 2)]),
        ("d2", [("text", "", "", 0)]),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    m = SnapshotSink(out).write_batch(df, batch_id="e")
    assert m["n_empty_spans"] == 2
    lineage = spark.read.parquet(m["lineage_path"])
    assert sum(r["n_empty_spans"] for r in lineage.collect()) == 2
