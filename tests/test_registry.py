"""Registry / compose tests — the mmcv-Compose analog."""

import pyspark.sql.functions as F

import davar_lab_ocr_spark.operators.stages  # noqa: F401 (registers)
from davar_lab_ocr_spark.corpus import make_raw_corpus, raw_df
from davar_lab_ocr_spark.operators.registry import STAGES, compose


def test_registry_has_core_stages():
    for name in (
        "FilterDocs", "ExplodeRegions", "ClassifyKind", "TextDecode",
        "LGPMA", "EASTDecode", "XYCutOrder", "TrackMerge", "NERDecode",
    ):
        assert name in STAGES, name


def test_compose_pipeline_config(spark):
    """A config-driven pipeline: filter -> explode -> classify -> decode
    -> order, assembled purely from the registry."""
    raw_rows, expected_rows = make_raw_corpus(15, seed=71, giant_every=0)
    pipeline = compose(
        [
            {"type": "FilterDocs"},
            {"type": "ExplodeRegions"},
            {"type": "ClassifyKind"},
            {"type": "TextDecode"},
        ]
    )
    out = pipeline(raw_df(spark, raw_rows)).filter(
        (F.col("care") == 1) & (F.col("mode") != "table")
    )
    got = {
        (r["doc_id"], r["bbox"][1], r["bbox"][0]): (r["kind"], r["text"])
        for r in out.collect()
    }
    # every oracle text/media span must appear among the decoded rows
    for exp in expected_rows:
        for s in exp["spans"]:
            if s["kind"] in ("figure", "table"):
                continue
            # find by text: every decoded text span must appear in `got`
            assert any(v == (s["kind"], s["text"]) for v in got.values()), s
