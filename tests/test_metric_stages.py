"""Spark-level metric stage tests (TEDS, tree-F1, NER decode, hmean)."""

import pyspark.sql.functions as F
import pytest

from davar_lab_ocr_spark.operators.metrics import (
    avg_teds,
    avg_tree_f1,
    det_hmean,
)
from davar_lab_ocr_spark.operators.ner import bio_decode_py, ner_decode_stage


def test_bio_decode_golden():
    assert bio_decode_py(["B-PER", "I-PER", "O", "B-LOC"]) == [("PER", 0, 2), ("LOC", 3, 4)]
    # I- without matching open entity closes/ignores
    assert bio_decode_py(["I-PER", "O"]) == []
    assert bio_decode_py(["B-PER", "I-LOC"]) == [("PER", 0, 1)]
    assert bio_decode_py(["B-A", "B-A"]) == [("A", 0, 1), ("A", 1, 2)]
    assert bio_decode_py([]) == []


def test_ner_stage(spark):
    rows = [
        ("d0", ["B-PER", "I-PER", "O", "B-ORG", "I-ORG", "I-ORG"]),
        ("d1", ["O", "O"]),
        ("d2", []),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tags array<string>")
    out = {r["doc_id"]: r["entities"] for r in ner_decode_stage(df).collect()}
    assert [(e["etype"], e["start"], e["end"]) for e in out["d0"]] == [
        ("PER", 0, 2),
        ("ORG", 3, 6),
    ]
    assert out["d1"] == [] and out["d2"] == []


def test_teds_stage_avg(spark):
    html = (
        "<html><body><table><thead><tr><td>h1</td><td>h2</td></tr></thead>"
        "<tbody><tr><td>b1</td><td>b2</td></tr></tbody></table></body></html>"
    )
    pert = html.replace("b2", "xy")
    df = spark.createDataFrame(
        [("a", html, html), ("b", pert, html)], "doc_id string, pred_html string, gt_html string"
    )
    got = avg_teds(df).collect()[0]["avg_teds"]
    assert got == pytest.approx((1.0 + (1 - 1 / 8)) / 2, abs=1e-6)


def test_tree_f1_stage(spark):
    edges = [
        {"src": 0, "dst": 1, "rel": 1},
        {"src": 0, "dst": 2, "rel": 2},
        {"src": 1, "dst": 3, "rel": 1},
    ]
    pred_missing = edges[:2]
    rows = [
        ("t0", edges, edges, 4),
        ("t1", edges, pred_missing, 4),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, gt_edges array<struct<src:int,dst:int,rel:int>>, "
        "pred_edges array<struct<src:int,dst:int,rel:int>>, n_cells int",
    )
    hard = avg_tree_f1(df, "hard").collect()[0]
    assert hard["recall"] == pytest.approx(0.5)  # t0 perfect, t1 zero
    soft = avg_tree_f1(df, "soft").collect()[0]
    assert soft["f1"] == pytest.approx((1.0 + 2 / 3) / 2, abs=1e-6)


def test_det_hmean_constructed_golden(spark):
    """Hand-built corpus with known P/R/H (the evaluation readme
    golden-number pattern): 3 gt, 2 preds of which 2 match, 1 false
    positive, 1 dontcare-overlapping pred excluded."""
    from davar_lab_ocr_spark.schemas import EVAL_PAIRS

    def rect(x0, y0, x1, y1):
        return [float(x0), float(y0), float(x1), float(y1), float(x1), float(y1), float(x0), float(y1)]

    def rpoly(x0, y0, x1, y1):
        return [float(x0), float(y0), float(x1), float(y0), float(x1), float(y1), float(x0), float(y1)]

    rows = [
        {
            "doc_id": "g",
            "gt": [
                {"poly": rpoly(0, 0, 100, 40), "care": 1, "text": "a"},
                {"poly": rpoly(0, 100, 100, 140), "care": 1, "text": "b"},
                {"poly": rpoly(0, 200, 100, 240), "care": 1, "text": "c"},
                {"poly": rpoly(300, 300, 400, 340), "care": 0, "text": "###"},
            ],
            "pred": [
                {"poly": rpoly(2, 2, 98, 38), "conf": 0.9, "text": "a"},     # match gt0
                {"poly": rpoly(0, 102, 100, 138), "conf": 0.8, "text": "b"}, # match gt1
                {"poly": rpoly(500, 500, 560, 520), "conf": 0.7, "text": "x"},  # FP
                {"poly": rpoly(305, 305, 395, 335), "conf": 0.6, "text": "y"},  # inside dontcare
            ],
        }
    ]
    out = det_hmean(spark.createDataFrame(rows, schema=EVAL_PAIRS)).collect()[0]
    # care_gt=3, care_det=3 (dontcare-overlap excluded), matched=2
    assert out["recall"] == pytest.approx(2 / 3, abs=1e-6)
    assert out["precision"] == pytest.approx(2 / 3, abs=1e-6)
    assert out["hmean"] == pytest.approx(2 / 3, abs=1e-6)
