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


def test_ranked_detections_matches_global_sort(spark):
    # two-phase bucketed cumsum must equal the single-sort definition
    import numpy as np

    from davar_lab_ocr_spark.operators.metrics import ranked_detections

    rng = np.random.default_rng(71)
    rows = [
        (int(i), float(rng.integers(0, 20)) / 20.0, int(rng.random() < 0.4))
        for i in range(500)  # heavy conf ties to stress bucket boundaries
    ]
    df = spark.createDataFrame(rows, "event_id int, conf double, matched int")
    got = {
        r["rank"]: (r["m"], r["cum_correct"])
        for r in ranked_detections(df, id_col="event_id", n_buckets=8).collect()
    }
    want_order = sorted(rows, key=lambda t: (-t[1], t[0]))
    cum = 0
    for rank, (eid, conf, m) in enumerate(want_order, start=1):
        cum += m
        assert got[rank] == (m, cum), f"rank {rank}"


def test_eval_map_per_class_and_mean(spark):
    from davar_lab_ocr_spark.operators.metrics import eval_map

    # class A: matches at ranks 1,3 -> AP = (1/1 + 2/3)/2 = 0.833333
    # class B: match at rank 2 -> AP = (1/2)/1 = 0.5
    rows = [
        ("A", 0.9, 1, 0), ("A", 0.8, 0, 1), ("A", 0.7, 1, 2),
        ("B", 0.9, 0, 3), ("B", 0.8, 1, 4),
    ]
    df = spark.createDataFrame(rows, "cls string, conf double, matched int, did int")
    gt = spark.createDataFrame([("A", 2), ("B", 1)], "cls string, n_gt int")
    got = {r["cls"]: r["ap"] for r in eval_map(df, id_col="did", gt_counts=gt).collect()}
    assert got["A"] == 0.833333
    assert got["B"] == 0.5
    assert got["__mean__"] == round((0.833333 + 0.5) / 2, 6)

    # unmatched ground truth must deflate AP (gt says 4 for A, only 2 matched)
    gt2 = spark.createDataFrame([("A", 4), ("B", 1)], "cls string, n_gt int")
    got2 = {r["cls"]: r["ap"] for r in eval_map(df, id_col="did", gt_counts=gt2).collect()}
    assert got2["A"] == round((1 / 1 + 2 / 3) / 4, 6)

    # gt_counts is required: the matched-flag default silently overstated AP
    with pytest.raises(ValueError, match="gt_counts"):
        eval_map(df, id_col="did")


def test_eval_recalls_budgets(spark):
    from davar_lab_ocr_spark.operators.metrics import eval_recalls

    # img 0: matches at ranks 1 and 3; img 1: match at rank 2 -> 3 gt total
    rows = [
        (0, 0.9, 1, 0), (0, 0.8, 0, 1), (0, 0.7, 1, 2),
        (1, 0.9, 0, 3), (1, 0.8, 1, 4),
    ]
    df = spark.createDataFrame(rows, "img_id int, conf double, matched int, did int")
    got = {r["budget"]: r["recall"] for r in eval_recalls(df, [1, 2, 3], id_col="did").collect()}
    assert got[1] == round(1 / 3, 6)
    assert got[2] == round(2 / 3, 6)
    assert got[3] == 1.0

    # explicit n_gt (annotations say 4; one gt was never proposed):
    # recall is measured against the true total, as an int or a 1-row frame
    got4 = {r["budget"]: r["recall"] for r in
            eval_recalls(df, [3], id_col="did", n_gt=4).collect()}
    assert got4[3] == 0.75
    gtdf = spark.createDataFrame([(4,)], "n_gt int")
    got4b = {r["budget"]: r["recall"] for r in
             eval_recalls(df, [3], id_col="did", n_gt=gtdf).collect()}
    assert got4b[3] == 0.75

    # r6 folded variant: gt flag column summed inside the same
    # aggregation pass (4 flagged rows -> identical denominator), and a
    # single-job plan (no second scan / broadcast of the scalar)
    rows_f = [r + (1,) for r in rows[:4]] + [rows[4] + (0,)]
    dff = spark.createDataFrame(
        rows_f, "img_id int, conf double, matched int, did int, gt int"
    )
    got4c = {r["budget"]: r["recall"] for r in
             eval_recalls(dff, [3], id_col="did", n_gt="gt").collect()}
    assert got4c[3] == 0.75


def test_viterbi_matches_brute_force():
    import itertools

    import numpy as np

    from davar_lab_ocr_spark.operators.ner import viterbi_decode_py

    rng = np.random.default_rng(97)
    for trial in range(20):
        k, t = 3, int(rng.integers(1, 6))
        em = rng.normal(size=(t, k))
        tr = rng.normal(size=(k, k))
        st = rng.normal(size=k)
        en = rng.normal(size=k)

        def score(path):
            s = st[path[0]] + em[0, path[0]] + en[path[-1]]
            for i in range(1, t):
                s += tr[path[i - 1], path[i]] + em[i, path[i]]
            return s

        want = max(itertools.product(range(k), repeat=t), key=score)
        got = tuple(viterbi_decode_py(em, tr, st, en))
        assert score(got) == score(want), f"trial {trial}"


def test_crf_viterbi_stage_chains_into_bio(spark):
    import numpy as np

    from davar_lab_ocr_spark.operators.ner import crf_viterbi_stage, ner_decode_stage

    vocab = ["O", "B-PER", "I-PER"]
    # transitions forbid O -> I-PER and B -> B, reward B -> I
    tr = np.array([[0.0, 0.0, -9.0], [-1.0, -9.0, 2.0], [0.0, 0.0, 0.0]])
    st = np.array([0.0, 0.0, -9.0])
    en = np.zeros(3)
    # emissions ambiguous at step 1: I-PER only reachable via B-PER
    em = [[0.0, 3.0, 0.0], [0.0, 0.0, 1.0], [2.0, 0.0, 0.0]]
    df = spark.createDataFrame(
        [("d0", em)], "doc_id string, emissions array<array<double>>"
    )
    out = crf_viterbi_stage(df, tr, st, en, vocab)
    decoded = ner_decode_stage(out)
    row = decoded.collect()[0]
    assert row["tags"] == ["B-PER", "I-PER", "O"]
    assert [(e["etype"], e["start"], e["end"]) for e in row["entities"]] == [("PER", 0, 2)]


def test_det_hmean_tiou_partial_overlap(spark):
    """Hand-computed TIoU golden (tightness < 1): det covers 80% of the
    single gt. I=80, U=100, Ct=20 -> fCt=0.8 -> tiou_recall=0.64;
    no other gt -> Ot=0 -> tiou_precision = I/U = 0.8."""
    from davar_lab_ocr_spark.schemas import EVAL_PAIRS

    def rpoly(x0, y0, x1, y1):
        return [float(x0), float(y0), float(x1), float(y0),
                float(x1), float(y1), float(x0), float(y1)]

    rows = [{
        "doc_id": "t",
        "gt": [{"poly": rpoly(0, 0, 10, 10), "care": 1, "text": "a"}],
        "pred": [{"poly": rpoly(0, 0, 8, 10), "conf": 0.9, "text": "a"}],
    }]
    out = det_hmean(spark.createDataFrame(rows, schema=EVAL_PAIRS)).collect()[0]
    assert out["precision"] == pytest.approx(1.0)
    assert out["recall"] == pytest.approx(1.0)
    assert out["tiou_recall"] == pytest.approx(0.64, abs=1e-6)
    assert out["tiou_precision"] == pytest.approx(0.8, abs=1e-6)
    h = 2 * 0.64 * 0.8 / (0.64 + 0.8)
    assert out["tiou_hmean"] == pytest.approx(round(h, 6), abs=1e-6)


def test_det_hmean_tiou_outlier_gt(spark):
    """TIoU precision penalty from a neighboring unmatched gt: det
    (area 120) matches gt1 exactly (I=100, U=120) but also covers 10
    units of gt2 -> Ot=10, fOt=1-10/120; tiou_dt = 100*(110/120)/120."""
    from davar_lab_ocr_spark.schemas import EVAL_PAIRS

    def rpoly(x0, y0, x1, y1):
        return [float(x0), float(y0), float(x1), float(y0),
                float(x1), float(y1), float(x0), float(y1)]

    rows = [{
        "doc_id": "t2",
        "gt": [
            {"poly": rpoly(0, 0, 10, 10), "care": 1, "text": "a"},
            {"poly": rpoly(11, 0, 15, 10), "care": 1, "text": "b"},
        ],
        "pred": [{"poly": rpoly(0, 0, 12, 10), "conf": 0.9, "text": "a"}],
    }]
    out = det_hmean(spark.createDataFrame(rows, schema=EVAL_PAIRS)).collect()[0]
    assert out["precision"] == pytest.approx(1.0)
    assert out["recall"] == pytest.approx(0.5)
    # recall term: Ct=0 -> fCt=1 -> 100/120; divided by care_gt=2
    assert out["tiou_recall"] == pytest.approx(round(100 / 120 / 2, 6), abs=1e-6)
    expected_dt = 100 * (1 - 10 / 120) / 120
    assert out["tiou_precision"] == pytest.approx(round(expected_dt, 6), abs=1e-6)


def test_tiou_outlier_area_nets_out_matched_gt_overlap(spark):
    """The Ot term subtracts outlier overlap already inside the matched
    gt: gt2 overlaps det ONLY inside gt1 -> Ot = 0 -> no penalty."""
    from davar_lab_ocr_spark.schemas import EVAL_PAIRS

    def rpoly(x0, y0, x1, y1):
        return [float(x0), float(y0), float(x1), float(y0),
                float(x1), float(y1), float(x0), float(y1)]

    rows = [{
        "doc_id": "t3",
        "gt": [
            {"poly": rpoly(0, 0, 10, 10), "care": 1, "text": "a"},
            # nested inside gt1; its det-overlap is entirely inside gt1
            {"poly": rpoly(2, 2, 4, 4), "care": 1, "text": "b"},
        ],
        "pred": [{"poly": rpoly(0, 0, 10, 10), "conf": 0.9, "text": "a"}],
    }]
    out = det_hmean(spark.createDataFrame(rows, schema=EVAL_PAIRS)).collect()[0]
    # perfect match of gt1, Ot nets to zero -> tiou_dt term = I/U = 1.0
    assert out["tiou_precision"] == pytest.approx(1.0, abs=1e-6)


def test_det_eval_full_with_ap_golden(spark):
    """Full reference summary incl. the CONFIDENCES AP sweep: matches
    at ranks 1 and 3 (FP at rank 2), 2 care gt ->
    AP = (1/1 + 2/3)/2 = 0.833333; P=2/3, R=1."""
    from davar_lab_ocr_spark.operators.metrics import det_eval_full
    from davar_lab_ocr_spark.schemas import EVAL_PAIRS

    def rpoly(x0, y0, x1, y1):
        return [float(x0), float(y0), float(x1), float(y0),
                float(x1), float(y1), float(x0), float(y1)]

    rows = [{
        "doc_id": "ap",
        "gt": [
            {"poly": rpoly(0, 0, 100, 40), "care": 1, "text": "a"},
            {"poly": rpoly(0, 100, 100, 140), "care": 1, "text": "b"},
        ],
        "pred": [
            {"poly": rpoly(0, 0, 100, 40), "conf": 0.9, "text": "a"},
            {"poly": rpoly(500, 500, 560, 520), "conf": 0.8, "text": "x"},
            {"poly": rpoly(0, 100, 100, 140), "conf": 0.7, "text": "b"},
        ],
    }]
    out = det_eval_full(spark.createDataFrame(rows, schema=EVAL_PAIRS)).collect()[0]
    assert out["precision"] == pytest.approx(round(2 / 3, 6))
    assert out["recall"] == pytest.approx(1.0)
    assert out["ave_precision"] == pytest.approx(round((1 + 2 / 3) / 2, 6))
    # exact matches -> tiou == standard
    assert out["tiou_recall"] == pytest.approx(1.0)
