"""Golden parity vs the reference's OWN shipped evaluation data: the
Total-Text gt/pred zips through read_eval_archive -> det_hmean must
reproduce the published numbers
(demo/text_detection/evaluation/readme.md):

    num_gt, num_det: 2214 2366
    recall: 0.8234  precision: 0.8632  hmean: 0.8428

This is the strongest non-synthetic parity statement available in the
sandbox: it exercises the archive scan, the variable-point (curved /
concave / occasionally self-intersecting) polygon geometry, the
don't-care rules, the greedy matcher, and the corpus accumulation on
2214 real ground-truth and 2366 real predicted polygons at once.
"""

import os

import pytest

GT_ZIP = "/root/reference/demo/text_detection/evaluation/gt/total-text-gt.zip"
PRED_ZIP = (
    "/root/reference/demo/text_detection/evaluation/pred/"
    "pred_tp_det_r50_tt_e25-45b1f5cf.zip"
)


@pytest.mark.skipif(not os.path.exists(GT_ZIP), reason="reference checkout absent")
def test_total_text_golden_matches_published_numbers(spark):
    import pyspark.sql.functions as F

    from davar_lab_ocr_spark.operators.metrics import det_hmean, det_match_stage
    from davar_lab_ocr_spark.sources.datalist import (
        eval_archive_pairs,
        read_eval_archive,
    )

    pairs = eval_archive_pairs(spark, GT_ZIP, PRED_ZIP)
    counts = (
        det_match_stage(pairs)
        .agg(
            F.sum("matched").alias("m"),
            F.sum("care_det").alias("d"),
            F.sum("care_gt").alias("g"),
        )
        .collect()[0]
    )
    assert counts["g"] == 2214  # printed num_gt (care gt)
    assert counts["m"] == 1823
    assert counts["d"] == 2112
    # printed num_det is the TOTAL det poly count (incl. dontcare-matched)
    assert read_eval_archive(spark, PRED_ZIP, has_conf=False).count() == 2366

    row = det_hmean(pairs).collect()[0]
    assert round(row["recall"], 4) == 0.8234
    assert round(row["precision"], 4) == 0.8632
    assert round(row["hmean"], 4) == 0.8428


CTW_GT = "/root/reference/demo/text_detection/evaluation/gt/gt_ctw1500_det.zip"
CTW_GT_IGNORE = (
    "/root/reference/demo/text_detection/evaluation/gt/gt_ctw1500_det_with_ignore.zip"
)
CTW_PRED = (
    "/root/reference/demo/text_detection/evaluation/pred/"
    "pred_tp_det_r50_ctw-c1bf44e7.zip"
)


@pytest.mark.skipif(not os.path.exists(CTW_GT), reason="reference checkout absent")
def test_ctw1500_golden_matches_published_numbers(spark):
    """Second published-numbers golden, on the reference's CTW1500 zips.
    The shipped pred zip is the ResNet-50-3stages-enlarge model
    (text_perceptron_det/readme.md rows: P/R/H 86.2/79.9/82.9 without
    ignores; 85.9/83.6/84.7 with the '###' not-care annotations —
    identified empirically: the engine reproduces exactly these rows).
    The with-ignore run additionally exercises the don't-care
    suppression path on 387 real ignore polygons (14-point curved
    outlines)."""
    from davar_lab_ocr_spark.operators.metrics import det_hmean
    from davar_lab_ocr_spark.sources.datalist import eval_archive_pairs

    def pct(x):
        return round(100 * x, 1)

    row = det_hmean(eval_archive_pairs(spark, CTW_GT, CTW_PRED)).collect()[0]
    assert (pct(row["precision"]), pct(row["recall"]), pct(row["hmean"])) == (
        86.2, 79.9, 82.9,
    )

    row2 = det_hmean(eval_archive_pairs(spark, CTW_GT_IGNORE, CTW_PRED)).collect()[0]
    assert (pct(row2["precision"]), pct(row2["recall"]), pct(row2["hmean"])) == (
        85.9, 83.6, 84.7,
    )


SPOT_GT = "/root/reference/demo/text_spotting/evaluation/gts/gt-icdar2013.zip"
SPOT_PRED = (
    "/root/reference/demo/text_spotting/evaluation/preds/mango_r50_ic13_none.zip"
)
# the spotting demo harness's special-character set — the davarocr
# e2e_hmean set PLUS a trailing space (text_spotting/evaluation/
# script.py default_evaluation_params SPECIAL_CHARACTERS)
SPOT_SPECIALS = "!?.:,*\"()·[]/' "


@pytest.mark.skipif(not os.path.exists(SPOT_GT), reason="reference checkout absent")
def test_mango_ic13_spotting_golden(spark):
    """Third published-numbers golden: the shipped MANGO IC13 end-to-end
    predictions through the e2e spotting matcher at the documented
    MANGO setting (-iou=0.1, word_spotting=false) must reproduce the
    readme numbers (text_spotting/evaluation/readme.md):
        num_gt, num_det: 917 1038
        det  R .9269  P .9626  H .9444
        spot R .795   P .8256  H .81
    Pins detection matching AND the transcription-tolerance rules on
    917 real ground-truth words."""
    import pyspark.sql.functions as F

    from davar_lab_ocr_spark.operators.metrics import e2e_hmean, e2e_match_stage
    from davar_lab_ocr_spark.sources.datalist import (
        eval_archive_pairs,
        read_eval_archive,
    )

    pairs = eval_archive_pairs(spark, SPOT_GT, SPOT_PRED, gt_id_strip="^gt_")
    counts = (
        e2e_match_stage(
            pairs, iou_thr=0.1, area_prec_thr=0.1, special_characters=SPOT_SPECIALS
        )
        .agg(F.sum("care_gt").alias("g"))
        .collect()[0]
    )
    assert counts["g"] == 917
    assert read_eval_archive(spark, SPOT_PRED, has_conf=False).count() == 1038

    row = e2e_hmean(
        pairs, iou_thr=0.1, area_prec_thr=0.1, special_characters=SPOT_SPECIALS
    ).collect()[0]
    assert round(row["det_recall"], 4) == 0.9269
    assert round(row["det_precision"], 4) == 0.9626
    assert round(row["det_hmean"], 4) == 0.9444
    assert round(row["spot_recall"], 4) == 0.795
    assert round(row["spot_precision"], 4) == 0.8256
    assert round(row["spot_hmean"], 4) == 0.81


CONLL = "/root/reference/demo/ner/data/CoNLL2003/Datalist/test.json"


@pytest.mark.skipif(not os.path.exists(CONLL), reason="reference checkout absent")
def test_conll2003_ner_decode_golden(spark):
    """Fourth published-numbers golden: the reference's shipped
    CoNLL-2003 TEST datalist (IOBES gold tags) through the real
    nlp-datalist scan + the distributed NER decode stage must produce
    the PUBLIC CoNLL-2003 testb statistics exactly: 3453 sentences,
    46,435 tokens, and per-type entity counts LOC 1668 / ORG 1661 /
    PER 1617 / MISC 702 (total 5648) — numbers published with the
    original shared task, independent of this repo and of the
    reference."""
    import pyspark.sql.functions as F

    from davar_lab_ocr_spark.operators.ner import ner_decode_stage
    from davar_lab_ocr_spark.sources.datalist import read_nlp_datalist

    df = read_nlp_datalist(spark, CONLL)
    assert df.count() == 3453
    assert df.agg(F.sum(F.size("tokens"))).collect()[0][0] == 46435

    ents = (
        ner_decode_stage(df)
        .select(F.explode("entities").alias("e"))
        .groupBy("e.etype")
        .count()
    )
    got = {r["etype"]: r["count"] for r in ents.collect()}
    assert got == {"LOC": 1668, "ORG": 1661, "PER": 1617, "MISC": 702}


DICT_DIR = "/root/reference/demo/text_recognition/__dictionary__"


@pytest.mark.skipif(not os.path.exists(DICT_DIR), reason="reference checkout absent")
def test_charsets_match_shipped_dictionaries():
    """Byte parity between our charset constants and the reference's
    shipped recognition dictionary files."""
    from davar_lab_ocr_spark.functions.text import (
        CHARS36,
        CHARS62,
        CHARS68,
        load_dictionary,
    )

    assert load_dictionary(f"{DICT_DIR}/Scene_text_36.txt") == list(CHARS36)
    assert load_dictionary(f"{DICT_DIR}/Scene_text_62.txt") == list(CHARS62)
    assert load_dictionary(f"{DICT_DIR}/Scene_text_68.txt") == list(CHARS68)


WILDRECEIPT = "/root/reference/demo/text_ie/datalist/wildreceipt/datalist_test.json"


@pytest.mark.skipif(not os.path.exists(WILDRECEIPT), reason="reference checkout absent")
def test_wildreceipt_datalist_scan_golden(spark):
    """The reference's shipped wildreceipt TEST datalist through the
    real datalist scan: 472 documents (the published wildreceipt test
    split) of 8-point quads with labels inside the 26-class closed set
    (class_list.txt)."""
    import pyspark.sql.functions as F

    from davar_lab_ocr_spark.sources.datalist import read_davar_datalist

    df = read_davar_datalist(spark, WILDRECEIPT)
    assert df.count() == 472
    regions = df.select(F.explode("regions").alias("r"))
    n_regions = regions.count()
    assert n_regions > 10000  # dense OCR-line annotation
    assert regions.filter(F.size("r.bbox") != 8).count() == 0
    labels = {
        int(r["l"])
        for r in regions.select(F.explode("r.label").alias("l")).distinct().collect()
    }
    assert labels <= set(range(26))


COMFINTAB = (
    "/root/reference/demo/table_understanding/datalist/ComFinTab_examples.json"
)


@pytest.mark.skipif(not os.path.exists(COMFINTAB), reason="reference checkout absent")
def test_comfintab_relations_scan_and_tree_f1(spark):
    """The reference's shipped ComFinTab (CTUNet) examples through the
    real datalist scan (with the r4 `relation` adjacency rows): every
    relations matrix is square, decodes into at least one key-value
    tree, and gold-vs-gold tree-F1 is exactly 1.0 under both hard and
    soft matching for all 20 tables — the kernel exercised on real
    relation structures instead of synthetic fixtures."""
    from davar_lab_ocr_spark.functions.trees import adjacency_to_trees, tree_f1
    from davar_lab_ocr_spark.sources.datalist import read_davar_datalist

    rows = read_davar_datalist(spark, COMFINTAB).collect()
    assert len(rows) == 20
    for row in rows:
        adj = [list(r["relation"]) for r in row["regions"]]
        n = len(adj)
        assert n > 0 and all(len(r) == n for r in adj)
        assert len(adjacency_to_trees(adj)) >= 1
        assert tree_f1(adj, adj, "hard") == (1.0, 1.0, 1.0)
        assert tree_f1(adj, adj, "soft") == (1.0, 1.0, 1.0)


PUBLAYNET_DL = (
    "/root/reference/demo/text_layout/datalist/PubLayNet/Datalist/"
    "datalist_val_sample.json"
)
PUBLAYNET_ANNOS = "/root/reference/demo/text_layout/datalist/PubLayNet/Annos/dev"


@pytest.mark.skipif(not os.path.exists(PUBLAYNET_DL), reason="reference checkout absent")
def test_publaynet_two_level_layout_scan(spark):
    """The VSR two-level layout scan on the reference's shipped
    PubLayNet sample: top datalist rows carry only (width, height,
    url); the per-doc annotation JSONs join in by url and carry BOTH
    token-level regions (content_ann) and layout-level category
    regions with polygon segboxes (content_ann2) — the
    mm_layout_loading.py data shape on real files."""
    import pyspark.sql.functions as F

    from davar_lab_ocr_spark.sources.datalist import (
        join_two_level,
        read_davar_datalist,
        read_layout_annos,
    )

    top = read_davar_datalist(spark, PUBLAYNET_DL)
    assert top.count() == 2
    assert top.filter(F.col("url").isNull()).count() == 0
    assert top.filter(F.size("regions") > 0).count() == 0  # first level: no anns

    annos = read_layout_annos(spark, PUBLAYNET_ANNOS)
    joined = join_two_level(top.drop("width", "height", "regions"), annos, "url")
    rows = joined.collect()
    assert len(rows) == 2
    for row in rows:
        assert len(row["regions"]) > 30  # token-level OCR lines
        assert len(row["layout"]) > 5  # layout category regions
        for lay in row["layout"]:
            assert lay["segboxes"] and all(len(p) >= 6 for p in lay["segboxes"])
            assert lay["label"] is not None


RESUME = "/root/reference/demo/ner/data/RESUME/Datalist/test.json"


@pytest.mark.skipif(not os.path.exists(RESUME), reason="reference checkout absent")
def test_resume_ner_decode_golden(spark):
    """Chinese RESUME NER test datalist (IOBES): 477 sentences and
    1,630 gold entities — the published test-split statistics of the
    RESUME dataset (Zhang & Yang, ACL 2018), decoded by the same
    distributed stage."""
    import pyspark.sql.functions as F

    from davar_lab_ocr_spark.operators.ner import ner_decode_stage
    from davar_lab_ocr_spark.sources.datalist import read_nlp_datalist

    df = read_nlp_datalist(spark, RESUME)
    assert df.count() == 477
    total = (
        ner_decode_stage(df)
        .agg(F.sum(F.size("entities")).alias("n"))
        .collect()[0]["n"]
    )
    assert total == 1630
