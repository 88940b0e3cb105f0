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
