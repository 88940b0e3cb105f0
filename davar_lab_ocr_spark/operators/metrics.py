"""Corpus evaluation metrics as DataFrame aggregations.

Every metric decomposes into a per-doc kernel (applyInPandas /
mapInPandas when geometric) followed by built-in global aggs — the
partial+final structure the reference hand-rolls with multi_gpu_test
sharding (davarocr/davar_common/apis/test.py:121-180) comes free.

- det_hmean: IoU>0.5 greedy bipartite match per doc with don't-care
  exclusion (area-precision>0.5), then corpus P/R/Hmean.
  Reference: davarocr/davar_det/core/evaluation/hmean.py:15-349.
- compute_ap: confidence-sorted cumulative precision sum / n_gt.
  Reference: hmean.py compute_ap.
- recognition_accuracy: exact-match rate + normalized edit distance.
  Reference: davar_rcg_dataset.py:490-595.
- total_order_acc: exact span-sequence equality rate.
  Reference: di_order_dataset.py:38-75.
- macro_f1: per-class F1 averaged (wildreceipt/ctunet style).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from ..functions.geometry import (
    convex_poly_clip,
    convex_poly_intersection_area,
    disjoint_group_union_area,
    even_odd_pieces,
    is_convex_poly,
    poly_area,
    poly_iou,
)


# --- prepared polygons: concave-capable pairwise geometry ----------------
# Curved-text annotations (Total-Text / CTW1500) are CONCAVE outlines
# (occasionally even self-intersecting in model predictions); the
# reference evaluates them with a general polygon-boolean library
# (script.py get_intersection via Polygon/GPC). Here each polygon is
# "prepared" once per doc into convex pieces (itself when convex, its
# even-odd scanline decomposition otherwise); every pairwise
# intersection is then a sum of convex Sutherland-Hodgman clips —
# pieces of one polygon have pairwise-disjoint interiors, so areas add
# exactly. Semantics pinned by the Total-Text golden run
# (tests/test_ref_golden_eval.py): area = |signed shoelace| of the raw
# contour, intersections = even-odd fill — this exact combination
# reproduces the reference readme's published R/P/H to 1e-4.
def _prep_poly(pts: np.ndarray):
    """-> (pts, convex_pieces, area, bbox)."""
    pieces = [pts] if is_convex_poly(pts) else even_odd_pieces(pts)
    if len(pts):
        bbox = (pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
    else:
        bbox = (0.0, 0.0, 0.0, 0.0)
    return pts, pieces, poly_area(pts), bbox


def _prep_inter_pieces(pa, pb) -> list[np.ndarray]:
    # bbox reject first: in an n_gt x n_det matcher matrix most pairs
    # are disjoint, and the piece-pair clip loop is the hot path
    ba, bb = pa[3], pb[3]
    if ba[0] >= bb[2] or bb[0] >= ba[2] or ba[1] >= bb[3] or bb[1] >= ba[3]:
        return []
    out = []
    for ta in pa[1]:
        for tb in pb[1]:
            c = convex_poly_clip(ta, tb)
            if len(c) >= 3 and poly_area(c) > 0:
                out.append(c)
    return out


def _prep_inter_area(pa, pb) -> float:
    return float(sum(poly_area(c) for c in _prep_inter_pieces(pa, pb)))


def _prep_iou(pa, pb) -> float:
    inter = _prep_inter_area(pa, pb)
    union = pa[2] + pb[2] - inter
    return inter / union if union > 0 else 0.0

_MATCH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("matched", T.IntegerType()),
        T.StructField("care_det", T.IntegerType()),
        T.StructField("care_gt", T.IntegerType()),
        T.StructField("matched_tiou_gt", T.DoubleType()),
        T.StructField("matched_tiou_dt", T.DoubleType()),
    ]
)


def _tiou_recall_term(inter: float, union: float, area_g: float) -> float:
    """Tightness-aware recall contribution of one matched (det, gt) pair
    (hmean.py:96-117 funcCt/get_text_intersection_over_union_recall):
    the IoU scaled by 1 - Ct/area(gt), where Ct is the gt area the
    detection failed to cover (forgiven below 1%)."""
    if area_g <= 0 or union <= 0:
        return 0.0
    ct = area_g - inter
    f_ct = 1.0 if ct / area_g <= 0.01 else 1.0 - ct / area_g
    return inter * f_ct / union


def _tiou_precision_term(
    det_prep,
    gt_prep,
    gt_idx: int,
    gt_preps: list,
    inter: float,
    union: float,
) -> float:
    """Tightness-aware precision contribution (hmean.py:119-165
    funcOt/get_text_intersection_over_union_precision): IoU scaled by
    1 - Ot/area(det), where Ot is the detection area overlapping OTHER
    ground-truth boxes (outlier area) net of the part already inside the
    matched gt. The reference's Polygon-library unions become
    inclusion-exclusion over GROUPS of convex clips
    (disjoint_group_union_area) — one group per other-gt polygon, the
    pieces within a group disjoint by construction (even-odd
    decomposition x piece-pair clipping) — so the _UNION_EXACT_MAX
    recursion cap counts source polygons, not clip pieces, and curved
    many-point outlines stay on the exact path (r4 ADVICE).

    Quirk preserved: the reference's "other gt" loop does NOT skip
    don't-care polygons (only `i != gtNum`, hmean.py:140) — dontcare
    boxes still contribute outlier area."""
    area_d = det_prep[2]
    if area_d <= 0 or union <= 0:
        return 0.0
    in_det = []  # one group per other gt: det n other_gt pieces
    in_det_and_gt = []  # one group per other gt: det n matched_gt n other_gt
    for i, other in enumerate(gt_preps):
        if i == gt_idx:
            continue
        clips = _prep_inter_pieces(det_prep, other)
        if not clips:
            continue
        in_det.append(clips)
        grp = []
        for clip in clips:
            for gp in gt_prep[1]:
                both = convex_poly_clip(clip, gp)
                if poly_area(both) > 0:
                    grp.append(both)
        if grp:
            in_det_and_gt.append(grp)
    ot = disjoint_group_union_area(in_det) - disjoint_group_union_area(in_det_and_gt)
    if ot <= 1.0e-10:
        ot = 0.0
    f_ot = 1.0 if ot / area_d <= 0.01 else 1.0 - ot / area_d
    return inter * f_ot / union


def _greedy_match(pred, gt, iou_thr=0.5, area_prec_thr=0.5):
    """The hmean.py greedy 1-1 matcher (coordinates int-truncated as the
    reference does): returns (pairs [(gt_i, det_j)], dontcare_gt list,
    dontcare_det list, gt_preps, det_preps — prepared polygons
    (pts, convex_pieces, area), concave-capable). Shared by the count
    aggregation, the TIoU accumulation, and the per-detection AP rows."""
    gt_preps = [
        _prep_poly(np.asarray(g["poly"], dtype=np.float64).astype(np.int64).reshape(-1, 2).astype(np.float64))
        for g in gt
    ]
    det_preps = [
        _prep_poly(np.asarray(d["poly"], dtype=np.float64).astype(np.int64).reshape(-1, 2).astype(np.float64))
        for d in pred
    ]
    dontcare_gt = [i for i, g in enumerate(gt) if (g["care"] == 0) or (g["text"] == "###")]

    dontcare_det = []
    for j, dp in enumerate(det_preps):
        d_area = dp[2]
        for i in dontcare_gt:
            inter = _prep_inter_area(dp, gt_preps[i])
            prec = 0.0 if d_area == 0 else inter / d_area
            if prec > area_prec_thr:
                dontcare_det.append(j)
                break

    gt_used = np.zeros(len(gt_preps), dtype=bool)
    det_used = np.zeros(len(det_preps), dtype=bool)
    pairs = []
    for i in range(len(gt_preps)):
        for j in range(len(det_preps)):
            if (
                not gt_used[i]
                and not det_used[j]
                and i not in dontcare_gt
                and j not in dontcare_det
                and _prep_iou(gt_preps[i], det_preps[j]) > iou_thr
            ):
                gt_used[i] = True
                det_used[j] = True
                pairs.append((i, j))
    return pairs, dontcare_gt, dontcare_det, gt_preps, det_preps


def _match_one_doc(doc_id: str, pred, gt, iou_thr=0.5, area_prec_thr=0.5):
    """Per-doc match counts + TIoU term sums (hmean.py:283-285
    detMatched_tiouGt/Dt accumulation)."""
    pairs, dontcare_gt, dontcare_det, gt_preps, det_preps = _greedy_match(
        pred, gt, iou_thr, area_prec_thr
    )
    tiou_gt = tiou_dt = 0.0
    for i, j in pairs:
        inter = _prep_inter_area(det_preps[j], gt_preps[i])
        union = det_preps[j][2] + gt_preps[i][2] - inter
        tiou_gt += _tiou_recall_term(inter, union, gt_preps[i][2])
        tiou_dt += _tiou_precision_term(det_preps[j], gt_preps[i], i, gt_preps, inter, union)
    return {
        "doc_id": doc_id,
        "matched": len(pairs),
        "care_det": len(det_preps) - len(dontcare_det),
        "care_gt": len(gt_preps) - len(dontcare_gt),
        "matched_tiou_gt": tiou_gt,
        "matched_tiou_dt": tiou_dt,
    }


def det_match_stage(pairs: DataFrame, iou_thr: float = 0.5, area_prec_thr: float = 0.5) -> DataFrame:
    """eval_pairs rows (doc_id, pred[], gt[]) -> per-doc match counts."""

    def run(batches):
        for pdf in batches:
            rows = [
                _match_one_doc(d, p, g, iou_thr, area_prec_thr)
                for d, p, g in zip(pdf["doc_id"], pdf["pred"], pdf["gt"])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "matched", "care_det", "care_gt",
                    "matched_tiou_gt", "matched_tiou_dt",
                ],
            )

    return pairs.mapInPandas(run, schema=_MATCH_SCHEMA)


_E2E_MATCH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("matched_det", T.IntegerType()),
        T.StructField("matched_spot", T.IntegerType()),
        T.StructField("care_det", T.IntegerType()),
        T.StructField("care_gt", T.IntegerType()),
    ]
)


def _e2e_match_one_doc(
    doc_id: str,
    pred,
    gt,
    iou_thr=0.5,
    area_prec_thr=0.5,
    word_spotting=False,
    only_remove_first_last=True,
    special_characters=None,
):
    """Greedy 1-1 match (gt, det index order) counting BOTH detection
    matches and transcription-correct matches — the end-to-end spotting
    evaluation (e2e_hmean.py:236-341). Word-spotting mode demotes
    dictionary-ineligible GT words to don't-care and normalizes the GT
    transcription before comparison; otherwise the IC15 first/last
    special-character tolerance applies."""
    from ..functions.text import (
        E2E_SPECIAL_CHARACTERS,
        dictionary_transcription,
        include_in_dictionary,
        transcription_match,
    )

    if special_characters is None:
        special_characters = E2E_SPECIAL_CHARACTERS

    gt_polys = [np.asarray(g["poly"], dtype=np.float64).astype(np.int64).reshape(-1, 2) for g in gt]
    det_polys = [
        np.asarray(d["poly"], dtype=np.float64).astype(np.int64).reshape(-1, 2) for d in pred
    ]
    gt_texts = [g["text"] or "" for g in gt]
    det_texts = [d["text"] or "" for d in pred]

    dontcare_gt = set()
    for i, g in enumerate(gt):
        dc = (g["care"] == 0) or (gt_texts[i] == "###")
        if word_spotting and not dc:
            if not include_in_dictionary(gt_texts[i]):
                dc = True
            else:
                gt_texts[i] = dictionary_transcription(gt_texts[i])
        if dc:
            dontcare_gt.add(i)

    dontcare_det = set()
    for j, dp in enumerate(det_polys):
        d_area = poly_area(dp)
        for i in dontcare_gt:
            inter = convex_poly_intersection_area(dp, gt_polys[i])
            prec = 0.0 if d_area == 0 else inter / d_area
            if prec > area_prec_thr:
                dontcare_det.add(j)
                break

    gt_used = np.zeros(len(gt_polys), dtype=bool)
    det_used = np.zeros(len(det_polys), dtype=bool)
    matched_det = matched_spot = 0
    for i in range(len(gt_polys)):
        for j in range(len(det_polys)):
            if (
                not gt_used[i]
                and not det_used[j]
                and i not in dontcare_gt
                and j not in dontcare_det
                and poly_iou(gt_polys[i], det_polys[j]) > iou_thr
            ):
                gt_used[i] = True
                det_used[j] = True
                matched_det += 1
                if word_spotting:
                    correct = gt_texts[i].upper() == det_texts[j].upper()
                else:
                    correct = transcription_match(
                        gt_texts[i].upper(),
                        det_texts[j].upper(),
                        special_characters=special_characters,
                        only_remove_first_last_gt=only_remove_first_last,
                    )
                matched_spot += int(correct)
    return {
        "doc_id": doc_id,
        "matched_det": matched_det,
        "matched_spot": matched_spot,
        "care_det": len(det_polys) - len(dontcare_det),
        "care_gt": len(gt_polys) - len(dontcare_gt),
    }


def e2e_match_stage(
    pairs: DataFrame,
    iou_thr: float = 0.5,
    area_prec_thr: float = 0.5,
    word_spotting: bool = False,
    only_remove_first_last: bool = True,
    special_characters: str | None = None,
) -> DataFrame:
    """eval_pairs rows -> per-doc e2e match counts (det + spot).
    ``special_characters`` defaults to the davarocr e2e_hmean set; the
    spotting demo harness (text_spotting/evaluation/script.py) appends
    a space to it — pass that variant for parity with those goldens."""

    def run(batches):
        for pdf in batches:
            rows = [
                _e2e_match_one_doc(
                    d, p, g, iou_thr, area_prec_thr, word_spotting,
                    only_remove_first_last, special_characters
                )
                for d, p, g in zip(pdf["doc_id"], pdf["pred"], pdf["gt"])
            ]
            yield pd.DataFrame(
                rows, columns=["doc_id", "matched_det", "matched_spot", "care_det", "care_gt"]
            )

    return pairs.mapInPandas(run, schema=_E2E_MATCH_SCHEMA)


def e2e_hmean(
    pairs: DataFrame,
    iou_thr: float = 0.5,
    area_prec_thr: float = 0.5,
    word_spotting: bool = False,
    only_remove_first_last: bool = True,
    special_characters: str | None = None,
) -> DataFrame:
    """Corpus end-to-end spotting metrics — one row with det_precision /
    det_recall / det_hmean / spot_precision / spot_recall / spot_hmean
    (e2e_hmean.py:343-357)."""
    per_doc = e2e_match_stage(
        pairs, iou_thr, area_prec_thr, word_spotting, only_remove_first_last,
        special_characters,
    )
    agg = per_doc.agg(
        F.sum("matched_det").alias("md"),
        F.sum("matched_spot").alias("ms"),
        F.sum("care_det").alias("d"),
        F.sum("care_gt").alias("g"),
    )

    def prh(m):
        p = F.when(F.col("d") > 0, F.col(m) / F.col("d")).otherwise(F.lit(0.0))
        r = F.when(F.col("g") > 0, F.col(m) / F.col("g")).otherwise(F.lit(0.0))
        h = F.when(p + r > 0, 2 * p * r / (p + r)).otherwise(F.lit(0.0))
        return p, r, h

    dp, dr, dh = prh("md")
    sp, sr, sh = prh("ms")
    return agg.select(
        F.round(dp, 6).alias("det_precision"),
        F.round(dr, 6).alias("det_recall"),
        F.round(dh, 6).alias("det_hmean"),
        F.round(sp, 6).alias("spot_precision"),
        F.round(sr, 6).alias("spot_recall"),
        F.round(sh, 6).alias("spot_hmean"),
    )


def det_hmean(pairs: DataFrame, iou_thr: float = 0.5, area_prec_thr: float = 0.5) -> DataFrame:
    """Corpus P/R/Hmean plus the tightness-aware TIoU variants — one row
    (precision, recall, hmean, tiou_precision, tiou_recall, tiou_hmean).
    TIoU divides the per-match tightness sums by the same care counts
    (hmean.py:335-338)."""
    per_doc = det_match_stage(pairs, iou_thr, area_prec_thr)
    agg = per_doc.agg(
        F.sum("matched").alias("m"),
        F.sum("care_det").alias("d"),
        F.sum("care_gt").alias("g"),
        F.sum("matched_tiou_gt").alias("tg"),
        F.sum("matched_tiou_dt").alias("td"),
    )
    p = F.when(F.col("d") > 0, F.col("m") / F.col("d")).otherwise(F.lit(0.0))
    r = F.when(F.col("g") > 0, F.col("m") / F.col("g")).otherwise(F.lit(0.0))
    tp = F.when(F.col("d") > 0, F.col("td") / F.col("d")).otherwise(F.lit(0.0))
    tr = F.when(F.col("g") > 0, F.col("tg") / F.col("g")).otherwise(F.lit(0.0))

    def hm(a, b):
        return F.when(a + b > 0, 2 * a * b / (a + b)).otherwise(F.lit(0.0))

    return agg.select(p.alias("p"), r.alias("r"), tp.alias("tp"), tr.alias("tr")).select(
        F.round("p", 6).alias("precision"),
        F.round("r", 6).alias("recall"),
        F.round(hm(F.col("p"), F.col("r")), 6).alias("hmean"),
        F.round("tp", 6).alias("tiou_precision"),
        F.round("tr", 6).alias("tiou_recall"),
        F.round(hm(F.col("tp"), F.col("tr")), 6).alias("tiou_hmean"),
    )


_DET_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("det_idx", T.IntegerType()),
        T.StructField("conf", T.DoubleType()),
        T.StructField("matched", T.IntegerType()),
        T.StructField("care_gt", T.IntegerType()),
        T.StructField("matched_tiou_gt", T.DoubleType()),
        T.StructField("matched_tiou_dt", T.DoubleType()),
    ]
)


def det_detections_stage(
    pairs: DataFrame, iou_thr: float = 0.5, area_prec_thr: float = 0.5
) -> DataFrame:
    """Per-DETECTION match rows for the reference's CONFIDENCES path
    (hmean.py:300-311 arrGlobalConfidences/arrGlobalMatches): one row
    per care detection (det_idx, conf, matched) plus one doc-summary
    sentinel row (det_idx = -1) carrying care_gt and the TIoU sums —
    the sentinel keeps docs whose ground truth no detection touched in
    the AP/recall denominators."""

    def run(batches):
        for pdf in batches:
            out = []
            for doc_id, pred, gt in zip(pdf["doc_id"], pdf["pred"], pdf["gt"]):
                mpairs, dontcare_gt, dontcare_det, gt_preps, det_preps = _greedy_match(
                    pred, gt, iou_thr, area_prec_thr
                )
                matched_dets = {j for _, j in mpairs}
                tiou_gt = tiou_dt = 0.0
                for i, j in mpairs:
                    inter = _prep_inter_area(det_preps[j], gt_preps[i])
                    union = det_preps[j][2] + gt_preps[i][2] - inter
                    tiou_gt += _tiou_recall_term(inter, union, gt_preps[i][2])
                    tiou_dt += _tiou_precision_term(
                        det_preps[j], gt_preps[i], i, gt_preps, inter, union
                    )
                out.append(
                    {
                        "doc_id": doc_id,
                        "det_idx": -1,
                        "conf": None,
                        "matched": 0,
                        "care_gt": len(gt_preps) - len(dontcare_gt),
                        "matched_tiou_gt": tiou_gt,
                        "matched_tiou_dt": tiou_dt,
                    }
                )
                for j, d in enumerate(pred):
                    if j in dontcare_det:
                        continue
                    out.append(
                        {
                            "doc_id": doc_id,
                            "det_idx": j,
                            "conf": float(d["conf"]) if d["conf"] is not None else 0.0,
                            "matched": int(j in matched_dets),
                            "care_gt": None,
                            "matched_tiou_gt": None,
                            "matched_tiou_dt": None,
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in _DET_ROWS_SCHEMA.fields])

    return pairs.mapInPandas(run, schema=_DET_ROWS_SCHEMA)


def det_eval_full(
    pairs: DataFrame,
    iou_thr: float = 0.5,
    area_prec_thr: float = 0.5,
    n_buckets: int = 32,
) -> DataFrame:
    """The reference's FULL detection summary (hmean.py:326-345
    methodMetrics): precision, recall, hmean, ave_precision (the
    CONFIDENCES sweep over all care detections, denominator =
    numGlobalCareGt), and the TIoU triple — one row. The
    det_detections_stage output is lazily localCheckpoint-ed
    (eager=False: construction stays a pure transformation; the first
    ACTION materializes the checkpoint) so the O(n_gt * n_det) polygon
    matcher runs ONCE even though three downstream consumers (the
    counts agg, the quantile pass inside ranked_detections, and the
    final cumsum) re-traverse its lineage; the AP sweep uses the
    two-phase distributed cumsum."""
    rows = det_detections_stage(pairs, iou_thr, area_prec_thr).localCheckpoint(eager=False)
    det_rows = rows.filter(F.col("det_idx") >= 0)
    counts = rows.agg(
        F.sum("matched").alias("m"),
        F.sum((F.col("det_idx") >= 0).cast("long")).alias("d"),
        F.sum("care_gt").alias("g"),
        F.sum("matched_tiou_gt").alias("tg"),
        F.sum("matched_tiou_dt").alias("td"),
    )
    ap = compute_ap(
        det_rows.withColumn("tid", F.concat_ws("#", "doc_id", "det_idx")),
        "conf",
        "matched",
        id_col="tid",
        n_gt=counts.select(F.col("g").alias("n_gt")),
        n_buckets=n_buckets,
    )
    p = F.when(F.col("d") > 0, F.col("m") / F.col("d")).otherwise(F.lit(0.0))
    r = F.when(F.col("g") > 0, F.col("m") / F.col("g")).otherwise(F.lit(0.0))
    tp = F.when(F.col("d") > 0, F.col("td") / F.col("d")).otherwise(F.lit(0.0))
    tr = F.when(F.col("g") > 0, F.col("tg") / F.col("g")).otherwise(F.lit(0.0))

    def hm(a, b):
        return F.when(a + b > 0, 2 * a * b / (a + b)).otherwise(F.lit(0.0))

    return (
        counts.select(p.alias("p"), r.alias("r"), tp.alias("tp"), tr.alias("tr"))
        .crossJoin(F.broadcast(ap))
        .select(
            F.round("p", 6).alias("precision"),
            F.round("r", 6).alias("recall"),
            F.round(hm(F.col("p"), F.col("r")), 6).alias("hmean"),
            F.col("ap").alias("ave_precision"),
            F.round("tp", 6).alias("tiou_precision"),
            F.round("tr", 6).alias("tiou_recall"),
            F.round(hm(F.col("tp"), F.col("tr")), 6).alias("tiou_hmean"),
        )
    )


def ranked_detections(
    scored: DataFrame,
    conf_col: str = "conf",
    match_col: str = "matched",
    id_col: str | None = None,
    n_buckets: int = 32,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Global (cum_correct, rank) in confidence-desc order WITHOUT a
    single-partition window — the scale-safe two-phase cumsum:

    1. bucket each row by confidence quantile boundaries computed
       LAZILY inside the plan (percentile_approx aggregate + broadcast
       join) — no driver-side action, so the whole operator is ONE
       Spark job instead of a quantile job followed by the main job
       (guide §1/§5: no driver work in query paths). Any boundary set
       yields the same output (bucketing only shapes parallelism), and
       within one execution every row sees the same broadcast bounds;
    2. per-bucket window cumsum/row_number (one hash shuffle on bucket,
       parallel across buckets);
    3. per-bucket prefix offsets derived FROM the window output
       (pm = max(cum_local), pn = max(rk_local) per bucket — valid
       because m >= 0 makes cum_local non-decreasing): the stats
       consumer then shares the window's Exchange subtree verbatim, so
       AQE reuses the shuffle instead of re-scanning the source (the
       r5 groupBy-on-base formulation re-scanned the input twice: the
       partial agg below the exchange differentiated the subplans and
       defeated ReusedExchange). The prefix sum over the ~n_buckets
       stats rows is a packed collect_list + transform/aggregate
       (O(n_buckets^2) on tiny data), replacing the r5 stats-self-join
       (a BroadcastNestedLoopJoin + two more aggregations).

    Replaces the reference's single-node sort (hmean.py compute_ap sorts
    the whole detection list in numpy) with a plan whose widest task
    holds ~1/n_buckets of the detections. ``id_col`` breaks confidence
    ties deterministically. With ``group_cols`` the rank/cumsum restarts
    per group (per-class AP): the bucket split then bounds the widest
    task by the largest (group, quantile-slice), not the largest group.
    """
    groups = list(group_cols or [])
    cols = [F.col(g) for g in groups] + [
        F.col(conf_col).cast("double").alias("conf"),
        F.col(match_col).cast("int").alias("m"),
    ]
    if id_col:
        cols.append(F.col(id_col).alias("tid"))
    base = scored.select(*cols)

    probs = [i / n_buckets for i in range(1, n_buckets)]
    if probs:
        # accuracy 1000 mirrors the old approxQuantile(relativeError=1e-3)
        bounds_row = base.agg(
            F.array_distinct(
                F.percentile_approx("conf", probs, 1000)
            ).alias("_bounds")
        )
        base = base.crossJoin(F.broadcast(bounds_row))
        bucket = F.coalesce(
            F.size(F.filter(F.col("_bounds"), lambda b: b > F.col("conf"))),
            F.lit(0),
        )
        base = base.withColumn("bucket", bucket).drop("_bounds")
    else:
        base = base.withColumn("bucket", F.lit(0))

    order = [F.col("conf").desc()] + ([F.col("tid").asc()] if id_col else [])
    w = Window.partitionBy(*groups, "bucket").orderBy(*order)
    local = base.withColumn(
        "cum_local", F.sum("m").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("rk_local", F.row_number().over(w))

    # per-bucket totals read off the window output (m ∈ {0,1,...} makes
    # the running sum end at the bucket total) — keeps the Exchange +
    # Sort + Window subtree identical to `local`'s, hence reused
    stats = local.groupBy(*groups, "bucket").agg(
        F.max("cum_local").alias("pm"),
        F.max("rk_local").cast("bigint").alias("pn"),
    )
    packed = stats.groupBy(*groups).agg(
        F.array_sort(F.collect_list(F.struct("bucket", "pm", "pn"))).alias("arr")
    )
    prefix = F.transform(
        F.col("arr"),
        lambda x, i: F.struct(
            x["bucket"].alias("bucket"),
            F.aggregate(
                F.slice(F.col("arr"), F.lit(1), i),
                F.lit(0).cast("bigint"),
                lambda acc, y: acc + y["pm"],
            ).alias("m_off"),
            F.aggregate(
                F.slice(F.col("arr"), F.lit(1), i),
                F.lit(0).cast("bigint"),
                lambda acc, y: acc + y["pn"],
            ).alias("n_off"),
        ),
    )
    offs = packed.select(*groups, F.explode(prefix).alias("o")).select(
        *groups, "o.bucket", "o.m_off", "o.n_off"
    )
    return local.join(F.broadcast(offs), groups + ["bucket"]).select(
        *groups,
        "conf",
        "m",
        (F.col("cum_local") + F.col("m_off")).alias("cum_correct"),
        (F.col("rk_local") + F.col("n_off")).alias("rank"),
    )


def compute_ap(
    scored: DataFrame,
    conf_col: str = "conf",
    match_col: str = "matched",
    id_col: str | None = None,
    n_gt: "int | DataFrame | None" = None,
    n_buckets: int = 32,
) -> DataFrame:
    """Average precision via confidence-desc cumulative precision
    (hmean.py compute_ap), distributed through the two-phase cumsum in
    :func:`ranked_detections`. scored: one row per care detection with a
    boolean/int match flag. ``n_gt``: the denominator — an int, a 1-row
    frame with column n_gt (stays lazy; the reference divides by
    numGlobalCareGt), or None to fall back to the match total in
    ``scored``."""
    ranked = ranked_detections(scored, conf_col, match_col, id_col, n_buckets)
    s_expr = F.sum(F.when(F.col("m") == 1, F.col("cum_correct") / F.col("rank"))).alias("s")
    if isinstance(n_gt, DataFrame):
        s = ranked.agg(s_expr)
        return s.crossJoin(F.broadcast(n_gt.select("n_gt"))).select(
            F.round(F.coalesce(F.col("s"), F.lit(0.0)) / F.greatest(F.col("n_gt"), F.lit(1)), 6).alias("ap")
        )
    if n_gt is not None:
        return ranked.agg(s_expr).select(
            F.round(F.coalesce(F.col("s"), F.lit(0.0)) / F.lit(max(n_gt, 1)), 6).alias("ap")
        )
    # denominator fallback = total matched: fold it into the SAME
    # aggregation pass instead of a second scan of `scored` (the r5
    # crossJoin formulation re-read the source + added a nested-loop
    # join stage for one scalar)
    return ranked.agg(s_expr, F.sum("m").alias("g")).select(
        F.round(F.coalesce(F.col("s"), F.lit(0.0)) / F.greatest(F.col("g"), F.lit(1)), 6).alias("ap")
    )


def eval_map(
    scored: DataFrame,
    class_col: str = "cls",
    conf_col: str = "conf",
    match_col: str = "matched",
    id_col: str | None = None,
    gt_counts: DataFrame | None = None,
    n_buckets: int = 32,
) -> DataFrame:
    """Per-class average precision + mean AP (the VOC-style eval_map of
    the reference's davar_custom.py:384-390, which delegates to mmdet's
    eval_map — reimplemented as per-class two-phase ranked cumsum).

    ``gt_counts`` is REQUIRED: a (class_col, n_gt) frame with the true
    per-class annotation counts. Deriving the denominator from the
    match flags in ``scored`` would silently exclude ground truth no
    detection ever matched and overstate AP (the reference takes gt
    counts from annotations, not detections); callers who really want
    the matched-only variant can pass
    ``scored.groupBy(cls).agg(sum(matched).alias('n_gt'))`` explicitly.
    Returns one row per class (cls, ap) plus a final row
    cls='__mean__' carrying the mAP.
    """
    if gt_counts is None:
        raise ValueError(
            "eval_map requires gt_counts (class_col, n_gt): the per-class "
            "annotation totals. A denominator derived from matched flags "
            "excludes unmatched ground truth and overstates AP."
        )
    ranked = ranked_detections(
        scored, conf_col, match_col, id_col, n_buckets, group_cols=[class_col]
    )
    s = (
        ranked.filter(F.col("m") == 1)
        .groupBy(class_col)
        .agg(F.sum(F.col("cum_correct") / F.col("rank")).alias("s"))
    )
    # broadcast the per-class sums (one row per class) into the
    # gt_counts left join: without the hint the planner sort-merges,
    # adding an Exchange(cls) + Sort on BOTH sides of a #classes-row
    # join (r6 measured plan)
    per_class = (
        gt_counts.join(F.broadcast(s), class_col, "left")
        .select(
            F.col(class_col).alias("cls"),
            F.round(
                F.coalesce(F.col("s"), F.lit(0.0)) / F.greatest(F.col("n_gt"), F.lit(1)), 6
            ).alias("ap"),
        )
    )
    # append the mAP row in ONE pass: per_class.union(per_class.agg(...))
    # would re-run the whole ranked lineage for the mean branch (2x the
    # job at scale); instead pack the per-class rows (there are only
    # #classes of them) into one row, compute the mean there, and
    # explode back out
    packed = per_class.agg(
        F.collect_list(F.struct("cls", "ap")).alias("rows"),
        F.round(F.avg("ap"), 6).alias("mean_ap"),
    )
    return packed.select(
        F.explode(
            F.concat(
                F.col("rows"),
                F.array(F.struct(F.lit("__mean__").alias("cls"), F.col("mean_ap").alias("ap"))),
            )
        ).alias("r")
    ).select("r.cls", "r.ap")


def eval_recalls(
    scored: DataFrame,
    budgets: list[int],
    group_col: str = "img_id",
    conf_col: str = "conf",
    match_col: str = "matched",
    id_col: str | None = None,
    n_gt: "int | str | DataFrame | None" = None,
) -> DataFrame:
    """Proposal recall at top-k budgets (davar_custom.py:392-396 ->
    mmdet eval_recalls): per image, rank proposals by confidence and for
    each budget k report the fraction of ground truth covered by a
    matched proposal within the top k. One row per budget (budget,
    recall). The per-image window is naturally partitioned (no global
    sort); budgets evaluate in one pass via conditional aggregation.

    ``n_gt``: the TRUE ground-truth total — an int, a 1-row frame with
    column n_gt (stays lazy), or (r6) the NAME of a 0/1 gt-flag column
    in ``scored``, whose sum is folded into the SAME aggregation pass
    as the budget hits — no second scan of the source and no broadcast
    join for one scalar (the frame variant costs both). Strongly
    encouraged either way: without it the denominator falls back to
    the number of matched proposals, which excludes ground truth no
    proposal covered — an UPPER BOUND on recall, not recall (the
    reference counts gt from annotations).
    """
    order = [F.col(conf_col).desc()] + ([F.col(id_col).asc()] if id_col else [])
    w = Window.partitionBy(group_col).orderBy(*order)
    rk = scored.withColumn("rk", F.row_number().over(w))
    m = F.col(match_col).cast("int")
    aggs = [
        F.sum(F.when(F.col("rk") <= k, m).otherwise(F.lit(0))).alias(f"hit_{k}")
        for k in budgets
    ]
    if n_gt is None:
        totals = rk.agg(F.sum(m).alias("n_gt"), *aggs)
    elif isinstance(n_gt, str):
        # the window preserves every scored row, so summing the flag
        # after it equals summing it over `scored`
        totals = rk.agg(*aggs, F.sum(F.col(n_gt).cast("int")).alias("n_gt"))
    elif isinstance(n_gt, DataFrame):
        totals = rk.agg(*aggs).crossJoin(F.broadcast(n_gt.select("n_gt")))
    else:
        totals = rk.agg(*aggs).withColumn("n_gt", F.lit(int(n_gt)))
    # unpivot the single totals row instead of union-of-selects: a union
    # branch per budget would recompute the window + aggregation per
    # budget (k full passes over the proposals at scale)
    return totals.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("budget"),
                        F.round(
                            F.col(f"hit_{k}") / F.greatest(F.col("n_gt"), F.lit(1)), 6
                        ).alias("recall"),
                    )
                    for k in budgets
                ]
            )
        ).alias("r")
    ).select("r.budget", "r.recall")


def recognition_accuracy(df: DataFrame, pred_col: str = "pred", label_col: str = "label") -> DataFrame:
    """Exact-match accuracy + normalized edit distance (NED); built-in
    levenshtein (the reference uses python editdistance)."""
    return df.agg(
        F.round(F.avg((F.col(pred_col) == F.col(label_col)).cast("double")), 6).alias("acc"),
        F.round(
            F.avg(
                F.levenshtein(pred_col, label_col)
                / F.greatest(F.length(label_col), F.lit(1))
            ),
            6,
        ).alias("ned"),
    )


def total_order_acc(pred_docs: DataFrame, gt_docs: DataFrame, on: str = "doc_id") -> DataFrame:
    """Exact span-sequence equality rate between two documents tables."""
    joined = pred_docs.alias("p").join(gt_docs.alias("g"), on)
    return joined.agg(
        F.round(F.avg((F.col("p.spans") == F.col("g.spans")).cast("double")), 6).alias(
            "total_order_acc"
        )
    )


def macro_f1(df: DataFrame, pred_col: str = "pred", label_col: str = "label") -> DataFrame:
    """Macro-averaged F1 over classes present in labels."""
    per_class = (
        df.select(
            F.col(label_col).alias("cls"),
            (F.col(pred_col) == F.col(label_col)).cast("int").alias("tp_flag"),
        )
        .groupBy("cls")
        .agg(F.sum("tp_flag").alias("tp"), F.count("*").alias("n_gt"))
    )
    pred_counts = df.groupBy(F.col(pred_col).alias("cls")).agg(F.count("*").alias("n_pred"))
    j = per_class.join(pred_counts, "cls", "left").fillna(0, subset=["n_pred"])
    f1 = (
        j.select(
            "cls",
            (F.col("tp") / F.greatest(F.col("n_pred"), F.lit(1))).alias("p"),
            (F.col("tp") / F.greatest(F.col("n_gt"), F.lit(1))).alias("r"),
        )
        .select(
            "cls",
            F.when(F.col("p") + F.col("r") > 0, 2 * F.col("p") * F.col("r") / (F.col("p") + F.col("r")))
            .otherwise(F.lit(0.0))
            .alias("f1"),
        )
    )
    return f1.agg(F.round(F.avg("f1"), 6).alias("macro_f1"))


# ---------------------------------------------------------------------------
# table metrics (TEDS / tree-F1) as DataFrame stages
# ---------------------------------------------------------------------------
def teds_stage(pairs: DataFrame, pred_col: str = "pred_html", gt_col: str = "gt_html",
               structure_only: bool = False) -> DataFrame:
    """(doc_id, pred_html, gt_html) -> (doc_id, teds). The reference's
    n_jobs process pool (parallel.py:5, metric.py:136) becomes executor
    parallelism."""
    import pyarrow as pa

    from ..functions.trees import teds_score

    out_schema = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("teds", T.DoubleType())]
    )

    def run(batches):
        for batch in batches:
            preds = batch.column(pred_col).to_pylist()
            gts = batch.column(gt_col).to_pylist()
            scores = [teds_score(p or "", g or "", structure_only) for p, g in zip(preds, gts)]
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), pa.array(scores, type=pa.float64())],
                names=["doc_id", "teds"],
            )

    return pairs.mapInArrow(run, schema=out_schema)


def avg_teds(pairs: DataFrame, **kwargs) -> DataFrame:
    return teds_stage(pairs, **kwargs).agg(F.round(F.avg("teds"), 6).alias("avg_teds"))


def tree_f1_stage(pairs: DataFrame, eval_type: str = "hard") -> DataFrame:
    """(doc_id, gt_edges, pred_edges, n_cells) -> per-table (r, p, f1);
    edges are array<struct<src,dst,rel>> (the Spark-friendly edge-list
    form of the reference's N x N relations matrix)."""
    import numpy as np
    import pyarrow as pa

    from ..functions.trees import tree_f1

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("recall", T.DoubleType()),
            T.StructField("precision", T.DoubleType()),
            T.StructField("f1", T.DoubleType()),
        ]
    )

    def to_matrix(edges, n):
        m = np.zeros((n, n), dtype=np.int64)
        for e in edges or []:
            m[e["src"]][e["dst"]] = e["rel"]
        return m

    def run(batches):
        for batch in batches:
            gt = batch.column("gt_edges").to_pylist()
            pr = batch.column("pred_edges").to_pylist()
            ns = batch.column("n_cells").to_pylist()
            rows = [tree_f1(to_matrix(g, n), to_matrix(p, n), eval_type)
                    for g, p, n in zip(gt, pr, ns)]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pa.array([r[0] for r in rows], type=pa.float64()),
                    pa.array([r[1] for r in rows], type=pa.float64()),
                    pa.array([r[2] for r in rows], type=pa.float64()),
                ],
                names=["doc_id", "recall", "precision", "f1"],
            )

    return pairs.mapInArrow(run, schema=out_schema)


def avg_tree_f1(pairs: DataFrame, eval_type: str = "hard") -> DataFrame:
    """Corpus tree-F1 = mean of per-table r/p/f1 (evaluate_tree_f1)."""
    return tree_f1_stage(pairs, eval_type).agg(
        F.round(F.avg("recall"), 6).alias("recall"),
        F.round(F.avg("precision"), 6).alias("precision"),
        F.round(F.avg("f1"), 6).alias("f1"),
    )
