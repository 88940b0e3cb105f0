"""Video-text track operators: sequence merge + best-frame selection.

Reference semantics (davarocr/davar_videotext/tools/merge_seq.py:36-230,
test_utils.py:113-128):

- per track: best (highest-quality-score) frame provides the track's
  word; tracks with an empty best word are dropped;
- two tracks merge when seq1.start <= seq2.start <= seq1.end +
  max_interval AND, comparing seq2's start bbox with seq1's bbox at
  the frame nearest to seq2's start:
    (iou >= thresh_tight and edit_dist_iou >= edit_thresh_loose) or
    (iou >= thresh_loose and edit_dist_iou >= edit_thresh_tight)
  where edit_dist_iou(a, b) = (max(|a|,|b|) - lev(a,b)) /
  (|a| + |b| - (max(|a|,|b|) - lev(a,b)));
- merged group keeps the word/frame of its highest-score member.

The reference iterates merge-to-fixpoint mutating group state; we take
the transitive closure of the pairwise predicate over ORIGINAL tracks
(union-find) — equivalent grouping whenever merges are evidence of the
same physical text instance (documented simplification).

Spark shape: per-frame rows -> groupBy(video_id).applyInPandas (a video
is small; the corpus is huge). The same logic runs streaming via
session windows (streaming/tracks.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from ..functions.geometry import rect_iou_matrix


def edit_dist_iou(a: str, b: str) -> float:
    """(max(len) - lev) / (len_a + len_b - (max(len) - lev))."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    dist = _levenshtein(a, b)
    inter = max(la, lb) - dist
    union = la + lb - inter
    return inter / union if union > 0 else 0.0


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


MERGED_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("merged_id", T.IntegerType()),
        T.StructField("frame_start", T.IntegerType()),
        T.StructField("frame_end", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("n_tracks", T.IntegerType()),
    ]
)


def merge_video_tracks(
    pdf: pd.DataFrame,
    max_interval: int = 30,
    thresh_tight: float = 0.5,
    thresh_loose: float = 0.3,
    edit_thresh_tight: float = 0.8,
    edit_thresh_loose: float = 0.5,
) -> pd.DataFrame:
    """Pure-pandas per-video merge (runs inside applyInPandas)."""
    video_id = pdf["video_id"].iloc[0]
    tracks = {}
    for tid, grp in pdf.groupby("track_id"):
        best = grp.loc[grp["score"].idxmax()]
        word = best["text"]
        if not word:
            continue
        frames = grp.sort_values("frame_id")
        tracks[int(tid)] = {
            "start": int(frames["frame_id"].iloc[0]),
            "end": int(frames["frame_id"].iloc[-1]),
            "start_bbox": np.asarray(frames["bbox"].iloc[0], dtype=np.float64),
            "frames": frames["frame_id"].to_numpy(),
            "bboxes": np.stack([np.asarray(b, dtype=np.float64) for b in frames["bbox"]]),
            "word": word,
            "score": float(best["score"]),
        }
    ids = sorted(tracks)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for i in ids:
        t1 = tracks[i]
        for j in ids:
            if i == j:
                continue
            t2 = tracks[j]
            if not (t1["start"] <= t2["start"] <= t1["end"] + max_interval):
                continue
            # bbox of t1 at the frame nearest to t2's start
            near = int(np.argmin(np.abs(t1["frames"] - t2["start"])))
            iou = rect_iou_matrix(
                t2["start_bbox"].reshape(1, 4), t1["bboxes"][near].reshape(1, 4)
            )[0, 0]
            ed = edit_dist_iou(t1["word"], t2["word"])
            if (iou >= thresh_tight and ed >= edit_thresh_loose) or (
                iou >= thresh_loose and ed >= edit_thresh_tight
            ):
                union(i, j)

    groups: dict[int, list[int]] = {}
    for i in ids:
        groups.setdefault(find(i), []).append(i)
    rows = []
    for root, members in sorted(groups.items()):
        best = max(members, key=lambda m: (tracks[m]["score"], -m))
        rows.append(
            {
                "video_id": video_id,
                "merged_id": root,
                "frame_start": min(tracks[m]["start"] for m in members),
                "frame_end": max(tracks[m]["end"] for m in members),
                "text": tracks[best]["word"],
                "score": tracks[best]["score"],
                "n_tracks": len(members),
            }
        )
    return pd.DataFrame(rows, columns=[f.name for f in MERGED_SCHEMA.fields])


def track_merge_stage(frames: DataFrame, **kwargs) -> DataFrame:
    """groupBy(video).applyInPandas merge over per-frame track rows
    (video_id, track_id, frame_id, bbox, text, score)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return merge_video_tracks(pdf, **kwargs)

    return frames.groupBy("video_id").applyInPandas(run, schema=MERGED_SCHEMA)


def make_track_fixture(n_videos: int = 6, seed: int = 41):
    """Deterministic per-frame track rows with planted same-instance
    splits (a track interrupted mid-way resumes with a new id, same
    bbox/word) plus unrelated tracks. Returns (rows, expected merged
    count per video)."""
    rng = np.random.default_rng(seed)
    rows, expected = [], {}
    for v in range(n_videos):
        vid = f"vid-{v}"
        n_instances = int(rng.integers(1, 4))
        merged_count = 0
        tid = 0
        for inst in range(n_instances):
            word = "".join("abcdefgh"[i] for i in rng.integers(0, 8, size=5))
            x0 = float(rng.integers(0, 400))
            y0 = float(rng.integers(0, 300))
            bbox = [x0, y0, x0 + 60, y0 + 20]
            start = int(rng.integers(0, 40))
            length = int(rng.integers(6, 20))
            split = rng.random() < 0.5 and length > 10
            pieces = (
                [(start, start + length // 2), (start + length // 2 + 5, start + length + 5)]
                if split
                else [(start, start + length)]
            )
            for (s, e) in pieces:
                for f in range(s, e + 1):
                    rows.append(
                        {
                            "video_id": vid,
                            "track_id": tid,
                            "frame_id": f,
                            "bbox": bbox,
                            "text": word,
                            "score": float(0.5 + rng.random() * 0.5),
                        }
                    )
                tid += 1
            merged_count += 1
        expected[vid] = merged_count
    return rows, expected


# ---------------------------------------------------------------------------
# F-score-R end-to-end track evaluation (YORO protocol)
# ---------------------------------------------------------------------------
# Reference: demo/videotext/evaluation/evaluate_hmeans.py (Fscore) +
# evaluate_utils.py (load_gt_fscore:374, load_pre_fscore:449,
# process_gt_trans:119, string_map:10). The shipped gt archive is NOT in
# the repo (gt/IC15/ carries only the vocabulary), so the published
# 468/675 totals cannot be re-run; parity evidence is (a) the shipped
# 798-track pred file parsed through the scan + selected-frame rule
# (tests/test_video_eval.py) and (b) a synthetic-gt golden against an
# independent brute-force oracle.

# the reference's recognition charset (evaluate_utils.py:10); only the
# digit prefix matters to the protocol (digit-bearing gt words skip
# vocabulary correction) but index() also VALIDATES membership — a gt
# char outside the charset raises in the reference, and we preserve that
_EVAL_STRING_MAP = (
    "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    "[]+-#$()@=_!?,:;/.%&\\'\">*|<`{~}^   "
)


def snap_gt_trans(trans: str, voca_list: list[str]) -> str:
    """process_gt_trans parity (evaluate_utils.py:119-149): gt words
    snap to the nearest vocabulary entry by Levenshtein distance
    (first-minimum wins), EXCEPT '###' and digit-bearing words, which
    pass through unchanged. With an empty vocabulary the non-excepted
    branch returns '' (the reference's init value) — caller passes a
    vocabulary iff the protocol runs in lexicon mode."""
    contain_number = False
    for ch in trans:
        if _EVAL_STRING_MAP.index(ch) <= 9:
            contain_number = True
    if trans == "###" or contain_number:
        return trans
    best, word = 10**7, ""
    for voca in voca_list:
        d = _levenshtein(voca, trans)
        if d < best:
            best, word = d, voca
    return word


def parse_pred_instance(s: str) -> tuple[int, list[int], str]:
    """'frame,x1_y1_..._y4,word' -> (frame, 8 int points, word) with
    the reference's int() truncation (load_pre_fscore:478-490)."""
    parts = s.split(",")
    frame = int(parts[0])
    pts = [int(v) for v in parts[1].split("_")[:8]]
    return frame, pts, parts[-1]


def parse_gt_instance(s: str) -> tuple[int, str, list[int]]:
    """gt 'frame,...,quality,x1_y1_..._y4' -> (frame, quality, points)
    (load_gt_fscore via load_gt_ata split semantics: frame from the
    first comma field, quality and bbox from the last two)."""
    frame = int(s.split(",", 2)[0])
    quality = s.rsplit(",", 2)[-2]
    bbox = s.rsplit(",", 2)[-1]
    pts = [int(v) for v in bbox.split("_")[:8]]
    return frame, quality, pts


def select_best_frame(track: list[str], scores: list[float]) -> tuple[int, list[int], str]:
    """load_pre_fscore selected-frame rule: the frame whose quality
    score is the STRICT maximum — on ties the FIRST max wins
    (`score > max_score`). Returns (frame, points, word-at-frame).
    NOTE the reference keys locations per frame id, so a track that
    revisits a frame id keeps the LAST instance's bbox for that frame;
    we preserve that by resolving the selected location after the full
    pass."""
    best_i, best_s = 0, float("-inf")
    loc_by_frame: dict[int, list[int]] = {}
    word_by_frame: dict[int, str] = {}
    for i, inst in enumerate(track):
        frame, pts, word = parse_pred_instance(inst)
        loc_by_frame[frame] = pts
        word_by_frame[frame] = word
        if scores[i] > best_s:
            best_s, best_i = scores[i], i
    sel_frame = int(track[best_i].split(",")[0])
    return sel_frame, loc_by_frame[sel_frame], word_by_frame[sel_frame]


def _seq_sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    """The protocols iterate tracks in the source file's dict order;
    a cogrouped kernel receives rows in arbitrary shuffle order, so
    re-sort by the scan's ``seq`` column when present (fixture frames
    without one are used with single-partition inputs whose order is
    already the construction order)."""
    if "seq" in pdf.columns and len(pdf):
        return pdf.sort_values("seq", kind="mergesort").reset_index(drop=True)
    return pdf


_FSCORE_VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("matched", T.IntegerType()),
        T.StructField("pred_care", T.IntegerType()),
        T.StructField("gt_care", T.IntegerType()),
    ]
)


def _fscore_one_video(pred_pdf: pd.DataFrame, gt_pdf: pd.DataFrame,
                      iou_thresh: float) -> pd.DataFrame:
    """The evaluate_hmeans.py Fscore per-video loop, quirks preserved:

    - pred tracks iterate in ROW ORDER (the reference's dict insertion
      order) and greedily consume gt tracks;
    - gt candidates iterate grouped by transcription (label_index_dict
      insertion order) and ties on IoU go to the LAST max (`iou >=
      max_iou`);
    - max_iou starts at -1, so a pred whose selected frame exists in
      ANY unmatched gt track always acquires a max_gt_idx — even at
      IoU 0 — and if that gt is '###' the pair is consumed as a
      don't-care match with NO IoU threshold applied;
    - the care-match branch requires iou >= thresh AND exact
      (uppercased-pred == snapped-gt) word equality."""
    pred_pdf, gt_pdf = _seq_sorted(pred_pdf), _seq_sorted(gt_pdf)
    video_id = (
        pred_pdf["video_id"].iloc[0]
        if len(pred_pdf)
        else (gt_pdf["video_id"].iloc[0] if len(gt_pdf) else "")
    )
    from .metrics import _prep_poly

    def quad(pts):
        return _prep_poly(np.asarray(pts, dtype=np.float64).reshape(4, 2))

    from .metrics import _prep_iou

    # gt state in row order; label grouping preserves first-seen order
    gt_rows = list(gt_pdf.itertuples())
    voca = []
    if len(gt_pdf) and "words" in gt_pdf.columns:
        w = gt_pdf["words"].iloc[0]
        if w is not None and len(w):
            voca = list(w)
    trans_map = {}   # gt_id -> snapped trans
    loc_map = {}     # gt_id -> {frame: prep_poly}
    matched = {}     # gt_id -> 0/1/2
    label_order: dict[str, list] = {}
    gt_notcare = 0
    for r in gt_rows:
        trans = snap_gt_trans(r.trans, voca) if voca else r.trans
        trans_map[r.gt_id] = trans
        if trans == "###":
            gt_notcare += 1
        matched[r.gt_id] = 0
        label_order.setdefault(trans, []).append(r.gt_id)
        locs = {}
        for inst in r.track:
            frame, _q, pts = parse_gt_instance(inst)
            locs[frame] = quad(pts)
        loc_map[r.gt_id] = locs

    pre_matched = {}
    for p in pred_pdf.itertuples():
        if p.scores is None:
            # mirrors the reference's load_pre_fscore KeyError: the
            # F-score protocol selects a frame by score; a score-less
            # track file needs a select_frame column instead
            raise ValueError(
                "track_fscore_eval needs per-frame scores (or a "
                "select_frame column) — prediction track has null scores"
            )
        sel_frame, sel_pts, _w = select_best_frame(list(p.track), list(p.scores))
        sel_word = str(p.text).upper()
        pre_matched[p.track_id] = 0
        sel_prep = quad(sel_pts)
        max_iou, max_gt = -1.0, None
        for label in label_order:
            for gt_id in label_order[label]:
                if matched[gt_id] in (1, 2):
                    continue
                if sel_frame not in loc_map[gt_id]:
                    continue
                iou = _prep_iou(sel_prep, loc_map[gt_id][sel_frame])
                if iou >= max_iou:
                    max_iou, max_gt = iou, gt_id
        if max_gt is None:
            continue
        if trans_map[max_gt] == "###":
            pre_matched[p.track_id] = 2
            matched[max_gt] = 2
        elif max_iou >= iou_thresh and trans_map[max_gt] == sel_word:
            pre_matched[p.track_id] = 1
            matched[max_gt] = 1

    n_matched = sum(1 for v in pre_matched.values() if v == 1)
    n_pred_notcare = sum(1 for v in pre_matched.values() if v == 2)
    return pd.DataFrame(
        {
            "video_id": [video_id],
            "matched": [n_matched],
            "pred_care": [len(pre_matched) - n_pred_notcare],
            "gt_care": [len(matched) - gt_notcare],
        }
    )


def fscore_track_eval(
    pred: DataFrame,
    gt: DataFrame,
    voca: DataFrame | None = None,
    iou_thresh: float = 0.5,
) -> DataFrame:
    """Corpus F-score-R (YORO end-to-end protocol): pred tracks
    (video_id, track_id, track array<string>, scores array<double>,
    text) vs gt tracks (video_id, gt_id, trans, track array<string>)
    with an optional per-video vocabulary (video_id, words
    array<string>).

    Spark shape: the greedy per-video match runs in a cogrouped
    applyInPandas (a video's tracks are small; the corpus is many
    videos — the natural parallel unit at 100 TB), followed by ONE
    global aggregation to the corpus P/R/H row. The vocabulary joins
    onto the gt side first (broadcast: lexicons are tiny)."""
    import pyspark.sql.functions as F
    from pyspark.sql.functions import broadcast

    if voca is not None:
        gt = gt.join(broadcast(voca), "video_id", "left")

    def run(key, pred_pdf, gt_pdf):
        return _fscore_one_video(pred_pdf, gt_pdf, iou_thresh)

    per_video = (
        pred.groupBy("video_id")
        .cogroup(gt.groupBy("video_id"))
        .applyInPandas(run, schema=_FSCORE_VIDEO_SCHEMA)
    )
    totals = per_video.agg(
        F.sum("matched").alias("n_matched"),
        F.sum("pred_care").alias("n_pred"),
        F.sum("gt_care").alias("n_gt"),
    )
    r = F.when(F.col("n_gt") > 0, F.col("n_matched") / F.col("n_gt")).otherwise(0.0)
    p = F.when(F.col("n_pred") > 0, F.col("n_matched") / F.col("n_pred")).otherwise(0.0)
    h = F.when(r + p > 0, 2.0 * r * p / (r + p)).otherwise(0.0)
    return totals.select(
        "n_matched",
        "n_pred",
        "n_gt",
        F.round(r, 6).alias("recall"),
        F.round(p, 6).alias("precision"),
        F.round(h, 6).alias("hmean"),
    )


# ---------------------------------------------------------------------------
# ATA end-to-end track evaluation (average track accuracy)
# ---------------------------------------------------------------------------
# Reference: demo/videotext/evaluation/evaluate_ata.py (ATA) +
# evaluate_utils.py load_gt_ata/load_pre_ata. Same shipped-data caveat
# as F-score-R: the IC15 gt json is not in the repo, so the published
# 0.6488/0.6258 cannot be re-run; evidence is the quirk fixture vs an
# independent permutation-brute and a shipped-pred self-derived-gt run.

_ATA_VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("video_ata", T.DoubleType()),
    ]
)


def _ata_one_video(pred_pdf: pd.DataFrame, gt_pdf: pd.DataFrame,
                   care_rcg: bool) -> pd.DataFrame:
    """The evaluate_ata.py per-video loop, quirks preserved:

    - the match matrix counts frames with IoU >= 0.5 whose gt bbox is
      not LOW quality and whose gt track is care ('###' rows keep a
      zero match row but still occupy a Hungarian column);
    - with care_rcg the frame only counts when the track's word equals
      the (vocabulary-snapped) gt transcription;
    - Hungarian maximizes the MATCH-COUNT matrix (not IoU);
    - a pair whose gt is '###' counts as a consumed not-care pred iff
      the max SPATIO-TEMPORAL IoU across the pred's whole matrix ROW
      (any gt, not just the matched one) is >= 0.1;
    - per matched care pair: stda += matches / |union of the pred's
      frames and the gt's non-LOW frames| (pred frames matched to a
      LOW gt bbox are excluded from the union);
    - video ATA = stda / ((gt_care + pred_total - notcare_matched)/2).
    """
    from ..functions.assignment import hungarian_max
    from .metrics import _prep_iou, _prep_poly

    pred_pdf, gt_pdf = _seq_sorted(pred_pdf), _seq_sorted(gt_pdf)
    video_id = (
        pred_pdf["video_id"].iloc[0]
        if len(pred_pdf)
        else (gt_pdf["video_id"].iloc[0] if len(gt_pdf) else "")
    )
    voca = []
    if len(gt_pdf) and "words" in gt_pdf.columns:
        wv = gt_pdf["words"].iloc[0]
        if wv is not None and len(wv):
            voca = list(wv)

    def quad(pts):
        return _prep_poly(np.asarray(pts, dtype=np.float64).reshape(4, 2))

    gt_rows = list(gt_pdf.itertuples())
    gt_locs, gt_quality, gt_trans = [], [], []
    gt_notcare = 0
    for r in gt_rows:
        trans = snap_gt_trans(r.trans, voca) if voca else r.trans
        if trans == "###":
            gt_notcare += 1
        locs, qual = {}, {}
        for inst in r.track:
            frame, q, pts = parse_gt_instance(inst)
            locs[frame] = quad(pts)
            qual[frame] = q
        gt_locs.append(locs)
        gt_quality.append(qual)
        gt_trans.append(trans)

    pr_rows = list(pred_pdf.itertuples())
    pr_locs, pr_words = [], []
    for p in pr_rows:
        locs = {}
        for inst in p.track:
            frame, pts, _w = parse_pred_instance(inst)
            locs[frame] = quad(pts)
        pr_locs.append(locs)
        pr_words.append(str(p.text).upper() if p.text is not None else "555")

    tn, gn = len(pr_locs), len(gt_locs)
    if tn == 0 and gn == 0:
        return pd.DataFrame({"video_id": [video_id], "video_ata": [0.0]})
    dim = max(tn, gn, 1)
    match_mat = np.zeros((dim, dim))
    iou_mat = np.zeros((dim, dim))
    for ti in range(tn):
        for gi in range(gn):
            st_iou = 0.0
            matches = 0
            for frame, ppoly in pr_locs[ti].items():
                gpoly = gt_locs[gi].get(frame)
                if gpoly is None:
                    continue
                iou = _prep_iou(ppoly, gpoly)
                st_iou += iou
                if iou >= 0.5 and gt_quality[gi][frame] != "LOW" and gt_trans[gi] != "###":
                    if not care_rcg or pr_words[ti] == gt_trans[gi]:
                        matches += 1
            match_mat[ti, gi] = matches
            iou_mat[ti, gi] = st_iou

    row_ind, col_ind = hungarian_max(match_mat)
    stda = 0.0
    notcare_matched = 0
    for ti, gi in zip(row_ind, col_ind):
        if ti >= tn or gi >= gn:  # imaginary row/column padding
            continue
        if gt_trans[gi] == "###":
            if np.max(iou_mat[ti, :]) >= 0.1:
                notcare_matched += 1
            continue
        gt_frames = [f for f in gt_locs[gi] if gt_quality[gi][f] != "LOW"]
        pr_frames = [
            f
            for f in pr_locs[ti]
            if f not in gt_locs[gi] or gt_quality[gi][f] != "LOW"
        ]
        union = len(set(pr_frames) | set(gt_frames))
        if union > 0:
            stda += float(match_mat[ti, gi]) / union
    denom = (gn - gt_notcare + tn - notcare_matched) / 2.0
    ata = stda / denom if denom > 0 else 0.0
    return pd.DataFrame({"video_id": [video_id], "video_ata": [ata]})


def ata_track_eval(
    pred: DataFrame,
    gt: DataFrame,
    voca: DataFrame | None = None,
    care_rcg: bool = True,
) -> DataFrame:
    """Corpus ATA: per-video Hungarian sequence matching in a
    cogrouped applyInPandas (tracks per video are small; the corpus is
    many videos), then ONE global average — (n_videos, ata). Same
    input schemas as fscore_track_eval."""
    import pyspark.sql.functions as F
    from pyspark.sql.functions import broadcast

    if voca is not None:
        gt = gt.join(broadcast(voca), "video_id", "left")

    def run(key, pred_pdf, gt_pdf):
        return _ata_one_video(pred_pdf, gt_pdf, care_rcg)

    per_video = (
        pred.groupBy("video_id")
        .cogroup(gt.groupBy("video_id"))
        .applyInPandas(run, schema=_ATA_VIDEO_SCHEMA)
    )
    return per_video.agg(
        F.count("*").alias("n_videos"),
        F.round(F.avg("video_ata"), 6).alias("ata"),
    )


# ---------------------------------------------------------------------------
# MOT end-to-end track evaluation (MOTA / MOTP)
# ---------------------------------------------------------------------------
# Reference: demo/videotext/evaluation/evaluate_mot.py + evaluate_utils
# load_gt_mot:251/load_pre_mot:334. Same shipped-data caveat as the
# other two protocols (gt json absent; published 0.7375/0.7171 and
# 0.7394/0.6787 not re-runnable).

_MOT_VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("tp", T.LongType()),
        T.StructField("fp", T.LongType()),
        T.StructField("fn", T.LongType()),
        T.StructField("idsw", T.LongType()),
        T.StructField("n_gt", T.LongType()),
        T.StructField("iou_sum", T.DoubleType()),
    ]
)


def _mot_one_video(pred_pdf: pd.DataFrame, gt_pdf: pd.DataFrame,
                   care_rcg: bool) -> pd.DataFrame:
    """The evaluate_mot.py per-video frame loop, quirks preserved:

    - per-INSTANCE care: 0 when the (snapped) track trans is '###', the
      instance's own trans field is '###' or shorter than 3 chars, or
      the instance quality is LOW;
    - frames with neither preds nor gts RESET the identity mapping
      (premapping = {});
    - per-frame Hungarian maximizes the IoU matrix; pads to square —
      imaginary-track matches on care gts are FN, imaginary-gt matches
      are FP;
    - TP needs IoU STRICTLY > 0.5 (and word equality under care_rcg,
      else the pair counts FP); care-0 pairs count FP only under
      IoU < 0.1; id switches compare against the inherited mapping;
    - when a frame has gts but NO mapped pairs, the previous mapping
      carries over wholesale; gt ids present in the frame but unmapped
      inherit their previous track id."""
    from ..functions.assignment import hungarian_max
    from .metrics import _prep_iou, _prep_poly

    pred_pdf, gt_pdf = _seq_sorted(pred_pdf), _seq_sorted(gt_pdf)
    video_id = (
        pred_pdf["video_id"].iloc[0]
        if len(pred_pdf)
        else (gt_pdf["video_id"].iloc[0] if len(gt_pdf) else "")
    )
    voca = []
    if len(gt_pdf) and "words" in gt_pdf.columns:
        wv = gt_pdf["words"].iloc[0]
        if wv is not None and len(wv):
            voca = list(wv)

    def quad(pts):
        return _prep_poly(np.asarray(pts, dtype=np.float64).reshape(4, 2))

    start_f, end_f = 10**7, -1
    gt_frame_boxes: dict[int, list] = {}  # frame -> [(gt_id, prep)]
    gt_frame_care: dict[int, list] = {}   # frame -> [care]
    gt_trans: dict[str, str] = {}
    for r in gt_pdf.itertuples():
        trans = snap_gt_trans(r.trans, voca) if voca else r.trans
        gt_trans[r.gt_id] = trans
        for inst in r.track:
            frame = int(inst.split(",", 2)[0])
            inst_trans = inst.split(",", 1)[1].rsplit(",", 2)[0]
            quality = inst.rsplit(",", 2)[-2]
            pts = [int(v) for v in inst.rsplit(",", 2)[-1].split("_")[:8]]
            start_f, end_f = min(start_f, frame), max(end_f, frame)
            care = 0 if (
                trans == "###" or inst_trans == "###" or quality == "LOW"
                or len(inst_trans) < 3
            ) else 1
            gt_frame_boxes.setdefault(frame, []).append((r.gt_id, quad(pts)))
            gt_frame_care.setdefault(frame, []).append(care)

    pr_frame_boxes: dict[int, list] = {}  # frame -> [(track_id, prep)]
    pr_words: dict[str, str] = {}
    for p in pred_pdf.itertuples():
        word = str(p.text).upper() if p.text is not None else "555"
        pr_words[p.track_id] = word
        # two-phase like load_pre_mot: per-track dict first (last
        # instance per frame wins), THEN one append per frame in track
        # order — a mid-track duplicate frame must not move the box to
        # the end of the frame's row list (Hungarian row order)
        per_frame: dict[int, list] = {}
        for inst in p.track:
            frame, pts, _w = parse_pred_instance(inst)
            per_frame[frame] = pts
        for frame, pts in per_frame.items():
            pr_frame_boxes.setdefault(frame, []).append(
                (p.track_id, quad(pts))
            )

    tp = fp = fn = idsw = n_gt = 0
    iou_sum = 0.0
    premapping: dict[str, str] = {}
    for frame in range(start_f, end_f + 1) if end_f >= start_f else []:
        trk = pr_frame_boxes.get(frame, [])
        gts = gt_frame_boxes.get(frame, [])
        cares = gt_frame_care.get(frame, [])
        if not trk and not gts:
            premapping = {}
            continue
        n_gt += sum(cares)
        tn, gn = len(trk), len(gts)
        dim = max(tn, gn)
        iou_mat = np.zeros((dim, dim))
        for ti in range(tn):
            for gi in range(gn):
                iou_mat[ti, gi] = _prep_iou(trk[ti][1], gts[gi][1])
        row_ind, col_ind = hungarian_max(iou_mat)
        mapping: dict[str, str] = {}
        mapped_iou: dict[str, float] = {}
        mapped_care: dict[str, int] = {}
        for ti, gi in zip(row_ind, col_ind):
            if ti >= tn:  # imaginary track -> FN on care gts
                if cares[gi] == 1:
                    fn += 1
                continue
            if gi >= gn:  # imaginary gt -> FP
                fp += 1
                continue
            gt_id = gts[gi][0]
            mapping[gt_id] = trk[ti][0]
            mapped_iou[gt_id] = float(iou_mat[ti, gi])
            mapped_care[gt_id] = cares[gi]

        def judge(check_switch: bool):
            nonlocal tp, fp, idsw, iou_sum
            for gt_id, track_id in mapping.items():
                if mapped_care[gt_id] == 1:
                    if mapped_iou[gt_id] > 0.5:
                        if care_rcg:
                            if gt_trans[gt_id] == pr_words[track_id]:
                                tp += 1
                                iou_sum += mapped_iou[gt_id]
                            else:
                                fp += 1
                        else:
                            tp += 1
                            iou_sum += mapped_iou[gt_id]
                        if check_switch and gt_id in premapping and \
                                premapping[gt_id] != track_id:
                            idsw += 1
                    else:
                        fp += 1
                else:
                    if mapped_iou[gt_id] < 0.1:
                        fp += 1

        if mapping and premapping:
            judge(check_switch=True)
        elif mapping:
            judge(check_switch=False)
        elif premapping:
            mapping = premapping
        for gt_id, _prep in gts:
            if gt_id not in mapping and gt_id in premapping:
                mapping[gt_id] = premapping[gt_id]
        premapping = mapping

    return pd.DataFrame(
        {
            "video_id": [video_id],
            "tp": [tp], "fp": [fp], "fn": [fn], "idsw": [idsw],
            "n_gt": [n_gt], "iou_sum": [iou_sum],
        }
    )


def mot_track_eval(
    pred: DataFrame,
    gt: DataFrame,
    voca: DataFrame | None = None,
    care_rcg: bool = True,
) -> DataFrame:
    """Corpus MOTA/MOTP: per-video frame-sequential matching in a
    cogrouped applyInPandas, then ONE global aggregation —
    (tp, fp, fn, idsw, n_gt, motp, mota). Same input schemas as the
    other two protocols."""
    import pyspark.sql.functions as F
    from pyspark.sql.functions import broadcast

    if voca is not None:
        gt = gt.join(broadcast(voca), "video_id", "left")

    def run(key, pred_pdf, gt_pdf):
        return _mot_one_video(pred_pdf, gt_pdf, care_rcg)

    per_video = (
        pred.groupBy("video_id")
        .cogroup(gt.groupBy("video_id"))
        .applyInPandas(run, schema=_MOT_VIDEO_SCHEMA)
    )
    tot = per_video.agg(
        F.sum("tp").alias("tp"),
        F.sum("fp").alias("fp"),
        F.sum("fn").alias("fn"),
        F.sum("idsw").alias("idsw"),
        F.sum("n_gt").alias("n_gt"),
        F.sum("iou_sum").alias("iou_sum"),
    )
    return tot.select(
        "tp", "fp", "fn", "idsw", "n_gt",
        F.round(
            F.when(F.col("tp") > 0, F.col("iou_sum") / F.col("tp")).otherwise(0.0), 6
        ).alias("motp"),
        F.round(
            F.when(
                F.col("n_gt") > 0,
                1.0 - (F.col("fn") + F.col("fp") + F.col("idsw")) / F.col("n_gt"),
            ).otherwise(1.0),
            6,
        ).alias("mota"),
    )
