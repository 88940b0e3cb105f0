"""Generate committed expected-output parquet fixtures for the driver's
DuckDB oracle.

Each fixture is derived WITHOUT running the Spark pipeline:

- expected_flagship / expected_resume / expected_fullchain: the pure-
  python span oracles that the corpus/fixture generators compute
  alongside the raw inputs (corpus.py gen_doc / full_chain.py
  make_fullchain_fixture) — a genuinely independent second
  implementation of the extraction semantics.
- expected_east: the planted golden quads from make_east_fixture
  (decode must reproduce them exactly; conf = 0.9 * n_pixels by LANMS
  score accumulation) — independent of the decode kernel.
- expected_tp: a LOCAL single-process replay of tp_decode_py on the
  fixture maps. The kernel itself is pinned by hand-derived goldens in
  tests/test_tp_decode.py; this fixture additionally pins the
  distributed Arrow stage to the pinned kernel (plumbing + determinism
  check, not an independent re-derivation — documented as such).

Outputs land in tests/fixtures/*.parquet and are committed; oracle_sql()
reads them via read_parquet(). Re-run this script if a fixture
generator changes (fixtures are deterministic).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "fixtures")


def _write_spans(expected_rows, path):
    """Explode expected documents rows -> scalar span rows."""
    recs = {"doc_id": [], "offset": [], "kind": [], "text": [], "media_ref": []}
    for row in expected_rows:
        for s in row["spans"]:
            recs["doc_id"].append(row["doc_id"])
            recs["offset"].append(s["offset"])
            recs["kind"].append(s["kind"])
            recs["text"].append(s["text"])
            recs["media_ref"].append(s["media_ref"])
    tbl = pa.table(
        {
            "doc_id": pa.array(recs["doc_id"], pa.string()),
            "offset": pa.array(recs["offset"], pa.int32()),
            "kind": pa.array(recs["kind"], pa.string()),
            "text": pa.array(recs["text"], pa.string()),
            "media_ref": pa.array(recs["media_ref"], pa.string()),
        }
    )
    pq.write_table(tbl, path)
    print(f"{path}: {tbl.num_rows} rows")


def main():
    os.makedirs(FIXDIR, exist_ok=True)

    from davar_lab_ocr_spark.corpus import make_raw_corpus

    # flagship: same params as __spark_entry__.entry()
    _, expected = make_raw_corpus(200, seed=7, giant_every=97, giant_size=600)
    _write_spans(expected, os.path.join(FIXDIR, "expected_flagship.parquet"))

    # resumable_extract: same params as the query (60 docs, seed 19)
    _, expected = make_raw_corpus(60, seed=19, giant_every=0)
    _write_spans(expected, os.path.join(FIXDIR, "expected_resume.parquet"))

    # full_chain_extract: same params as the query (40 docs, seed 83)
    from davar_lab_ocr_spark.plans.full_chain import make_fullchain_fixture

    _, expected = make_fullchain_fixture(40, seed=83)
    _write_spans(expected, os.path.join(FIXDIR, "expected_fullchain.parquet"))

    # east_decode: planted golden quads, query fixture params (40 docs)
    from davar_lab_ocr_spark.operators.detection import make_east_fixture

    recs = {"doc_id": [], **{c: [] for c in
            ("x0", "y0", "x1", "y1", "x2", "y2", "x3", "y3")}, "conf": []}
    for d in range(40):
        row, golden = make_east_fixture(d, mode="RBOX" if d % 2 else "QUAD")
        for quad, n_pix in golden:
            recs["doc_id"].append(row["doc_id"])
            for i, c in enumerate(("x0", "y0", "x1", "y1", "x2", "y2", "x3", "y3")):
                recs[c].append(float(round(quad[i], 4)))
            recs["conf"].append(float(round(0.9 * n_pix, 4)))
    tbl = pa.table({k: pa.array(v, pa.string() if k == "doc_id" else pa.float64())
                    for k, v in recs.items()})
    pq.write_table(tbl, os.path.join(FIXDIR, "expected_east.parquet"))
    print(f"expected_east.parquet: {tbl.num_rows} rows")

    # mask_rcnn_decode: planted seg-map rectangles (independent golden)
    from davar_lab_ocr_spark.operators.spotting import make_seg_fixture

    recs = {"doc_id": [], "x0": [], "y0": [], "x1": [], "y1": [], "area": []}
    for d in range(40):
        row, golden = make_seg_fixture(d)
        for x0, y0, x1, y1, n_pix in golden:
            recs["doc_id"].append(row["doc_id"])
            recs["x0"].append(float(x0))
            recs["y0"].append(float(y0))
            recs["x1"].append(float(x1))
            recs["y1"].append(float(y1))
            recs["area"].append(n_pix)
    tbl = pa.table(
        {
            "doc_id": pa.array(recs["doc_id"], pa.string()),
            "x0": pa.array(recs["x0"], pa.float64()),
            "y0": pa.array(recs["y0"], pa.float64()),
            "x1": pa.array(recs["x1"], pa.float64()),
            "y1": pa.array(recs["y1"], pa.float64()),
            "area": pa.array(recs["area"], pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(FIXDIR, "expected_seg.parquet"))
    print(f"expected_seg.parquet: {tbl.num_rows} rows")

    # tp_decode: local kernel replay on the query's fixture rows
    from davar_lab_ocr_spark.operators.tp_decode import make_tp_fixture, tp_decode_py

    recs = {"doc_id": [], "inst": [], "points": []}
    for i in range(20):
        fx = make_tp_fixture(16, 16, 64 + 4 * (i % 5), 32)
        for inst, poly in enumerate(tp_decode_py(**fx)):
            recs["doc_id"].append(f"tp-{i}")
            recs["inst"].append(inst)
            recs["points"].append(",".join(str(int(v)) for v in poly))
    tbl = pa.table(
        {
            "doc_id": pa.array(recs["doc_id"], pa.string()),
            "inst": pa.array(recs["inst"], pa.int32()),
            "points": pa.array(recs["points"], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(FIXDIR, "expected_tp.parquet"))
    print(f"expected_tp.parquet: {tbl.num_rows} rows")

    # ----- LOCAL KERNEL REPLAYS (pin the distributed stage to the
    # hand-golden-tested single-process kernel; weaker than independent
    # derivation — documented) ------------------------------------------
    import __spark_entry__ as E

    # det_hmean_fixture: replay the greedy matcher + corpus aggregation;
    # the ave_precision replay is a SINGLE-NODE sort — an independent
    # derivation of the distributed two-phase ranked cumsum's answer
    from davar_lab_ocr_spark.operators.metrics import _greedy_match, _match_one_doc

    m = d = g = 0
    tg = td = 0.0
    det_rows = []  # (conf, tid, matched)
    for row in E._eval_fixture_rows():
        r = _match_one_doc(row["doc_id"], row["pred"], row["gt"])
        m += r["matched"]
        d += r["care_det"]
        g += r["care_gt"]
        tg += r["matched_tiou_gt"]
        td += r["matched_tiou_dt"]
        mpairs, _dg, dontcare_det, _gp, _dp = _greedy_match(row["pred"], row["gt"])
        matched_dets = {j for _, j in mpairs}
        for j, det in enumerate(row["pred"]):
            if j not in dontcare_det:
                det_rows.append(
                    (float(det["conf"]), f"{row['doc_id']}#{j}", int(j in matched_dets))
                )
    det_rows.sort(key=lambda t: (-t[0], t[1]))
    cum = 0
    ap_sum = 0.0
    for rank, (_c, _t, mm) in enumerate(det_rows, start=1):
        cum += mm
        if mm:
            ap_sum += cum / rank
    ap = round(ap_sum / max(g, 1), 6)
    p, rr = (m / d if d else 0.0), (m / g if g else 0.0)
    h = 2 * p * rr / (p + rr) if p + rr > 0 else 0.0
    tp, trc = (td / d if d else 0.0), (tg / g if g else 0.0)
    th = 2 * tp * trc / (tp + trc) if tp + trc > 0 else 0.0
    tbl = pa.table(
        {
            "precision": pa.array([round(p, 6)], pa.float64()),
            "recall": pa.array([round(rr, 6)], pa.float64()),
            "hmean": pa.array([round(h, 6)], pa.float64()),
            "ave_precision": pa.array([ap], pa.float64()),
            "tiou_precision": pa.array([round(tp, 6)], pa.float64()),
            "tiou_recall": pa.array([round(trc, 6)], pa.float64()),
            "tiou_hmean": pa.array([round(th, 6)], pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(FIXDIR, "expected_det_hmean.parquet"))
    print(f"expected_det_hmean.parquet: {tbl.num_rows} rows")

    # e2e_hmean_fixture: replay in both modes
    from davar_lab_ocr_spark.operators.metrics import _e2e_match_one_doc

    out = {"mode": [], "det_precision": [], "det_recall": [], "det_hmean": [],
           "spot_precision": [], "spot_recall": [], "spot_hmean": []}
    for mode, spotting in (("e2e", False), ("word_spotting", True)):
        md = ms = dd = gg = 0
        for row in E._e2e_fixture_rows():
            r = _e2e_match_one_doc(row["doc_id"], row["pred"], row["gt"], word_spotting=spotting)
            md += r["matched_det"]
            ms += r["matched_spot"]
            dd += r["care_det"]
            gg += r["care_gt"]
        for prefix, mm in (("det", md), ("spot", ms)):
            p = mm / dd if dd else 0.0
            rr = mm / gg if gg else 0.0
            h = 2 * p * rr / (p + rr) if p + rr > 0 else 0.0
            out[f"{prefix}_precision"].append(round(p, 6))
            out[f"{prefix}_recall"].append(round(rr, 6))
            out[f"{prefix}_hmean"].append(round(h, 6))
        out["mode"].append(mode)
    tbl = pa.table({k: pa.array(v, pa.string() if k == "mode" else pa.float64())
                    for k, v in out.items()})
    pq.write_table(tbl, os.path.join(FIXDIR, "expected_e2e_hmean.parquet"))
    print(f"expected_e2e_hmean.parquet: {tbl.num_rows} rows")

    # teds_metric: replay teds_score on the query's pair construction
    from davar_lab_ocr_spark.functions.trees import teds_score

    raw_rows, expected_rows = make_raw_corpus(60, seed=37, giant_every=0)
    pairs = []
    for exp in expected_rows:
        for s in exp["spans"]:
            if s["kind"] == "table":
                html = s["text"]
                pred = html if len(pairs) % 3 else html.replace(
                    "</td></tr></tbody>", "x</td></tr></tbody>")
                pairs.append((f"{exp['doc_id']}#{s['offset']}", pred, html))
    tbl = pa.table(
        {
            "doc_id": pa.array([p[0] for p in pairs], pa.string()),
            "teds": pa.array([round(teds_score(p[1], p[2]), 6) for p in pairs], pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(FIXDIR, "expected_teds.parquet"))
    print(f"expected_teds.parquet: {tbl.num_rows} rows")

    # tree_f1_metric: replay tree_f1 on the query's edge fixture
    import numpy as np

    from davar_lab_ocr_spark.functions.trees import tree_f1

    rng = np.random.default_rng(53)
    recs = {"doc_id": [], "recall": [], "precision": [], "f1": []}
    for t in range(40):
        n = int(rng.integers(4, 9))
        edges = [{"src": 0, "dst": 1, "rel": 1}, {"src": 0, "dst": 2, "rel": 2}]
        for v in range(3, n):
            edges.append({"src": int(rng.integers(1, 3)), "dst": v, "rel": 1})
        pred = edges if t % 4 else edges[:-1]

        def mat(es):
            mm = np.zeros((n, n), dtype=np.int64)
            for e in es:
                mm[e["src"]][e["dst"]] = e["rel"]
            return mm

        r_, p_, f_ = tree_f1(mat(edges), mat(pred), "soft")
        recs["doc_id"].append(f"tbl-{t}")
        recs["recall"].append(round(r_, 6))
        recs["precision"].append(round(p_, 6))
        recs["f1"].append(round(f_, 6))
    tbl = pa.table({k: pa.array(v, pa.string() if k == "doc_id" else pa.float64())
                    for k, v in recs.items()})
    pq.write_table(tbl, os.path.join(FIXDIR, "expected_tree_f1.parquet"))
    print(f"expected_tree_f1.parquet: {tbl.num_rows} rows")

    # media_transform: replay fetch -> decode -> crop -> resize
    import hashlib

    from davar_lab_ocr_spark.functions.image import crop_and_transform, resize_bilinear
    from davar_lab_ocr_spark.operators.multimodal import fake_payload, payload_to_array

    recs = {"media_ref": [], "t_height": [], "t_width": [], "t_mean": [], "t_digest": []}
    quad = [4.0, 4.0, 28.0, 6.0, 27.0, 20.0, 3.0, 18.0]
    for doc_id in range(100):
        ref = f"media://doc/{doc_id}.png"
        img = payload_to_array(fake_payload(ref))
        buf = np.ascontiguousarray(
            np.round(resize_bilinear(crop_and_transform(img, quad), 32, 100)).astype(np.uint8)
        )
        recs["media_ref"].append(ref)
        recs["t_height"].append(32)
        recs["t_width"].append(100)
        recs["t_mean"].append(round(float(buf.mean()), 6))
        recs["t_digest"].append(hashlib.md5(buf.tobytes()).hexdigest())
    tbl = pa.table(
        {
            "media_ref": pa.array(recs["media_ref"], pa.string()),
            "t_height": pa.array(recs["t_height"], pa.int32()),
            "t_width": pa.array(recs["t_width"], pa.int32()),
            "t_mean": pa.array(recs["t_mean"], pa.float64()),
            "t_digest": pa.array(recs["t_digest"], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(FIXDIR, "expected_media_transform.parquet"))
    print(f"expected_media_transform.parquet: {tbl.num_rows} rows")

    # lmdb_scan: expected rows derive STRAIGHT from the deterministic
    # generator dict — no lmdb writer/parser involved — so the query's
    # green row proves the store roundtrip preserves bytes exactly
    import hashlib as _hl

    from davar_lab_ocr_spark.sources.lmdb_format import make_lmdb_fixture_items

    lm_items = make_lmdb_fixture_items()
    ids, labels, md5s = [], [], []
    for k, v in lm_items.items():
        ks = k.decode()
        if ks.startswith("image-"):
            ids.append(int(ks[6:]))
            md5s.append(_hl.md5(v).hexdigest())
            labels.append(lm_items[b"label-%09d" % int(ks[6:])].decode())
    tbl = pa.table(
        {
            "sample_id": pa.array(ids, pa.int64()),
            "label": pa.array(labels, pa.string()),
            "img_md5": pa.array(md5s, pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(FIXDIR, "expected_lmdb.parquet"))
    print(f"expected_lmdb.parquet: {tbl.num_rows} rows")

    # session_tracks INPUT rows (the oracle itself is derived in SQL by
    # DuckDB — an independent engine-level sessionization; we only
    # commit the deterministic input)
    from davar_lab_ocr_spark.operators.video import make_track_fixture

    rows15, _ = make_track_fixture(15, seed=47)
    tbl = pa.table(
        {
            "video_id": pa.array([r["video_id"] for r in rows15], pa.string()),
            "track_id": pa.array([r["track_id"] for r in rows15], pa.int64()),
            "frame_id": pa.array([r["frame_id"] for r in rows15], pa.int64()),
            "text": pa.array([r["text"] for r in rows15], pa.string()),
            "score": pa.array([r["score"] for r in rows15], pa.float64()),
        }
    )
    pq.write_table(tbl, os.path.join(FIXDIR, "fixture_track_events.parquet"))
    print(f"fixture_track_events.parquet: {tbl.num_rows} rows")

    # track_merge: local replay of the per-video union-find merge
    import pandas as pd

    from davar_lab_ocr_spark.operators.video import merge_video_tracks

    rows20, _ = make_track_fixture(20, seed=41)
    pdf = pd.DataFrame(rows20)
    merged = pd.concat(
        [merge_video_tracks(g) for _, g in pdf.groupby("video_id")], ignore_index=True
    )
    merged["score"] = merged["score"].round(6)
    pq.write_table(pa.Table.from_pandas(merged, preserve_index=False),
                   os.path.join(FIXDIR, "expected_track_merge.parquet"))
    print(f"expected_track_merge.parquet: {len(merged)} rows")

    # ner_decode: local replay of CRF viterbi + BIO span extraction on
    # the query's deterministic emissions
    from davar_lab_ocr_spark.operators.ner import bio_decode_py, viterbi_decode_py

    types = ["PER", "LOC", "ORG"]
    vocab = ["O"] + [f"{p}-{t}" for t in types for p in ("B", "I")]
    k = len(vocab)
    tr = np.zeros((k, k))
    st = np.zeros(k)
    for j, tag in enumerate(vocab):
        if tag.startswith("I-"):
            st[j] = -8.0
            for i, prev in enumerate(vocab):
                if prev == "O" or (prev[2:] != tag[2:] and prev != "O"):
                    tr[i, j] = -8.0
            tr[vocab.index("B-" + tag[2:]), j] = 1.0
            tr[vocab.index("I-" + tag[2:]), j] = 1.0
    rng = np.random.default_rng(59)
    recs = {"doc_id": [], "etype": [], "start": [], "end": []}
    for d in range(200):
        n = int(rng.integers(3, 20))
        em = rng.normal(0.0, 2.0, size=(n, k))
        tags = [vocab[t] for t in viterbi_decode_py(em, tr, st, np.zeros(k))]
        for etype, s, e in bio_decode_py(tags):
            recs["doc_id"].append(f"ner-{d}")
            recs["etype"].append(etype)
            recs["start"].append(s)
            recs["end"].append(e)
    tbl = pa.table(
        {
            "doc_id": pa.array(recs["doc_id"], pa.string()),
            "etype": pa.array(recs["etype"], pa.string()),
            "start": pa.array(recs["start"], pa.int32()),
            "end": pa.array(recs["end"], pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(FIXDIR, "expected_ner.parquet"))
    print(f"expected_ner.parquet: {tbl.num_rows} rows")

    # pointer_reading_order: local replay of the greedy pointer decode
    from davar_lab_ocr_spark.operators.ordering import pointer_order_py

    raw_rows, _ = make_raw_corpus(40, seed=17, giant_every=0)
    recs = {"doc_id": [], "region_id": [], "order_pred": []}
    for row in raw_rows:
        boxes = np.asarray([[r["bbox"][0], r["bbox"][1]] for r in row["regions"]])
        order = pointer_order_py(boxes)
        for rid, o in enumerate(order):
            recs["doc_id"].append(row["doc_id"])
            recs["region_id"].append(rid)
            recs["order_pred"].append(o)
    tbl = pa.table(
        {
            "doc_id": pa.array(recs["doc_id"], pa.string()),
            "region_id": pa.array(recs["region_id"], pa.int32()),
            "order_pred": pa.array(recs["order_pred"], pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(FIXDIR, "expected_pointer_order.parquet"))
    print(f"expected_pointer_order.parquet: {tbl.num_rows} rows")

    # table_html_recovery: local replay of the LGPMA structure chain
    from davar_lab_ocr_spark.operators.table import recover_table_html

    raw_rows, _ = make_raw_corpus(80, seed=13, giant_every=0)
    recs = {"doc_id": [], "pos": [], "html": []}
    for row in raw_rows:
        for pos, r in enumerate(row["regions"]):
            if r["mode"] == "table":
                recs["doc_id"].append(row["doc_id"])
                recs["pos"].append(pos)
                recs["html"].append(recover_table_html(r["cell_bboxes"], r["cell_texts"]))
    tbl = pa.table(
        {
            "doc_id": pa.array(recs["doc_id"], pa.string()),
            "pos": pa.array(recs["pos"], pa.int32()),
            "html": pa.array(recs["html"], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(FIXDIR, "expected_table_html.parquet"))
    print(f"expected_table_html.parquet: {tbl.num_rows} rows")


if __name__ == "__main__":
    main()


def make_pointer_weights(path=None):
    """Seeded weight fixture for pointer_order_nn: a hand-constructed
    parameter set whose decode policy is COLUMN-MAJOR reading order
    (score ~ -(10x + y)), plus seeded sub-1e-3 noise. The f-gate bias
    is large-negative (forget the pooled init state) and i/o large-
    positive, so the hidden state — and hence the query — is constant
    across steps and the ranking is the static key score. Demonstrates
    the injectable-weights contract end-to-end: the LEARNED path beats
    the deterministic proximity scorer on two-column layouts
    (tests/test_layout.py::test_pointer_weights_fixture_beats_heuristic).
    """
    import numpy as np

    rng = np.random.default_rng(42)
    noise = lambda *shape: rng.uniform(-1e-3, 1e-3, size=shape)
    H, I = 2, 2
    big = 8.0
    b_ih = np.concatenate([
        np.full(H, big),    # i -> 1
        np.full(H, -big),   # f -> 0 (drop pooled-init cell state)
        np.array([1.0, 0.0]),  # g: tanh -> (0.76, 0)
        np.full(H, big),    # o -> 1
    ])
    weights = {
        "w_ih": noise(4 * H, I),
        "w_hh": noise(4 * H, H),
        "b_ih": b_ih + noise(4 * H),
        "b_hh": noise(4 * H),
        "w_key": np.array([[-10.0, -1.0], [0.0, 0.0]]) + noise(H, 2),
        "b_key": noise(H),
        "w_query": np.eye(H) + noise(H, H),
        "b_query": noise(H),
        "decoder_init": noise(I),
        "hidden_init": noise(H),
    }
    out = path or os.path.join(FIXDIR, "pointer_weights.npz")
    np.savez(out, **weights)
    return out
