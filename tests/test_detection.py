"""Goldens for the EAST decode kernel (restore formulas
east_postprocess.cpp:610-627, LANMS :408-458, NMS :462-510)."""

import numpy as np
import pytest

from davar_lab_ocr_spark.operators.detection import (
    _lanms,
    _restore_quads,
    east_decode_py,
    make_east_fixture,
)


def test_rbox_restore_formula():
    # single pixel at (h=2, w=3), pool 4 -> center (12, 8); angle 0
    h, w = 4, 4
    score = np.zeros((h, w))
    score[2, 3] = 0.9
    geo = np.zeros((5, h, w))
    geo[:, 2, 3] = [3.0, 5.0, 2.0, 4.0, 0.0]  # up right down left angle
    quads, scores = _restore_quads(score.ravel(), geo.ravel(), h, w, "RBOX", 4, 0.8)
    assert len(quads) == 1 and scores[0] == pytest.approx(0.9)
    # x=12, y=8: x1=12-left=8, y1=8-up=5; x2=12+right=17, y2=5; x3=17, y3=8+down=10; x4=8, y4=10
    assert quads[0].tolist() == pytest.approx([8, 5, 17, 5, 17, 10, 8, 10])


def test_rbox_restore_with_angle():
    h, w = 2, 2
    score = np.zeros((h, w))
    score[0, 0] = 1.0
    geo = np.zeros((5, h, w))
    up, right, down, left, ang = 2.0, 3.0, 2.0, 3.0, 0.3
    geo[:, 0, 0] = [up, right, down, left, ang]
    quads, _ = _restore_quads(score.ravel(), geo.ravel(), h, w, "RBOX", 4, 0.5)
    s, c = np.sin(ang), np.cos(ang)
    want = [
        0 - up * s - left * c, 0 - up * c + left * s,
        0 - up * s + right * c, 0 - up * c - right * s,
        0 + down * s + right * c, 0 + down * c - right * s,
        0 + down * s - left * c, 0 + down * c + left * s,
    ]
    assert quads[0].tolist() == pytest.approx(want)


def test_quad_restore_formula():
    h, w = 3, 3
    score = np.zeros((h, w))
    score[1, 1] = 0.95
    geo = np.zeros((8, h, w))
    geo[:, 1, 1] = [-1, -2, 3, -2, 3, 4, -1, 4]
    quads, _ = _restore_quads(score.ravel(), geo.ravel(), h, w, "QUAD", 4, 0.8)
    # base (4, 4) + offsets
    assert quads[0].tolist() == pytest.approx([3, 2, 7, 2, 7, 8, 3, 8])


def test_lanms_merges_identical_and_accumulates_score():
    q = np.array([[0, 0, 10, 0, 10, 5, 0, 5]] * 3, dtype=float)
    s = np.array([0.9, 0.8, 0.7])
    out_q, out_s = _lanms(q, s, 0.2)
    assert len(out_q) == 1
    assert out_q[0].tolist() == pytest.approx([0, 0, 10, 0, 10, 5, 0, 5])
    assert out_s[0] == pytest.approx(2.4)  # sum-of-scores quirk preserved


def test_lanms_keeps_disjoint():
    q = np.array(
        [[0, 0, 10, 0, 10, 5, 0, 5], [100, 0, 110, 0, 110, 5, 100, 5]], dtype=float
    )
    s = np.array([0.9, 0.8])
    out_q, out_s = _lanms(q, s, 0.2)
    assert len(out_q) == 2


def test_east_decode_recovers_planted_rectangles():
    for d in range(6):
        for mode in ("RBOX", "QUAD"):
            row, golden = make_east_fixture(d, mode=mode)
            dets = east_decode_py(
                row["score_map"], row["geo_map"], row["h"], row["w"], mode,
                row["scale_factor"],
            )
            assert len(dets) == len(golden)
            got = sorted(q for q, _c in dets)
            want = sorted([float(v) for v in q] for q, _n in golden)
            for g, w_ in zip(got, want):
                assert g == pytest.approx(w_, abs=1e-6)
            # merged confidence = 0.9 * n_pixels of the planted box
            confs = sorted(c for _q, c in dets)
            want_confs = sorted(0.9 * n for _q, n in golden)
            assert confs == pytest.approx(want_confs)


def test_east_decode_scale_factor():
    row, golden = make_east_fixture(1, mode="RBOX")
    dets = east_decode_py(
        row["score_map"], row["geo_map"], row["h"], row["w"], "RBOX", 2.0
    )
    got = sorted(q for q, _c in dets)
    want = sorted([v / 2.0 for v in q] for q, _n in golden)
    for g, w_ in zip(got, want):
        assert g == pytest.approx(w_)


def test_east_stage_spark(spark):
    from davar_lab_ocr_spark.operators.detection import east_decode_stage
    from davar_lab_ocr_spark.schemas import DET_MAPS

    rows, goldens = [], {}
    for d in range(8):
        row, golden = make_east_fixture(d, mode="RBOX" if d % 2 else "QUAD")
        rows.append(row)
        goldens[row["doc_id"]] = golden
    out = east_decode_stage(spark.createDataFrame(rows, schema=DET_MAPS)).collect()
    assert len(out) == 8
    for r in out:
        want = goldens[r["doc_id"]]
        assert len(r["quads"]) == len(want)
        got = sorted(tuple(round(p, 4) for p in q["points"]) for q in r["quads"])
        expect = sorted(tuple(float(v) for v in q) for q, _n in want)
        assert got == expect
