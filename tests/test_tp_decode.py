"""Goldens for the Text Perceptron fiducial-point decode
(tp_points_generate.cpp semantics on planted rectangles)."""

import numpy as np
import pytest

from davar_lab_ocr_spark.operators.tp_decode import (
    make_tp_fixture,
    tp_decode_py,
    tp_decode_stage,
)



def test_tp_decode_recovers_planted_rect():
    fx = make_tp_fixture()
    polys = tp_decode_py(**fx)
    assert len(polys) == 1
    pts = polys[0]
    assert len(pts) == 28  # 14 fiducial points
    xs, ys = pts[0::2], pts[1::2]
    # corners: [0]=TL, [6]=TR, [7]=BR, [13]=BL
    assert (xs[0], ys[0]) == (16, 16)
    assert (xs[6], ys[6]) == (80, 16)
    assert (xs[7], ys[7]) == (80, 32)
    assert (xs[13], ys[13]) == (16, 32)
    # top edge flat at y0, left->right; bottom edge flat at y1, right->left
    assert all(y == 16 for y in ys[0:7])
    assert all(y == 32 for y in ys[7:14])
    assert xs[0:7] == sorted(xs[0:7])
    assert xs[7:14] == sorted(xs[7:14], reverse=True)


def test_tp_decode_scale_factor():
    fx = make_tp_fixture(scale_factor=2.0)
    pts = tp_decode_py(**fx)[0]
    assert (pts[0], pts[1]) == (8, 8)
    assert (pts[12], pts[13]) == (40, 8)


def test_tp_filters():
    # no boundary pixels at all -> filter_ratio kills the instance
    fx = make_tp_fixture()
    fx["score_bond"] = [0.0] * len(fx["score_bond"])
    assert tp_decode_py(**fx) == []
    # no tail region -> filtered
    fx = make_tp_fixture()
    fx["score_tail"] = [0.0] * len(fx["score_tail"])
    assert tp_decode_py(**fx) == []


def test_tp_two_instances():
    a = make_tp_fixture(16, 16, 80, 32, h=30, w=28)
    b = make_tp_fixture(16, 72, 80, 88, h=30, w=28)
    merged = dict(a)
    for k in ("score_text", "score_head", "score_tail", "score_bond",
              "geo_head", "geo_tail", "geo_bond"):
        merged[k] = (np.asarray(a[k]) + np.asarray(b[k])).tolist()
    polys = tp_decode_py(**merged)
    assert len(polys) == 2
    tops = sorted(p[1] for p in polys)
    assert tops == [16, 72]


def test_tp_stage_spark(spark):
    rows = [dict(make_tp_fixture(), doc_id=f"tp-{i}") for i in range(6)]
    schema = (
        "doc_id string, score_text array<double>, score_head array<double>, "
        "score_tail array<double>, score_bond array<double>, geo_head array<double>, "
        "geo_tail array<double>, geo_bond array<double>, h int, w int, scale_factor double"
    )
    out = tp_decode_stage(spark.createDataFrame(rows, schema)).collect()
    assert len(out) == 6
    for r in out:
        assert len(r["polys"]) == 1 and len(r["polys"][0]) == 28
