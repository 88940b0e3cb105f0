"""Direct goldens for convex polygon IoU (used by hmean matching and
EAST LANMS/NMS). The intersection is a hand-rolled Sutherland-Hodgman
clip (no shapely in the environment)."""

import numpy as np
import pytest

from davar_lab_ocr_spark.functions.geometry import (
    convex_poly_intersection_area,
    poly_area,
    poly_iou,
)


def test_poly_area_shoelace():
    assert poly_area([[0, 0], [10, 0], [10, 5], [0, 5]]) == pytest.approx(50)
    assert poly_area([[0, 0], [4, 0], [0, 3]]) == pytest.approx(6)


def test_poly_iou_identical_and_near_identical():
    q = np.array([0, 0, 10, 0, 10, 5, 0, 5], dtype=float)
    assert poly_iou(q, q) == pytest.approx(1.0)
    assert poly_iou(q, q * (1 + 1e-15)) == pytest.approx(1.0, abs=1e-9)


def test_poly_iou_golden_values():
    assert poly_iou([0, 0, 10, 0, 10, 10, 0, 10], [5, 0, 15, 0, 15, 10, 5, 10]) == pytest.approx(1 / 3)
    assert poly_iou([0, 0, 10, 0, 10, 10, 0, 10], [2, 2, 4, 2, 4, 4, 2, 4]) == pytest.approx(0.04)
    assert poly_iou([0, 0, 1, 0, 1, 1, 0, 1], [5, 5, 6, 5, 6, 6, 5, 6]) == 0.0


def test_poly_iou_rotated():
    # diamond vs itself and vs the enclosing square (area 32 vs 64,
    # intersection = diamond)
    diamond = [4, 0, 8, 4, 4, 8, 0, 4]
    square = [0, 0, 8, 0, 8, 8, 0, 8]
    assert poly_iou(diamond, diamond) == pytest.approx(1.0)
    assert poly_iou(diamond, square) == pytest.approx(32 / 64)


def test_intersection_orientation_invariance():
    a = [[0, 0], [10, 0], [10, 10], [0, 10]]
    ar = list(reversed(a))
    b = [[5, 5], [15, 5], [15, 15], [5, 15]]
    for p in (a, ar):
        for q in (b, list(reversed(b))):
            assert convex_poly_intersection_area(p, q) == pytest.approx(25)
