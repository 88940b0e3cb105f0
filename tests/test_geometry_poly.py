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


def test_convex_union_area_goldens():
    from davar_lab_ocr_spark.functions.geometry import convex_union_area

    def sq(x0, y0, x1, y1):
        return [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]

    assert convex_union_area([]) == pytest.approx(0.0)
    assert convex_union_area([sq(0, 0, 2, 2)]) == pytest.approx(4.0)
    # chain of three squares: 4+4+4 - 1 - 1 - 0 (corner touch) + 0 = 10
    assert convex_union_area(
        [sq(0, 0, 2, 2), sq(1, 1, 3, 3), sq(2, 2, 4, 4)]
    ) == pytest.approx(10.0)
    # fully nested polygon contributes nothing
    assert convex_union_area([sq(0, 0, 4, 4), sq(1, 1, 2, 2)]) == pytest.approx(16.0)


def test_convex_union_area_matches_cell_counting():
    """Random integer axis-aligned rects: union area == number of unit
    cells covered (exact oracle for integer-coordinate rectangles)."""
    from davar_lab_ocr_spark.functions.geometry import convex_union_area

    rng = np.random.default_rng(97)
    for trial in range(20):
        n = int(rng.integers(1, 7))
        rects = []
        grid = np.zeros((24, 24), dtype=bool)
        for _ in range(n):
            x0, y0 = int(rng.integers(0, 18)), int(rng.integers(0, 18))
            w, h = int(rng.integers(1, 7)), int(rng.integers(1, 7))
            rects.append([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]])
            grid[y0 : y0 + h, x0 : x0 + w] = True
        assert convex_union_area(rects) == pytest.approx(float(grid.sum()), abs=1e-9)


def test_union_area_cap_fallback_bounded_and_close():
    # past _UNION_EXACT_MAX mutually-overlapping polys the recursion
    # switches to the deterministic grid estimate (ADVICE r3: one
    # adversarial doc must not hang the metric stage)
    import time

    import numpy as np

    from davar_lab_ocr_spark.functions.geometry import (
        _UNION_EXACT_MAX,
        convex_union_area,
    )

    sq = lambda x0, y0: np.array([[x0, y0], [x0 + 1, y0], [x0 + 1, y0 + 1], [x0, y0 + 1]])
    # 20 identical unit squares: union exactly 1, grid-aligned
    t0 = time.time()
    got = convex_union_area([sq(0, 0)] * 20)
    assert abs(got - 1.0) < 1e-9
    # 14 disjoint squares in a row: union 14, every grid cell decided
    got2 = convex_union_area([sq(2 * i, 0) for i in range(14)])
    assert abs(got2 - 14.0) < 14 * 0.06  # grid estimate tolerance
    assert time.time() - t0 < 5.0
    # below the cap the recursion stays exact
    exact = convex_union_area([sq(0, 0), sq(0.5, 0)])
    assert abs(exact - 1.5) < 1e-9
    assert _UNION_EXACT_MAX >= 10


def test_disjoint_group_union_area_exact_past_piece_cap():
    import numpy as np

    from davar_lab_ocr_spark.functions.geometry import (
        _UNION_EXACT_MAX,
        convex_union_area,
        disjoint_group_union_area,
    )

    sq = lambda x0, y0, w=1.0, h=1.0: np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]], dtype=float
    )
    # singleton groups == flat recursion exactly
    flats = [sq(0, 0, 2, 2), sq(1, 1, 2, 2), sq(0.5, 0.5)]
    assert disjoint_group_union_area([[p] for p in flats]) == pytest.approx(
        convex_union_area(flats), abs=1e-9
    )
    # 3 "curved outlines", each decomposed into 8 disjoint strips
    # (24 pieces total — the FLAT recursion would raster past the
    # cap); grouped it is 3 terms and must stay EXACT.
    # outline k is the 8x1 rectangle [0,8]x[k*0.5, k*0.5+1]: the
    # union of the 3 overlapping rectangles is 8 * (0.5+0.5+1) = 16
    groups = [
        [sq(i, 0.5 * k, 1.0, 1.0) for i in range(8)] for k in range(3)
    ]
    assert sum(len(g) for g in groups) > _UNION_EXACT_MAX
    assert disjoint_group_union_area(groups) == pytest.approx(16.0, abs=1e-9)
    # empty / degenerate groups drop out
    assert disjoint_group_union_area([]) == pytest.approx(0.0)
    assert disjoint_group_union_area([[np.zeros((0, 2))], [sq(0, 0)]]) == pytest.approx(1.0)


def test_even_odd_pieces_bowtie_and_concave():
    import numpy as np

    from davar_lab_ocr_spark.functions.geometry import even_odd_pieces, poly_area

    # bowtie: even-odd area = two lobes of 1 each
    bt = [(0, 0), (2, 2), (2, 0), (0, 2)]
    assert abs(sum(poly_area(q) for q in even_odd_pieces(bt)) - 2.0) < 1e-9
    # concave L: parity fill == interior
    L = [(0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)]
    assert abs(sum(poly_area(q) for q in even_odd_pieces(L)) - 12.0) < 1e-9


def test_pentagram_not_convex_and_uses_even_odd():
    # regression: a star-order pentagram turns uniformly at every
    # corner yet self-intersects; the convex fast path must reject it
    # (total-turning check) so the even-odd decomposition applies
    import math

    import numpy as np

    from davar_lab_ocr_spark.functions.geometry import (
        even_odd_pieces,
        is_convex_poly,
        poly_area,
    )

    star = np.array(
        [
            (math.cos(math.radians(90 + 144 * i)), math.sin(math.radians(90 + 144 * i)))
            for i in range(5)
        ]
    )
    assert not is_convex_poly(star)
    # parity fill of the unit pentagram: the 5 points + inner pentagon
    # WITHOUT the winding-2 core counted twice — strictly less than the
    # convex-clip (hull-like) area and strictly positive
    area = sum(poly_area(q) for q in even_odd_pieces(star))
    assert 0.5 < area < 1.0  # ~0.7757
