"""Chargrid rasterization + region classification tests."""

import numpy as np

from davar_lab_ocr_spark.operators.layout import (
    chargrid_histogram_stage,
    chargrid_py,
    classify_regions,
)


def test_chargrid_paint_and_overwrite():
    grid = chargrid_py(
        10,
        10,
        [[5, 7], [9]],
        [[[0.0, 0.0, 2.0, 2.0], [2.0, 0.0, 4.0, 2.0]], [[1.0, 1.0, 3.0, 3.0]]],
    )
    assert grid[0, 0] == 5 and grid[0, 2] == 7
    # second line overwrites the overlap region
    assert grid[1, 1] == 9 and grid[2, 2] == 9
    # half-open slices: row 3 / col 3 of box [1,1,3,3] untouched
    assert grid[3, 1] == 0
    assert (grid != 0).sum() == 2 * 2 + 2 * 2 + (2 * 2 - 0) - 2  # painted minus overlap counted once


def test_chargrid_rounding():
    grid = chargrid_py(5, 5, [[3]], [[[0.6, 0.4, 2.4, 1.6]]])
    # rounds to [1, 0, 2, 2] -> rows 0..1, cols 1..1
    assert grid[0, 1] == 3 and grid[1, 1] == 3
    assert grid[0, 2] == 0


def test_chargrid_stage(spark):
    rows = [
        {
            "doc_id": "c0",
            "h": 8,
            "w": 8,
            "char_ids": [[1, 2]],
            "cbboxes": [[[0.0, 0.0, 2.0, 2.0], [4.0, 4.0, 6.0, 6.0]]],
        },
        {"doc_id": "c1", "h": 4, "w": 4, "char_ids": [], "cbboxes": []},
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, h int, w int, char_ids array<array<int>>, "
        "cbboxes array<array<array<double>>>",
    )
    got = {r["doc_id"]: (r["n_painted"], r["n_ids"]) for r in chargrid_histogram_stage(df).collect()}
    assert got == {"c0": (8, 2), "c1": (0, 0)}


def test_classify_regions(spark):
    df = spark.createDataFrame(
        [([0.1, 0.8, 0.0, 0.0, 0.0],), ([0.0, 0.0, 0.0, 0.0, 0.9],)], "scores array<double>"
    )
    kinds = [r["kind"] for r in classify_regions(df).collect()]
    assert kinds == ["title", "figure"]


def test_chargrid_clamps_page_edge_boxes():
    # a box poking off the left edge clamps (paints cols 0:2, rows 1:3);
    # a fully-off-page box paints NOTHING (no numpy negative wraparound)
    grid = chargrid_py(5, 5, [[7, 8]], [[[-2.0, 1.0, 2.0, 3.0], [-5.0, 0.0, -1.0, 2.0]]])
    assert grid[1, 0] == 7 and grid[2, 1] == 7 and grid[1, 2] == 0
    assert (grid != 0).sum() == 4  # only the clamped box painted
    # overflow on the far side clamps to the page
    grid2 = chargrid_py(4, 4, [[3]], [[[2.0, 2.0, 9.0, 9.0]]])
    assert (grid2 != 0).sum() == 4 and grid2[3, 3] == 3
