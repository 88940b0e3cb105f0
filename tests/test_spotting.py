"""Goldens for segmentation grouping + MANGO character voting."""

import numpy as np

from davar_lab_ocr_spark.operators.spotting import (
    connected_components,
    mango_char_vote,
    mango_vote_stage,
    mask_to_quads,
    seg_group_stage,
)


def test_connected_components_4conn():
    seg = np.array(
        [
            [1, 1, 0, 0],
            [0, 1, 0, 1],
            [0, 0, 0, 1],
            [1, 0, 0, 0],
        ]
    )
    labels = connected_components(seg)
    assert labels.max() == 3
    assert labels[0, 0] == labels[0, 1] == labels[1, 1]
    assert labels[1, 3] == labels[2, 3] != labels[0, 0]
    assert labels[3, 0] not in (labels[0, 0], labels[1, 3])
    # diagonal only -> NOT connected (4-connectivity)
    diag = np.eye(3, dtype=int)
    assert connected_components(diag).max() == 3


def test_mask_to_quads_sorted_by_area():
    seg = np.zeros((10, 12), dtype=int)
    seg[1:4, 1:5] = 1   # area 12
    seg[6:8, 8:10] = 1  # area 4
    quads = mask_to_quads(seg)
    assert len(quads) == 2
    assert quads[0][1] == 12 and quads[1][1] == 4
    assert quads[0][0] == [1.0, 1.0, 4.0, 1.0, 4.0, 3.0, 1.0, 3.0]


def test_mango_vote_exact_semantics():
    # position-wise: 'c'(0.5) vs 'b'(0.3+0.3=0.6) -> 'b' wins pos 0
    assert mango_char_vote(["cat", "bat", "bit"], [0.5, 0.3, 0.3]) == "bat"
    # '#' end symbol stops voting: short text with high weight truncates
    assert mango_char_vote(["ab", "abcd"], [0.9, 0.1]) == "ab"
    # tie -> first-inserted char wins (stable sort)
    assert mango_char_vote(["x", "y"], [0.5, 0.5]) == "x"
    assert mango_char_vote([], []) == ""


def test_mango_vote_stage(spark):
    rows = [
        ("d0", 1, "cat", 0.5),
        ("d0", 1, "bat", 0.3),
        ("d0", 1, "bit", 0.3),
        ("d0", 2, "dog", 1.0),
        ("d1", 1, "zz", 0.7),
    ]
    df = spark.createDataFrame(rows, "doc_id string, instance int, text string, weight double")
    got = {(r["doc_id"], r["instance"]): r["voted"] for r in mango_vote_stage(df).collect()}
    assert got == {("d0", 1): "bat", ("d0", 2): "dog", ("d1", 1): "zz"}


def test_seg_group_stage(spark):
    seg = np.zeros((8, 8), dtype=int)
    seg[1:3, 1:4] = 1
    seg[5:7, 5:8] = 1
    rows = [{"doc_id": "s0", "seg": seg.reshape(-1).tolist(), "h": 8, "w": 8}]
    df = spark.createDataFrame(rows, "doc_id string, seg array<int>, h int, w int")
    out = seg_group_stage(df).collect()[0]
    assert len(out["quads"]) == 2
    areas = sorted(q["area"] for q in out["quads"])
    assert areas == [6, 6]


def test_min_area_rect_brute_force_sweep():
    import numpy as np

    from davar_lab_ocr_spark.functions.geometry import min_area_rect

    rng = np.random.default_rng(13)
    for t in range(20):
        pts = rng.normal(size=(int(rng.integers(3, 30)), 2)) * 8
        r = min_area_rect(pts)
        area = abs(float(np.cross(r[1] - r[0], r[3] - r[0])))
        best = min(
            float(np.prod((pts @ np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])).max(0)
                          - (pts @ np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])).min(0)))
            for a in np.arange(0, np.pi / 2, 0.001)
        )
        assert area <= best + 1e-6


def test_mask_to_quads_rotated_diagonal_bar():
    import numpy as np

    from davar_lab_ocr_spark.operators.spotting import mask_to_quads

    # a 45-degree diagonal bar: rotated rect is much tighter than bbox
    seg = np.zeros((40, 40), dtype=bool)
    for i in range(30):
        seg[i : i + 3, i : i + 3] = True
    (quad_aa, _), = mask_to_quads(seg)
    (quad_rot, _), = mask_to_quads(seg, rotated=True)

    def quad_area(q):
        p = np.asarray(q).reshape(-1, 2)
        return abs(float(np.cross(p[1] - p[0], p[3] - p[0])))

    assert quad_area(quad_rot) < 0.5 * quad_area(quad_aa)


def test_connected_components_matches_bfs_randomized():
    """The run-based union-find labeling must be IDENTICAL (labels and
    numbering) to the per-pixel BFS oracle on randomized maps across
    densities — including the near-percolation regime."""
    import numpy as np

    from davar_lab_ocr_spark.operators.spotting import (
        connected_components,
        connected_components_bfs,
    )

    rng = np.random.default_rng(2024)
    for density in (0.05, 0.3, 0.5, 0.62, 0.8, 0.95):
        for _ in range(4):
            h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
            seg = rng.random((h, w)) < density
            fast = connected_components(seg)
            slow = connected_components_bfs(seg)
            assert (fast == slow).all(), f"mismatch at density={density} {h}x{w}"


def test_connected_components_large_map_fast():
    """A 512x512 seg map labels in well under a second (the r2 per-pixel
    BFS took seconds at this size)."""
    import time

    import numpy as np

    from davar_lab_ocr_spark.operators.spotting import connected_components

    rng = np.random.default_rng(5)
    seg = rng.random((512, 512)) < 0.4
    t0 = time.perf_counter()
    labels = connected_components(seg)
    dt = time.perf_counter() - t0
    assert labels.max() > 0
    assert dt < 1.0, f"labeling took {dt:.2f}s"
