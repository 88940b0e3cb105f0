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


def test_pointer_order_nn_constant_query_golden():
    """With w_query = 0 the query is the constant b_query every step, so
    the masked argmax emits regions in descending key.b_query order —
    an analytically known permutation that exercises the whole forward
    (LSTM state updates run but cannot change the scores)."""
    import numpy as np

    from davar_lab_ocr_spark.operators.ordering import pointer_order_nn

    hdim, m = 4, 4
    rng = np.random.default_rng(3)
    emb = rng.normal(0, 1, (6, m))
    weights = {
        "w_ih": rng.normal(0, 0.3, (4 * hdim, hdim)),
        "w_hh": rng.normal(0, 0.3, (4 * hdim, hdim)),
        "b_ih": np.zeros(4 * hdim),
        "b_hh": np.zeros(4 * hdim),
        "w_key": np.eye(hdim, m),
        "b_key": np.zeros(hdim),
        "w_query": np.zeros((hdim, hdim)),
        "b_query": np.array([1.0, 2.0, -1.0, 0.5]),
        "decoder_init": np.zeros(hdim),
        "hidden_init": np.zeros(hdim),
    }
    got = pointer_order_nn(emb, weights)
    proj = emb @ weights["b_query"]
    want_sequence = np.argsort(-proj, kind="stable")
    want = np.empty(len(emb), dtype=int)
    for step, region in enumerate(want_sequence):
        want[region] = step
    assert got == want.tolist()


def test_pointer_order_nn_query_evolution_changes_order():
    """A non-degenerate w_query makes the score vector step-dependent
    (the LSTM state matters): assert the decode is a valid permutation
    and differs from the constant-query order for crafted weights."""
    import numpy as np

    from davar_lab_ocr_spark.operators.ordering import pointer_order_nn

    hdim = m = 3
    rng = np.random.default_rng(11)
    emb = rng.normal(0, 1, (5, m))
    weights = {
        "w_ih": rng.normal(0, 1.2, (4 * hdim, hdim)),
        "w_hh": rng.normal(0, 1.2, (4 * hdim, hdim)),
        "b_ih": rng.normal(0, 0.5, 4 * hdim),
        "b_hh": rng.normal(0, 0.5, 4 * hdim),
        "w_key": np.eye(hdim),
        "b_key": np.zeros(hdim),
        "w_query": rng.normal(0, 1.5, (hdim, hdim)),
        "b_query": np.zeros(hdim),
        "decoder_init": rng.normal(0, 1.0, hdim),
        "hidden_init": rng.normal(0, 1.0, hdim),
    }
    got = pointer_order_nn(emb, weights)
    assert sorted(got) == list(range(5))


def test_pointer_order_nn_stage(spark):
    import numpy as np

    from davar_lab_ocr_spark.operators.ordering import (
        pointer_order_nn,
        pointer_order_nn_stage,
    )

    hdim = m = 2
    weights = {
        "w_ih": np.zeros((4 * hdim, hdim)),
        "w_hh": np.zeros((4 * hdim, hdim)),
        "b_ih": np.zeros(4 * hdim),
        "b_hh": np.zeros(4 * hdim),
        "w_key": np.eye(hdim),
        "b_key": np.zeros(hdim),
        "w_query": np.zeros((hdim, hdim)),
        "b_query": np.array([1.0, 0.0]),
        "decoder_init": np.zeros(hdim),
        "hidden_init": np.zeros(hdim),
    }
    rows = [("d0", i, float(i % 3), float(i)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id string, region_id int, f0 double, f1 double")
    got = {r["region_id"]: r["order_pred"]
           for r in pointer_order_nn_stage(df, weights, ["f0", "f1"]).collect()}
    emb = np.array([[i % 3, i] for i in range(6)], dtype=float)
    want = pointer_order_nn(emb, weights)
    assert [got[i] for i in range(6)] == want


def test_pointer_weights_fixture_beats_heuristic(spark):
    """Committed seeded weight fixture (pointer_weights.npz): the
    learned pointer decode reads a two-column layout COLUMN-MAJOR
    (ground truth), while the deterministic proximity scorer interleaves
    the columns — the injectable-weights contract end-to-end through
    the Spark stage (pointer_head.py:76-125 shape)."""
    import os

    import numpy as np
    import pyspark.sql.functions as F

    from davar_lab_ocr_spark.operators.ordering import (
        pointer_order_nn_stage,
        pointer_order_stage,
    )

    wpath = os.path.join(os.path.dirname(__file__), "fixtures", "pointer_weights.npz")
    weights = {k: v for k, v in np.load(wpath).items()}

    # two columns (x=0 and x=1), 4 rows each, tall row gaps: reading
    # order is column-major; emb = (x, y/10) matches the fixture scale
    rows = []
    truth = {}
    rid = 0
    for col in (0.0, 1.0):
        for row in range(4):
            rows.append(("d1", rid, col, float(row * 10)))
            truth[rid] = len(truth)
            rid += 1
    df = spark.createDataFrame(rows, "doc_id string, region_id int, x0 double, y0 double")
    emb = df.withColumn("f0", F.col("x0")).withColumn("f1", F.col("y0") / 10.0)

    learned = {
        r["region_id"]: r["order_pred"]
        for r in pointer_order_nn_stage(emb, weights, ["f0", "f1"]).collect()
    }
    assert learned == truth

    heuristic = {
        r["region_id"]: r["order_pred"] for r in pointer_order_stage(df).collect()
    }
    acc = lambda got: sum(got[k] == v for k, v in truth.items()) / len(truth)
    assert acc(learned) == 1.0
    assert acc(heuristic) < 1.0  # proximity walk interleaves the columns
