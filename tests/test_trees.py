"""Goldens for tree edit distance, TEDS, and CTUNet tree-F1."""

import numpy as np
import pytest

from davar_lab_ocr_spark.functions.trees import (
    Node,
    adjacency_to_trees,
    parse_table_html,
    teds_score,
    tree_edit_distance,
    tree_f1,
)


def t(label, *children):
    return Node(label, list(children))


def test_ted_basics():
    assert tree_edit_distance(t("a"), t("a")) == 0
    assert tree_edit_distance(t("a"), t("b")) == 1  # rename
    assert tree_edit_distance(t("a", t("b")), t("a")) == 1  # delete
    assert tree_edit_distance(t("a"), t("a", t("b"), t("c"))) == 2  # two inserts


def test_ted_known_example():
    # classic zhang-shasha example: f(d(a c(b)) e) vs f(c(d(a b)) e) -> 2
    t1 = t("f", t("d", t("a"), t("c", t("b"))), t("e"))
    t2 = t("f", t("c", t("d", t("a"), t("b"))), t("e"))
    assert tree_edit_distance(t1, t2) == 2


def test_ted_matches_bruteforce_on_random_trees():
    rng = np.random.default_rng(9)

    def rand_tree(depth):
        label = "abc"[int(rng.integers(0, 3))]
        if depth == 0 or rng.random() < 0.4:
            return t(label)
        return t(label, *[rand_tree(depth - 1) for _ in range(int(rng.integers(1, 3)))])

    def brute(t1, t2):
        # exponential reference: edit distance on forests
        def forest_dist(f1, f2):
            if not f1 and not f2:
                return 0
            if not f1:
                return sum(n.size() for n in f2)
            if not f2:
                return sum(n.size() for n in f1)
            a, b = f1[-1], f2[-1]
            opts = [
                forest_dist(f1[:-1] + a.children, f2) + 1,
                forest_dist(f1, f2[:-1] + b.children) + 1,
                forest_dist(f1[:-1], f2[:-1])
                + forest_dist(a.children, b.children)
                + (a.label != b.label),
            ]
            return min(opts)

        return forest_dist([t1], [t2])

    for _ in range(25):
        t1, t2 = rand_tree(2), rand_tree(2)
        assert tree_edit_distance(t1, t2) == brute(t1, t2)


def test_parse_table_html_roundtrip():
    html = (
        '<html><body><table><thead><tr><td colspan="2">hd</td></tr></thead>'
        "<tbody><tr><td>x</td><td></td></tr></tbody></table></body></html>"
    )
    root = parse_table_html(html)
    assert root.label == "table"
    thead, tbody = root.children
    assert thead.label == "thead" and tbody.label == "tbody"
    td = thead.children[0].children[0]
    assert td.colspan == 2 and td.content == ["h", "d"]
    # table(1) + thead + tbody + 2 tr + 3 td = 8
    assert root.size() == 8


def test_teds_identical_and_perturbed():
    html = (
        "<html><body><table><thead><tr><td>h1</td><td>h2</td></tr></thead>"
        "<tbody><tr><td>b1</td><td>b2</td></tr></tbody></table></body></html>"
    )
    assert teds_score(html, html) == 1.0
    # change one cell's text entirely ('b2' -> 'xy', lev 2 / max len 2 -> cost 1)
    pert = html.replace("b2", "xy")
    # nodes excl root: thead tbody 2*tr 4*td = 8 -> 1 - 1/8
    assert teds_score(pert, html) == pytest.approx(1 - 1 / 8)
    # structure-only ignores the text change
    assert teds_score(pert, html, structure_only=True) == 1.0
    # drop a td -> delete cost 1
    dropped = html.replace("<td>b2</td>", "")
    assert teds_score(dropped, html) == pytest.approx(1 - 1 / 8)
    assert teds_score("", html) == 0.0


def test_adjacency_to_trees_and_f1():
    # 0 is root key; 1 = top child (label 1), 2 = left child (label 2);
    # 3 is child of 1 (any nonzero label)
    adj = [
        [0, 1, 2, 0],
        [0, 0, 0, 1],
        [0, 0, 0, 0],
        [0, 0, 0, 0],
    ]
    trees = adjacency_to_trees(adj)
    assert len(trees) == 1
    tr = trees[0]
    assert tr["idx"] == 0
    assert [c["idx"] for c in tr["top"]] == [1]
    assert [c["idx"] for c in tr["left"]] == [2]
    assert [c["idx"] for c in tr["top"][0]["children"]] == [3]

    assert tree_f1(adj, adj, "hard") == (1.0, 1.0, 1.0)
    assert tree_f1(adj, adj, "soft") == (1.0, 1.0, 1.0)

    # drop the 1->3 edge in pred: hard -> 0, soft -> partial
    pred = [row[:] for row in adj]
    pred[1][3] = 0
    r, p, f1 = tree_f1(adj, pred, "hard")
    assert (r, p) == (0.0, 0.0)
    r, p, f1 = tree_f1(adj, pred, "soft")
    # gt tree has 4 nodes; pred tree misses node 3 -> ted 1, teds = 1 - 1/3
    assert r == pytest.approx(2 / 3)
    assert p == pytest.approx(2 / 3)
    assert f1 == pytest.approx(2 / 3)

    # empty pred
    zero = [[0] * 4 for _ in range(4)]
    assert tree_f1(adj, zero, "hard") == (1.0, 0.0, 0.0)


# --- PubTabNet-shaped HTML (thead/tbody + inline cell markup), hand-
# computed TEDS goldens mirroring the reference tokenize semantics
# (metric.py:73-84: inline tags are single cell tokens) ---------------
_PTN_GT = (
    "<html><body><table><thead><tr><td><b>Item</b></td><td><b>Qty</b></td>"
    "</tr></thead><tbody><tr><td>apple</td><td>3</td></tr></tbody>"
    "</table></body></html>"
)


def test_teds_pubtabnet_identical():
    from davar_lab_ocr_spark.functions.trees import teds_score

    assert teds_score(_PTN_GT, _PTN_GT) == pytest.approx(1.0)
    assert teds_score(_PTN_GT, _PTN_GT, structure_only=True) == pytest.approx(1.0)


def test_teds_pubtabnet_lost_bold():
    """pred drops one cell's <b> wrapper: gt cell tokens are
    ['<b>','I','t','e','m','</b>'] (6), pred ['I','t','e','m'] (4) ->
    rename = lev 2/6 = 1/3; tree nodes excl. root = thead+tbody+2 tr+
    4 td = 8 -> teds = 1 - (1/3)/8."""
    from davar_lab_ocr_spark.functions.trees import teds_score

    pred = _PTN_GT.replace("<b>Item</b>", "Item")
    assert teds_score(pred, _PTN_GT) == pytest.approx(1 - (1 / 3) / 8, abs=1e-9)
    # structure unchanged -> structure-only score stays perfect
    assert teds_score(pred, _PTN_GT, structure_only=True) == pytest.approx(1.0)


def test_teds_pubtabnet_missing_cell_and_colspan():
    from davar_lab_ocr_spark.functions.trees import teds_score

    # delete one td entirely: distance 1 over 8 nodes
    pred = _PTN_GT.replace("<td>3</td>", "")
    assert teds_score(pred, _PTN_GT) == pytest.approx(1 - 1 / 8)
    # colspan mismatch on one td: rename cost 1 over 8 nodes
    pred2 = _PTN_GT.replace("<td>apple</td>", '<td colspan="2">apple</td>')
    assert teds_score(pred2, _PTN_GT) == pytest.approx(1 - 1 / 8)
    assert teds_score(pred2, _PTN_GT, structure_only=True) == pytest.approx(1 - 1 / 8)


def test_teds_inline_markup_tokens():
    """Inline tags parse to single tokens; <br/> emits open+close like
    an lxml empty element."""
    from davar_lab_ocr_spark.functions.trees import parse_table_html

    t = parse_table_html(
        "<html><body><table><tr><td>a<b>x</b>y<br/>z</td></tr></table></body></html>"
    )
    td = t.children[0].children[0]
    assert td.content == ["a", "<b>", "x", "</b>", "y", "<br>", "</br>", "z"]


def test_zss_matches_naive_forest_edit_distance():
    """Independent derivation: the textbook recursive forest edit
    distance (memoized, exponential — test oracle only) must equal the
    Zhang-Shasha implementation on random small trees."""
    import functools

    import numpy as np

    from davar_lab_ocr_spark.functions.trees import Node, tree_edit_distance

    def naive_ted(t1, t2):
        # forests are tuples of Nodes; recurse on the RIGHTMOST root
        def key(forest):
            return tuple(id(n) for n in forest)

        memo = {}

        def fdist(f1, f2):
            k = (key(f1), key(f2))
            if k in memo:
                return memo[k]
            if not f1 and not f2:
                r = 0.0
            elif not f1:
                last = f2[-1]
                r = fdist((), f2[:-1] + tuple(last.children)) + 1
            elif not f2:
                last = f1[-1]
                r = fdist(f1[:-1] + tuple(last.children), ()) + 1
            else:
                a, b = f1[-1], f2[-1]
                r = min(
                    fdist(f1[:-1] + tuple(a.children), f2) + 1,   # delete a
                    fdist(f1, f2[:-1] + tuple(b.children)) + 1,   # insert b
                    fdist(tuple(a.children), tuple(b.children))   # match a<->b
                    + fdist(f1[:-1], f2[:-1])
                    + (0.0 if a.label == b.label else 1.0),
                )
            memo[k] = r
            return r

        return fdist((t1,), (t2,))

    def random_tree(rng, n_nodes, n_labels):
        nodes = [Node(str(rng.integers(0, n_labels)))]
        for _ in range(n_nodes - 1):
            parent = nodes[int(rng.integers(0, len(nodes)))]
            child = Node(str(rng.integers(0, n_labels)))
            parent.children.append(child)
            nodes.append(child)
        return nodes[0]

    rng = np.random.default_rng(77)
    for trial in range(30):
        t1 = random_tree(rng, int(rng.integers(1, 8)), 3)
        t2 = random_tree(rng, int(rng.integers(1, 8)), 3)
        got = tree_edit_distance(t1, t2)
        want = naive_ted(t1, t2)
        assert got == pytest.approx(want), f"trial {trial}: zss={got} naive={want}"
