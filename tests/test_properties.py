"""Property-based tests (hypothesis) for the pure kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from davar_lab_ocr_spark.functions.geometry import (
    poly_iou,
    rect_iou_matrix,
    rect_max_iou,
    rect_max_iou_matrix,
)
from davar_lab_ocr_spark.functions.text import (
    attn_decode_batch,
    attn_decode_py,
    ctc_decode_batch,
    ctc_decode_py,
    PAD_ID,
)
from davar_lab_ocr_spark.operators.video import edit_dist_iou

rects = st.tuples(
    st.integers(0, 200), st.integers(0, 200), st.integers(1, 100), st.integers(1, 100)
).map(lambda t: [float(t[0]), float(t[1]), float(t[0] + t[2]), float(t[1] + t[3])])


@given(rects, rects)
@settings(max_examples=200, deadline=None)
def test_poly_iou_matches_rect_iou_on_rects(a, b):
    poly_a = [a[0], a[1], a[2], a[1], a[2], a[3], a[0], a[3]]
    poly_b = [b[0], b[1], b[2], b[1], b[2], b[3], b[0], b[3]]
    got = poly_iou(poly_a, poly_b)
    want = rect_iou_matrix(np.array([a]), np.array([b]))[0, 0]
    assert abs(got - want) < 1e-9
    # symmetry + bounds
    assert abs(poly_iou(poly_b, poly_a) - got) < 1e-9
    assert -1e-12 <= got <= 1 + 1e-12


@given(rects, rects)
@settings(max_examples=100, deadline=None)
def test_rect_max_iou_scalar_matches_matrix(a, b):
    got = rect_max_iou(a, b)
    want = rect_max_iou_matrix(np.array([a]), np.array([b]))[0, 0]
    assert abs(got - want) < 1e-12
    assert got >= rect_iou_matrix(np.array([a]), np.array([b]))[0, 0] - 1e-12


ids_seq = st.lists(st.integers(0, 36), max_size=40)


@given(st.lists(ids_seq, min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_ctc_batch_equals_py(seqs):
    max_t = max((len(s) for s in seqs), default=1) or 1
    mat = np.full((len(seqs), max_t), PAD_ID, dtype=np.int64)
    for i, s in enumerate(seqs):
        mat[i, : len(s)] = s
    assert ctc_decode_batch(mat) == [ctc_decode_py(s) for s in seqs]


@given(st.lists(st.lists(st.integers(0, 37), max_size=30), min_size=1, max_size=20))
@settings(max_examples=100, deadline=None)
def test_attn_batch_equals_py(seqs):
    max_t = max((len(s) for s in seqs), default=1) or 1
    mat = np.full((len(seqs), max_t), PAD_ID, dtype=np.int64)
    for i, s in enumerate(seqs):
        mat[i, : len(s)] = s
    assert attn_decode_batch(mat) == [attn_decode_py(s) for s in seqs]


words = st.text(alphabet="abcdefg", max_size=12)


@given(words, words)
@settings(max_examples=200, deadline=None)
def test_edit_dist_iou_properties(a, b):
    v = edit_dist_iou(a, b)
    assert 0.0 <= v <= 1.0
    assert edit_dist_iou(b, a) == v
    assert edit_dist_iou(a, a) == 1.0


@given(st.lists(st.tuples(st.integers(0, 50), st.floats(0.01, 1.0)), min_size=1, max_size=30))
@settings(max_examples=50, deadline=None)
def test_nms_keeps_highest_and_is_subset(items):
    from davar_lab_ocr_spark.functions.geometry import nms_rects

    arr = np.array(
        [[x, x, x + 10, x + 10, s] for x, s in items], dtype=float
    )
    keep = nms_rects(arr, iou_thres=0.3)
    assert len(keep) >= 1
    assert set(keep.tolist()) <= set(range(len(arr)))
    # the globally highest-scored box always survives
    assert int(np.argmax(arr[:, 4])) in keep or any(
        arr[k, 4] == arr[:, 4].max() for k in keep
    )


@settings(max_examples=40, deadline=None)
@given(
    st.integers(1, 12), st.integers(1, 12), st.sampled_from([1, 2, 3, 4]),
    st.sampled_from([0, 1, 2, 3, 4]), st.integers(0, 2**32 - 1),
)
def test_png_roundtrip_property(h, w, c, filter_type, seed):
    import numpy as np

    from davar_lab_ocr_spark.functions.png import png_decode, png_encode

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    assert (png_decode(png_encode(arr, filter_type=filter_type)) == arr).all()


@settings(max_examples=30, deadline=None)
@given(
    st.dictionaries(
        st.binary(min_size=1, max_size=24),
        st.binary(min_size=0, max_size=6000),
        max_size=40,
    )
)
def test_lmdb_roundtrip_property(items):
    from davar_lab_ocr_spark.sources.lmdb_format import lmdb_items, lmdb_write

    buf = lmdb_write(items)
    got = list(lmdb_items(buf))
    assert got == sorted(items.items())


@settings(max_examples=40, deadline=None)
@given(
    st.integers(0, 60), st.integers(0, 60), st.integers(1, 50), st.integers(1, 50),
    st.integers(0, 60), st.integers(0, 60), st.integers(1, 50), st.integers(1, 50),
)
def test_tiou_terms_bounded_by_iou(x0, y0, w0, h0, x1, y1, w1, h1):
    """For any matched pair: 0 <= tiou_recall_term <= iou and
    0 <= tiou_precision_term <= iou (the tightness factors are in
    [0, 1])."""
    import numpy as np

    from davar_lab_ocr_spark.functions.geometry import (
        convex_poly_intersection_area,
        poly_area,
    )
    from davar_lab_ocr_spark.operators.metrics import (
        _prep_poly,
        _tiou_precision_term,
        _tiou_recall_term,
    )

    g = np.array([[x0, y0], [x0 + w0, y0], [x0 + w0, y0 + h0], [x0, y0 + h0]], float)
    d = np.array([[x1, y1], [x1 + w1, y1], [x1 + w1, y1 + h1], [x1, y1 + h1]], float)
    inter = convex_poly_intersection_area(d, g)
    union = poly_area(d) + poly_area(g) - inter
    iou = inter / union if union > 0 else 0.0
    tr = _tiou_recall_term(inter, union, poly_area(g))
    gp, dp = _prep_poly(g), _prep_poly(d)
    tp = _tiou_precision_term(dp, gp, 0, [gp], inter, union)
    assert -1e-12 <= tr <= iou + 1e-12
    assert -1e-12 <= tp <= iou + 1e-12
    # no other gt -> no outlier penalty: precision term IS the iou
    assert abs(tp - iou) < 1e-9


# --- even-odd polygon decomposition properties ---------------------------
_poly_pts = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)), min_size=3, max_size=10
)


@settings(max_examples=60, deadline=None)
@given(_poly_pts)
def test_even_odd_area_matches_shoelace_for_simple_polys(pts):
    """For SIMPLE polygons (convex hull of the sampled points — always
    simple), the parity fill equals the interior: piece areas sum to
    the shoelace area."""
    import numpy as np

    from davar_lab_ocr_spark.functions.geometry import even_odd_pieces, poly_area

    arr = np.array(pts, dtype=np.float64)
    # build a simple polygon: order the points by angle around the mean
    c = arr.mean(axis=0)
    order = np.argsort(np.arctan2(arr[:, 1] - c[1], arr[:, 0] - c[0]), kind="stable")
    poly = arr[order]
    target = poly_area(poly)
    got = sum(poly_area(q) for q in even_odd_pieces(poly))
    assert abs(got - target) <= 1e-6 * max(target, 1.0)


@settings(max_examples=60, deadline=None)
@given(_poly_pts)
def test_even_odd_area_bounded_by_bbox_for_any_contour(pts):
    """For ARBITRARY (possibly self-intersecting) closed contours the
    parity-filled area is non-negative and at most the bbox area.
    (No lower bound vs shoelace exists either way: a bowtie's shoelace
    cancels below parity, while a doubly-traversed triangle's shoelace
    counts winding-2 regions that parity excludes.)"""
    import numpy as np

    from davar_lab_ocr_spark.functions.geometry import even_odd_pieces, poly_area

    poly = np.array(pts, dtype=np.float64)
    got = sum(poly_area(q) for q in even_odd_pieces(poly))
    x0, y0 = poly.min(axis=0)
    x1, y1 = poly.max(axis=0)
    assert -1e-9 <= got <= (x1 - x0) * (y1 - y0) + 1e-6
