"""PDF writer/parser roundtrip goldens + the Arrow stage."""

from davar_lab_ocr_spark.sources.pdf import (
    make_simple_pdf,
    pdf_extract_stage,
    pdf_to_spans_py,
)

PAGES = [
    [(72, 720, 24, "Document Title"),
     (72, 680, 12, "first paragraph line"),
     (300, 680, 12, "right column")],
    [(72, 720, 12, "second page text")],
]


def test_roundtrip_order_and_kinds():
    for compress in (True, False):
        spans = pdf_to_spans_py(make_simple_pdf(PAGES, compress=compress))
        assert [(s["kind"], s["text"], s["offset"]) for s in spans] == [
            ("title", "Document Title", 0),
            ("text", "first paragraph line", 1),  # same y: left before right
            ("text", "right column", 2),
            ("text", "second page text", 3),      # page 2 after page 1
        ]


def test_parser_handles_escapes_and_garbage():
    import re

    # escaped parens inside a literal string; the byte surgery grows the
    # stream so /Length must be patched to match
    pdf = make_simple_pdf([[(72, 700, 12, "plain")]], compress=False)
    old, new = b"(plain)", rb"(a\(b\)c \\ d)"
    grow = len(new) - len(old)
    pdf = pdf.replace(old, new)
    pdf = re.sub(
        rb"/Length (\d+)",
        lambda m: b"/Length %d" % (int(m.group(1)) + grow),
        pdf,
        count=1,
    )
    assert pdf_to_spans_py(pdf)[0]["text"] == "a(b)c \\ d"
    # escaped backslash followed by a literal 'n' must NOT become \n
    from davar_lab_ocr_spark.sources.pdf import _unescape

    assert _unescape(rb"\\n") == "\\n"
    assert _unescape(rb"\n") == "\n"
    assert pdf_to_spans_py(b"not a pdf at all") == []
    assert pdf_to_spans_py(b"") == []


def test_pdf_stage(spark):
    rows = [("p0", make_simple_pdf(PAGES)), ("p1", make_simple_pdf([[(10, 10, 12, "x y z")]]))]
    df = spark.createDataFrame(rows, "doc_id string, pdf binary")
    got = {r["doc_id"]: [s["text"] for s in r["spans"]] for r in pdf_extract_stage(df).collect()}
    assert got["p0"][0] == "Document Title" and len(got["p0"]) == 4
    assert got["p1"] == ["x y z"]


def test_pdf_roundtrip_property():
    """Property: for any planted (x, y, size, text) items with distinct
    positions, parse(write(items)) recovers every text in (page, -y, x)
    order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    texts = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789 ", min_size=1, max_size=30).map(str.strip).filter(bool)
    item = st.tuples(
        st.integers(0, 600), st.integers(0, 780), st.sampled_from([10, 12, 18, 24]), texts
    )
    pages = st.lists(st.lists(item, min_size=1, max_size=5, unique_by=lambda t: (t[0], t[1])),
                     min_size=1, max_size=3)

    @settings(max_examples=40, deadline=None)
    @given(pages)
    def check(pgs):
        from davar_lab_ocr_spark.sources.pdf import make_simple_pdf, pdf_to_spans_py

        spans = pdf_to_spans_py(make_simple_pdf(pgs))
        want = []
        for p, items in enumerate(pgs):
            for x, y, size, text in sorted(items, key=lambda t: (-t[1], t[0])):
                want.append((("title" if size >= 18 else "text"), text))
        assert [(s["kind"], s["text"]) for s in spans] == want

    check()


def test_tj_array_negative_kerning():
    """`[(Hel) -30 (lo)] TJ` must come back as one 'Hello' span — kern
    numbers are positioning, not text."""
    import zlib

    from davar_lab_ocr_spark.sources.pdf import pdf_to_spans_py

    stream = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm [(Hel) -30 (lo) 12 (!)] TJ ET"
    pdf = _wrap_stream(stream)
    spans = pdf_to_spans_py(pdf)
    assert [s["text"] for s in spans] == ["Hello!"]


def test_td_is_cumulative_and_tm_overrides():
    """Two Td moves compose; a later Tm sets the position absolutely.
    Reading order is by descending y."""
    from davar_lab_ocr_spark.sources.pdf import pdf_to_spans_py

    stream = (
        b"BT /F1 12 Tf "
        b"72 700 Td (first) Tj "       # y=700
        b"0 -40 Td (second) Tj "       # cumulative -> y=660
        b"1 0 0 1 72 600 Tm (third) Tj "  # absolute -> y=600
        b"0 -40 Td (fourth) Tj "       # relative to Tm line -> y=560
        b"ET"
    )
    spans = pdf_to_spans_py(_wrap_stream(stream))
    assert [s["text"] for s in spans] == ["first", "second", "third", "fourth"]
    assert [s["offset"] for s in spans] == [0, 1, 2, 3]


def test_bt_resets_position():
    from davar_lab_ocr_spark.sources.pdf import pdf_to_spans_py

    stream = (
        b"BT 72 700 Td (a) Tj ET "
        b"BT 0 650 Td (b) Tj ET"  # would be y=1350 if BT didn't reset
    )
    spans = pdf_to_spans_py(_wrap_stream(stream))
    assert [s["text"] for s in spans] == ["a", "b"]


def test_title_size_from_tf_with_tm_tj():
    from davar_lab_ocr_spark.sources.pdf import pdf_to_spans_py

    stream = (
        b"BT /F1 24 Tf 1 0 0 1 72 720 Tm [(Big ) -10 (Title)] TJ "
        b"/F1 11 Tf 1 0 0 1 72 680 Tm (body) Tj ET"
    )
    spans = pdf_to_spans_py(_wrap_stream(stream))
    assert [(s["kind"], s["text"]) for s in spans] == [
        ("title", "Big Title"), ("text", "body"),
    ]


def _wrap_stream(stream: bytes) -> bytes:
    """Minimal single-stream PDF body around a raw content stream
    (uncompressed; the header/xref scaffolding is irrelevant to the
    stream scanner)."""
    return (
        b"%%PDF-1.4\n1 0 obj\n<< /Length %d >>\nstream\n%s\nendstream\nendobj\n"
        % (len(stream), stream)
    )


def test_leading_tstar_and_quote():
    """`TL` sets the leading, `T*` advances a line, `(s) '` advances
    then shows; `TD` sets leading to -ty as a side effect."""
    from davar_lab_ocr_spark.sources.pdf import pdf_to_spans_py

    stream = (
        b"BT /F1 12 Tf 14 TL 72 700 Td (one) Tj "
        b"T* (two) Tj "          # y=686
        b"(three) ' "            # y=672
        b"72 -20 TD (four) Tj "  # y=652, leading becomes 20
        b"T* (five) Tj "         # y=632
        b"ET"
    )
    spans = pdf_to_spans_py(_wrap_stream(stream))
    assert [s["text"] for s in spans] == ["one", "two", "three", "four", "five"]
    assert [s["offset"] for s in spans] == [0, 1, 2, 3, 4]
