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
    # escaped parens inside a literal string
    pdf = make_simple_pdf([[(72, 700, 12, "plain")]], compress=False)
    pdf = pdf.replace(b"(plain)", rb"(a\(b\)c \\ d)")
    assert pdf_to_spans_py(pdf)[0]["text"] == "a(b)c \\ d"
    assert pdf_to_spans_py(b"not a pdf at all") == []
    assert pdf_to_spans_py(b"") == []


def test_pdf_stage(spark):
    rows = [("p0", make_simple_pdf(PAGES)), ("p1", make_simple_pdf([[(10, 10, 12, "x y z")]]))]
    df = spark.createDataFrame(rows, "doc_id string, pdf binary")
    got = {r["doc_id"]: [s["text"] for s in r["spans"]] for r in pdf_extract_stage(df).collect()}
    assert got["p0"][0] == "Document Title" and len(got["p0"]) == 4
    assert got["p1"] == ["x y z"]
