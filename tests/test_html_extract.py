"""HTML main-content extraction goldens: boilerplate tags, link
density, min-length, kind mapping, figure refs, nesting."""

from davar_lab_ocr_spark.operators.html_extract import (
    html_extract_stage,
    html_to_spans_py,
)

PAGE = """
<html><head><title>Ignored</title><script>var x = 1;</script>
<style>.a{color:red}</style></head><body>
<nav><a href="/">Home</a> <a href="/about">About</a></nav>
<h1>Main Headline</h1>
<p>This is the first real paragraph with enough characters to keep.</p>
<p>short</p>
<p>Read more: <a href="/a">link one</a> <a href="/b">link two</a> <a href="/c">link three</a></p>
<ul><li>First list item with plenty of text</li><li>tiny</li></ul>
<img src="media://x/1.png"/>
<div>A standalone div block that certainly has enough length to be content.</div>
<footer>&copy; 2020 Corp <a href="/p">Privacy</a> <a href="/t">Terms</a></footer>
</body></html>
"""


def test_boilerplate_and_heuristics():
    spans = html_to_spans_py(PAGE)
    kinds = [(s["kind"], s["offset"]) for s in spans]
    assert kinds == [
        ("title", 0), ("text", 1), ("list", 2), ("figure", 3), ("text", 4)
    ]
    texts = [s["text"] for s in spans]
    assert texts[0] == "Main Headline"
    # dropped: head title, script/style, nav links, short <p>, the
    # link-dense <p>, tiny <li>, footer
    assert not any("Home" in t or "Privacy" in t or "short" in t for t in texts)
    assert not any("Read more" in t for t in texts)
    assert spans[3]["media_ref"] == "media://x/1.png"


def test_nested_blocks_and_whitespace():
    html = "<div>Outer text before <p>inner paragraph long enough here</p></div>"
    spans = html_to_spans_py(html)
    # inner closes first, then outer (both long enough)
    assert [s["text"] for s in spans] == [
        "inner paragraph long enough here",
        "Outer text before",
    ] or [s["text"] for s in spans] == ["inner paragraph long enough here"]
    ws = html_to_spans_py("<p>  lots\n of \t internal   space here  </p>")
    assert ws[0]["text"] == "lots of internal space here"


def test_heading_exempt_from_min_length():
    spans = html_to_spans_py("<h2>Hi</h2><p>ab</p>")
    assert [s["kind"] for s in spans] == ["title"]


def test_link_density_boundary():
    # exactly half link chars: 10 link chars of 20 -> density 0.5, kept
    html = '<p>aaaaaaaaaa<a href="/">bbbbbbbbbb</a></p>'
    assert len(html_to_spans_py(html)) == 1
    html = '<p>aaaaaaaaa<a href="/">bbbbbbbbbbb</a></p>'  # 11/20 -> dropped
    assert html_to_spans_py(html) == []


def test_stage_matches_kernel(spark):
    df = spark.createDataFrame([("d0", PAGE), ("d1", "<p>no real content</p>")],
                               "doc_id string, html string")
    rows = {r["doc_id"]: r["spans"] for r in html_extract_stage(df).collect()}
    want = html_to_spans_py(PAGE)
    got = [
        {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"], "offset": s["offset"]}
        for s in rows["d0"]
    ]
    assert got == want
    assert [s["text"] for s in rows["d1"]] == ["no real content"]


def test_br_separates_words():
    spans = html_to_spans_py("<p>first line of text<br>second line of text</p>")
    assert spans[0]["text"] == "first line of text second line of text"
    spans = html_to_spans_py("<p>above the rule<hr/>below the rule</p>")
    assert spans[0]["text"] == "above the rule below the rule"
