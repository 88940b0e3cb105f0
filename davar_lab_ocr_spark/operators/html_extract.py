"""HTML main-content extraction: boilerplate strip + DOM heuristics.

The web-scale face of the extraction pipeline (BASELINE.json north
rule: "HTML boilerplate strip, PDF/layout parse, DOM heuristics"): an
HTML document goes in, ordered (kind, text, media_ref, offset) spans
come out — the same span schema the layout/OCR path produces, so HTML
and scanned-document corpora union into one table.

Heuristics are the public Boilerpipe/Readability family, implemented
over the stdlib html.parser (no lxml/bs4 in this container):

- tag blacklist: content inside <script>/<style>/<nav>/<header>/
  <footer>/<aside>/<noscript>/<form>/<iframe> is never content;
- link density: a block whose characters are mostly inside <a> tags is
  navigation/boilerplate (threshold 0.5);
- minimum text length for plain blocks (headings exempt);
- kind mapping: h1-h3 -> 'title', li -> 'list', everything else
  'text'; <img src> -> a 'figure' span carrying media_ref.

Spark shape: one Arrow batch stage (html is per-row sequential parse,
trivially batched); span assembly and ordering are positional within
the row — zero shuffles.
"""

from __future__ import annotations

from html.parser import HTMLParser

import pyarrow as pa
import pyspark.sql.types as T
from pyspark.sql import DataFrame

BOILERPLATE_TAGS = frozenset(
    ["script", "style", "nav", "header", "footer", "aside", "noscript", "form", "iframe"]
)
BLOCK_TAGS = frozenset(
    ["p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "article", "section", "pre", "blockquote"]
)
HEADING_TAGS = frozenset(["h1", "h2", "h3"])
VOID_TAGS = frozenset(["img", "br", "hr", "meta", "link", "input"])


class _MainContentParser(HTMLParser):
    def __init__(self, link_density_max: float, min_chars: int):
        super().__init__(convert_charrefs=True)
        self.link_density_max = link_density_max
        self.min_chars = min_chars
        self.spans: list[tuple[str, str, str]] = []  # (kind, text, media_ref)
        self._boiler_depth = 0
        self._link_depth = 0
        self._block_stack: list[dict] = []

    # -- block lifecycle ---------------------------------------------------
    def _open_block(self, tag: str):
        self._block_stack.append({"tag": tag, "chars": [], "link_chars": 0})

    def _close_block(self):
        blk = self._block_stack.pop()
        text = "".join(blk["chars"])
        norm = " ".join(text.split())
        if not norm:
            return
        n = len(norm)
        heading = blk["tag"] in HEADING_TAGS
        link_density = blk["link_chars"] / max(len(text), 1)
        if link_density > self.link_density_max:
            return
        if not heading and n < self.min_chars:
            return
        kind = "title" if heading else ("list" if blk["tag"] == "li" else "text")
        self.spans.append((kind, norm, ""))

    # -- HTMLParser hooks ----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in VOID_TAGS:
            self.handle_startendtag(tag, attrs)
            return
        if tag in BOILERPLATE_TAGS:
            self._boiler_depth += 1
            return
        if self._boiler_depth:
            return
        if tag == "a":
            self._link_depth += 1
        if tag in BLOCK_TAGS:
            self._open_block(tag)

    def handle_startendtag(self, tag, attrs):
        if self._boiler_depth:
            return
        if tag == "img":
            src = dict(attrs).get("src", "")
            if src:
                self.spans.append(("figure", "", src))
        elif tag in ("br", "hr") and self._block_stack:
            # line separators are whitespace, not glue — without this,
            # 'line one<br>line two' fuses into 'line oneline two'
            self._block_stack[-1]["chars"].append(" ")

    def handle_endtag(self, tag):
        if tag in BOILERPLATE_TAGS:
            self._boiler_depth = max(self._boiler_depth - 1, 0)
            return
        if self._boiler_depth:
            return
        if tag == "a":
            self._link_depth = max(self._link_depth - 1, 0)
        if tag in BLOCK_TAGS:
            # close the innermost matching open block (forgiving nesting)
            for i in range(len(self._block_stack) - 1, -1, -1):
                if self._block_stack[i]["tag"] == tag:
                    while len(self._block_stack) > i:
                        self._close_block()
                    break

    def handle_data(self, data):
        if self._boiler_depth or not self._block_stack:
            return
        blk = self._block_stack[-1]
        blk["chars"].append(data)
        if self._link_depth:
            blk["link_chars"] += len(data)

    def close(self):
        super().close()
        while self._block_stack:
            self._close_block()


def html_to_spans_py(
    html: str, link_density_max: float = 0.5, min_chars: int = 10
) -> list[dict]:
    """One HTML document -> ordered main-content spans
    [(kind, text, media_ref, offset)]."""
    parser = _MainContentParser(link_density_max, min_chars)
    parser.feed(html or "")
    parser.close()
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(parser.spans)
    ]


SPANS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("media_ref", T.StringType()),
            T.StructField("offset", T.IntegerType()),
        ]
    )
)


def html_extract_stage(
    df: DataFrame,
    html_col: str = "html",
    link_density_max: float = 0.5,
    min_chars: int = 10,
) -> DataFrame:
    """(doc_id, html) -> (doc_id, spans) — the HTML face of the
    extraction pipeline, same output schema as plans/extract.extract."""
    out_schema = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("spans", SPANS_TYPE)]
    )
    pa_spans = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )

    def run(batches):
        for batch in batches:
            htmls = batch.column(html_col).to_pylist()
            spans = [html_to_spans_py(h, link_density_max, min_chars) for h in htmls]
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), pa.array(spans, type=pa_spans)],
                names=["doc_id", "spans"],
            )

    return df.mapInArrow(run, schema=out_schema)
