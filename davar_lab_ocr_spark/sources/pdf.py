"""Minimal PDF text extraction (the "PDF parse" face of the north
rule) — pure stdlib: zlib for FlateDecode, regex over content streams.

Scope: PDFs whose text is drawn with the standard text operators —
`Tf` (font size), `Tm` (text matrix; position from its e/f terms),
`Td`/`TD` (relative line moves composed onto the line matrix, per the
spec), `Tj` (show string) and `TJ` (show array: string runs
concatenated, kern numbers ignored) — in uncompressed or FlateDecode
content streams. That covers the overwhelmingly common digitally-born
shapes, including the `[(str) kern (str)] TJ` + `Tm` form most
generators emit. Encrypted PDFs, CID/Type0 fonts, and full CTM
composition (rotated/scaled text) are out of scope (a real deploy
would swap ``pdf_to_spans_py`` for a library call; the Spark stage and
span contract stay identical).

Output is the engine-wide span schema (kind, text, media_ref, offset):
reading order by (page, -y, x) descending-y (PDF y-axis points up),
kind='title' for font sizes >= 18.
"""

from __future__ import annotations

import re
import zlib

import pyarrow as pa
import pyspark.sql.types as T
from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# writer (fixture generator)
# ---------------------------------------------------------------------------


def make_simple_pdf(pages: list[list[tuple[float, float, float, str]]],
                    compress: bool = True) -> bytes:
    """Write a minimal PDF 1.4: one content stream per page, each text
    item (x, y, font_size, text) positioned with an absolute `Tm`
    matrix and shown as a `TJ` array with a kern split (the dominant
    real-world generator shape) — long items split into two kerned
    string runs, short ones use plain `Tj`. Text must not contain
    backslashes or parentheses (escaping kept out of scope on the
    writer; the PARSER handles escapes)."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids = []
    content_ids = []
    for items in pages:
        parts = [b"BT"]
        for x, y, size, text in items:
            pos = f"/F1 {size:g} Tf 1 0 0 1 {x:g} {y:g} Tm".encode()
            if len(text) > 8:
                cut = len(text) // 2
                show = f"[({text[:cut]}) -28 ({text[cut:]})] TJ".encode()
            else:
                show = f"({text}) Tj".encode()
            parts.append(pos + b" " + show)
        parts.append(b"ET")
        stream = b"\n".join(parts)
        if compress:
            data = zlib.compress(stream)
            body = b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream" % (
                len(data), data)
        else:
            body = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
        content_ids.append(add(body))
        page_ids.append(None)  # placeholder; page objects reference pages root

    pages_root = len(objs) + len(pages) + 1
    for i, cid in enumerate(content_ids):
        page_ids[i] = add(
            b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (pages_root, font, cid)
        )
    kids = b" ".join(b"%d 0 R" % p for p in page_ids)
    root_pages = add(
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, len(page_ids))
    )
    assert root_pages == pages_root
    catalog = add(b"<< /Type /Catalog /Pages %d 0 R >>" % root_pages)

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog, xref_at)
    )
    return bytes(out)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------
# match the dict + the start of the stream only; the payload is sliced
# by /Length, NOT by searching for `endstream` — a regex that strips a
# trailing `\r?\n` before endstream eats the final data byte whenever
# the compressed payload itself ends in 0x0d (~1/256 of streams) and
# the whole page silently fails to inflate
_STREAM_HDR_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n", re.S)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)")
_NUM = rb"-?[\d.]+"
_STR = rb"\((?:\\.|[^()\\])*\)"
# sequential text-operator scanner: each alternative captures one op;
# ops are applied IN STREAM ORDER so Td composes and Tm overrides the
# way the spec says (PDF 32000-1 §9.4.2)
_TEXT_OP_RE = re.compile(
    rb"(?P<bt>BT)"
    rb"|/\w+\s+(?P<tf>" + _NUM + rb")\s+Tf"
    rb"|(?P<tm>(?:" + _NUM + rb"\s+){5}" + _NUM + rb")\s+Tm"
    rb"|(?P<tl>" + _NUM + rb")\s+TL"
    rb"|(?P<tdx>" + _NUM + rb")\s+(?P<tdy>" + _NUM + rb")\s+T(?P<tdcap>[dD])"
    rb"|(?P<tstar>T\*)"
    rb"|(?P<tj>" + _STR + rb")\s*Tj"
    rb"|(?P<quote>" + _STR + rb")\s*'"
    rb"|\[(?P<tjarr>(?:" + _STR + rb"|" + _NUM + rb"|\s+)*)\]\s*TJ"
)
_STR_RE = re.compile(_STR)
_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t",
            b"(": b"(", b")": b")", b"\\": b"\\"}
_ESCAPE_RE = re.compile(rb"\\(.)", re.S)


def _unescape(raw: bytes) -> str:
    """Single-pass escape decode: sequential str.replace would let one
    replacement's output be re-read by the next (b'\\\\n' — escaped
    backslash then literal n — must stay backslash+n, not newline)."""
    return _ESCAPE_RE.sub(
        lambda m: _ESCAPES.get(m.group(1), m.group(1)), raw
    ).decode("latin-1")


def pdf_to_spans_py(pdf: bytes, title_min_size: float = 18.0) -> list[dict]:
    """PDF bytes -> ordered spans [(kind, text, media_ref='', offset)].
    Reading order: (page, -y, x); y points up in PDF user space."""
    items = []  # (page, -y, x, size, text)
    page = 0
    for m in _STREAM_HDR_RE.finditer(pdf or b""):
        header = m.group(1)
        length = _LENGTH_RE.search(header)
        if not length:
            continue
        start = m.end()
        data = pdf[start : start + int(length.group(1))]
        if b"/FlateDecode" in header:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        if b"BT" not in data:
            continue
        size = 12.0
        x = y = 0.0
        leading = 0.0
        for t in _TEXT_OP_RE.finditer(data):
            if t.group("bt"):
                # BT resets the text/line matrices to identity; leading
                # and font size are TEXT STATE (PDF 32000-1 §9.3) and
                # persist across BT/ET, so neither resets here
                x = y = 0.0
            elif t.group("tf"):
                size = float(t.group("tf"))
            elif t.group("tm"):
                # position = translation part (e, f) of the matrix
                nums = t.group("tm").split()
                x, y = float(nums[4]), float(nums[5])
            elif t.group("tl"):
                leading = float(t.group("tl"))
            elif t.group("tdx"):
                # Td/TD translate the LINE matrix relative to its
                # current origin (cumulative), not absolutely; TD also
                # sets the leading to -ty (spec table 108)
                x += float(t.group("tdx"))
                y += float(t.group("tdy"))
                if t.group("tdcap") == b"D":
                    leading = -float(t.group("tdy"))
            elif t.group("tstar"):
                y -= leading  # next line: 0 -TL Td
            elif t.group("tj"):
                items.append((page, -y, x, size, _unescape(t.group("tj")[1:-1])))
            elif t.group("quote"):
                y -= leading  # ' = T* then show
                items.append((page, -y, x, size, _unescape(t.group("quote")[1:-1])))
            elif t.group("tjarr") is not None:
                # TJ: concatenate string runs, ignore kern numbers
                text = "".join(
                    _unescape(m.group(0)[1:-1])
                    for m in _STR_RE.finditer(t.group("tjarr"))
                )
                items.append((page, -y, x, size, text))
        page += 1
    items.sort(key=lambda it: (it[0], it[1], it[2]))
    return [
        {
            "kind": "title" if size >= title_min_size else "text",
            "text": text,
            "media_ref": "",
            "offset": i,
        }
        for i, (_p, _ny, _x, size, text) in enumerate(items)
    ]


def pdf_extract_stage(df: DataFrame, pdf_col: str = "pdf") -> DataFrame:
    """(doc_id, pdf binary) -> (doc_id, spans) — same span contract as
    the HTML and layout extraction paths."""
    spans_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("kind", T.StringType()),
                T.StructField("text", T.StringType()),
                T.StructField("media_ref", T.StringType()),
                T.StructField("offset", T.IntegerType()),
            ]
        )
    )
    out_schema = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("spans", spans_type)]
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
            pdfs = batch.column(pdf_col).to_pylist()
            spans = [pdf_to_spans_py(p) for p in pdfs]
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), pa.array(spans, type=pa_spans)],
                names=["doc_id", "spans"],
            )

    return df.mapInArrow(run, schema=out_schema)
