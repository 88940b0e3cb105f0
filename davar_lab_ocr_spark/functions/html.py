"""Table HTML assembly — parity with the reference's generate_html.

Re-expressed from davarocr/davar_table/core/post_processing/
generate_html.py:16-182 (area_to_html, format_html). The area grid is
scanned row-major; each visited cell emits <td> with row/colspan
derived from run lengths in the extended grid; a row whose head-label
cells outnumber body-label cells advances the </thead> insertion point
(quirk preserved: when no head row exists the FIRST row still lands
inside <thead>). format_html splices cell text after '<td>' / '>'
tokens in reverse, html-escaping single-char tokens.
"""

from __future__ import annotations

from html import escape


def area_to_html(area, labels: list, texts: list) -> tuple[list, list]:
    """Structure tokens + per-cell text from a cell-id area grid.

    area: [R, C] grid (ndarray or nested lists); cell ids are 1-based,
    empty cells <= 0.
    labels: per non-empty cell, [0]=head-ish (falsy) or [1]=body (truthy).
    texts: per non-empty cell, the cell text (str or token list).
    Returns (html_struct tokens, text_tokens dicts).
    """
    rows, cols = len(area), len(area[0])
    # python int grid, not numpy: the scan below does O(R*C) scalar
    # lookups/compares, where ndarray scalar indexing is ~10x slower
    # than list indexing (measured in the r6 extract profile — this
    # kernel runs once per table region inside the Arrow stage)
    ext = [[0] * (cols + 1) for _ in range(rows + 1)]
    for r in range(rows):
        row_src = area[r]
        row_dst = ext[r]
        for c in range(cols):
            row_dst[c] = int(row_src[c])
    struct: list[str] = []
    cell_texts: list[dict] = []
    headend = 0

    for r in range(rows):
        struct.append("<tr>")
        c = 0
        numhead = numbody = 0
        while c < cols:
            cur = ext[r][c]
            if r != 0 and cur == ext[r - 1][c]:
                c += 1  # continuation of a rowspan from above
                continue
            same_below = cur == ext[r + 1][c]
            same_right = cur == ext[r][c + 1]
            rowspan = colspan = 1
            if same_below:
                while cur == ext[r + rowspan][c]:
                    rowspan += 1
                    if r + rowspan == rows:
                        break
            if same_right:
                row_r = ext[r]
                while cur == row_r[c + colspan]:
                    colspan += 1
                    if c + colspan == cols:
                        break
            if rowspan == 1 and colspan == 1:
                struct.append("<td>")
            else:
                struct.append("<td")
                if rowspan > 1:
                    struct.append(' rowspan="%s"' % rowspan)
                if colspan > 1:
                    struct.append(' colspan="%s"' % colspan)
                struct.append(">")
            struct.append("</td>")

            cid = cur
            cell_texts.append({"tokens": texts[cid - 1] if cid >= 1 else [""]})
            if cid >= 1:
                if labels[cid - 1][0]:
                    numbody += 1
                else:
                    numhead += 1
            c += colspan
        struct.append("</tr>")
        if numhead > numbody:
            headend = r + 1

    tr_ends = [i for i, tok in enumerate(struct) if tok == "</tr>"]
    anchor = tr_ends[headend - 1] if headend else tr_ends[0]
    struct.insert(anchor + 1, "</thead>")
    struct.insert(anchor + 2, "<tbody>")
    struct.insert(0, "<thead>")
    struct.append("</tbody>")
    return struct, cell_texts


def format_html(html_struct: list, text_tokens: list) -> str:
    """Final table html: splice cell contents into the structure tokens."""
    code = list(html_struct)
    slots = [i for i, tok in enumerate(code) if tok in ("<td>", ">")]
    for i, cell in zip(slots[::-1], text_tokens[::-1]):
        toks = cell["tokens"]
        if toks:
            if isinstance(toks, str):
                # a plain-string cell is a sequence of 1-char tokens:
                # escaping each char == escaping the whole string
                code.insert(i + 1, escape(toks))
            else:
                parts = [escape(tok) if len(tok) == 1 else tok for tok in toks]
                code.insert(i + 1, "".join(parts))
    return "<html><body><table>%s</table></body></html>" % "".join(code)
