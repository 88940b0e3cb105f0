"""Golden parity on the reference's OWN shipped PubTabNet datalist
(demo/table_recognition/datalist/PubTabNet_train_datalist_examples.json):
datalist scan -> cell-span derivation -> empty-cell fill -> area_to_html
on REAL annotation shapes (112-cell tables, multi-row theads, span
cells, 1x1 empty cells).

Two facts are pinned:

1. For the 7 tables whose structure is fully expressed by the text
   bboxes, the html RECOVERED from bboxes alone equals the html built
   from the annotated cell spans — exact string equality.
2. The 3 remaining tables contain span cells whose PubTabNet bbox is
   the TEXT extent (a 9px-wide section header annotated colspan=3):
   no geometric post-processing can recover that span from the text
   bbox — LGPMA exists precisely to predict ALIGNED cell bboxes
   (lgpma paper / post_lgpma.py). On ALIGNED bboxes (the input the
   recovery contractually receives at LGPMA inference) the full chain
   — derive_cells -> empty-cell fill -> area_to_html -> format_html —
   reproduces the annotated html EXACTLY on 10/10 tables, span cells
   and multi-row theads included (unconditional golden, r5).
"""

import os

import numpy as np
import pytest

DATALIST = (
    "/root/reference/demo/table_recognition/datalist/"
    "PubTabNet_train_datalist_examples.json"
)

# tables whose annotated span cells exceed their text-bbox geometry
SPAN_BEYOND_BBOX = {
    "Images/train/PMC1626454_002_00.png",
    "Images/train/PMC2838834_005_00.png",
    "Images/train/PMC5198506_004_00.png",
}


def _html_from_cells(cells, labels, texts):
    from davar_lab_ocr_spark.functions.html import area_to_html, format_html

    cn = np.asarray(cells, dtype=np.int64)
    area = np.zeros((cn[:, 2].max() + 1, cn[:, 3].max() + 1))
    for cid, (r0, c0, r1, c1) in enumerate(cells):
        area[r0 : r1 + 1, c0 : c1 + 1] = cid + 1
    assert (area != 0).all(), "annotation grid must tile fully"
    struct, toks = area_to_html(area, labels, texts)
    return format_html(struct, toks)


def _recovered_html(bboxes, labels, texts):
    from davar_lab_ocr_spark.functions.html import area_to_html, format_html
    from davar_lab_ocr_spark.operators.table import derive_cells

    cells = derive_cells(bboxes)
    cn = np.asarray(cells, dtype=np.int64)
    area = np.zeros((cn[:, 2].max() + 1, cn[:, 3].max() + 1))
    for cid, (r0, c0, r1, c1) in enumerate(cells):
        area[r0 : r1 + 1, c0 : c1 + 1] = cid + 1
    empty = -1
    for r in range(area.shape[0]):
        for c in range(area.shape[1]):
            if area[r, c] == 0:
                area[r, c] = empty
                empty -= 1
    struct, toks = area_to_html(area, labels, texts)
    return format_html(struct, toks), cells


@pytest.mark.skipif(not os.path.exists(DATALIST), reason="reference checkout absent")
def test_pubtabnet_scan_and_structure_recovery(spark):
    from davar_lab_ocr_spark.sources.datalist import read_davar_datalist

    rows = read_davar_datalist(spark, DATALIST).collect()
    assert len(rows) == 10
    n_equal = 0
    for row in rows:
        regions = row["regions"]
        cells_all = [list(r["cell"]) for r in regions]
        labels_all = [[int(x) for x in r["label"]] for r in regions]
        nonempty = [i for i, r in enumerate(regions) if len(r["bbox"]) == 4]
        ord_of = {i: n for n, i in enumerate(nonempty)}
        texts_all = ["" if i not in ord_of else f"t{ord_of[i]}" for i in range(len(regions))]

        ann_html = _html_from_cells(cells_all, labels_all, texts_all)
        rec_html, rec_cells = _recovered_html(
            [list(regions[i]["bbox"]) for i in nonempty],
            [labels_all[i] for i in nonempty],
            [f"t{n}" for n in range(len(nonempty))],
        )
        if row["doc_id"] in SPAN_BEYOND_BBOX:
            # every disagreement must be an annotated span wider/taller
            # than the recovered one (text bbox can't express the span)
            want = [cells_all[i] for i in nonempty]
            diffs = [(g, w) for g, w in zip(rec_cells, want) if g != w]
            assert diffs, "expected span-beyond-bbox disagreement"
            # the ROOT CAUSE diff: an annotated span strictly larger
            # than its recovered counterpart (remaining diffs are the
            # knock-on row/col index shifts that collapse produces)
            assert any(
                (w[3] - w[1] > g[3] - g[1]) or (w[2] - w[0] > g[2] - g[0])
                for g, w in diffs
            )
        else:
            assert rec_html == ann_html
            n_equal += 1
    assert n_equal == 7

    # LGPMA-style ALIGNED bboxes (grid row/col pixel extents) recover
    # the annotated spans exactly on all 10 tables, span cells included
    for row in rows:
        regions = row["regions"]
        cells_all = [list(r["cell"]) for r in regions]
        nonempty = [i for i, r in enumerate(regions) if len(r["bbox"]) == 4]
        colx, rowy = {}, {}
        for i in nonempty:
            r0, c0, r1, c1 = cells_all[i]
            x0, y0, x1, y1 = regions[i]["bbox"]
            if c0 == c1:
                lo, hi = colx.get(c0, (x0, x1))
                colx[c0] = (min(lo, x0), max(hi, x1))
            if r0 == r1:
                lo, hi = rowy.get(r0, (y0, y1))
                rowy[r0] = (min(lo, y0), max(hi, y1))
        aligned = [
            [
                colx[cells_all[i][1]][0],
                rowy[cells_all[i][0]][0],
                colx[cells_all[i][3]][1],
                rowy[cells_all[i][2]][1],
            ]
            for i in nonempty
        ]
        from davar_lab_ocr_spark.operators.table import derive_cells

        assert derive_cells(aligned) == [cells_all[i] for i in nonempty]

        # ...and all the way to UNCONDITIONAL html equality on 10/10:
        # aligned bboxes -> derive_cells -> empty-cell fill ->
        # area_to_html -> format_html equals the html built from the
        # annotated cell spans, span cells and multi-row theads included
        labels_all = [[int(x) for x in r["label"]] for r in regions]
        ord_of = {i: n for n, i in enumerate(nonempty)}
        texts_all = [
            "" if i not in ord_of else f"t{ord_of[i]}" for i in range(len(regions))
        ]
        ann_html = _html_from_cells(cells_all, labels_all, texts_all)
        rec_html, _ = _recovered_html(
            aligned,
            [labels_all[i] for i in nonempty],
            [f"t{n}" for n in range(len(nonempty))],
        )
        assert rec_html == ann_html
