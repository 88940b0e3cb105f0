"""Generate committed expected-output parquet fixtures for the driver's
DuckDB oracle.

Each fixture is derived WITHOUT running the Spark pipeline:

- expected_flagship / expected_resume / expected_fullchain: the pure-
  python span oracles that the corpus/fixture generators compute
  alongside the raw inputs (corpus.py gen_doc / full_chain.py
  make_fullchain_fixture) — a genuinely independent second
  implementation of the extraction semantics.
- expected_east: the planted golden quads from make_east_fixture
  (decode must reproduce them exactly; conf = 0.9 * n_pixels by LANMS
  score accumulation) — independent of the decode kernel.
- expected_tp: a LOCAL single-process replay of tp_decode_py on the
  fixture maps. The kernel itself is pinned by hand-derived goldens in
  tests/test_tp_decode.py; this fixture additionally pins the
  distributed Arrow stage to the pinned kernel (plumbing + determinism
  check, not an independent re-derivation — documented as such).

Outputs land in tests/fixtures/*.parquet and are committed; oracle_sql()
reads them via read_parquet(). Re-run this script if a fixture
generator changes (fixtures are deterministic).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXDIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tests", "fixtures")


def _write_spans(expected_rows, path):
    """Explode expected documents rows -> scalar span rows."""
    recs = {"doc_id": [], "offset": [], "kind": [], "text": [], "media_ref": []}
    for row in expected_rows:
        for s in row["spans"]:
            recs["doc_id"].append(row["doc_id"])
            recs["offset"].append(s["offset"])
            recs["kind"].append(s["kind"])
            recs["text"].append(s["text"])
            recs["media_ref"].append(s["media_ref"])
    tbl = pa.table(
        {
            "doc_id": pa.array(recs["doc_id"], pa.string()),
            "offset": pa.array(recs["offset"], pa.int32()),
            "kind": pa.array(recs["kind"], pa.string()),
            "text": pa.array(recs["text"], pa.string()),
            "media_ref": pa.array(recs["media_ref"], pa.string()),
        }
    )
    pq.write_table(tbl, path)
    print(f"{path}: {tbl.num_rows} rows")


def main():
    os.makedirs(FIXDIR, exist_ok=True)

    from davar_lab_ocr_spark.corpus import make_raw_corpus

    # flagship: same params as __spark_entry__.entry()
    _, expected = make_raw_corpus(200, seed=7, giant_every=97, giant_size=600)
    _write_spans(expected, os.path.join(FIXDIR, "expected_flagship.parquet"))

    # resumable_extract: same params as the query (60 docs, seed 19)
    _, expected = make_raw_corpus(60, seed=19, giant_every=0)
    _write_spans(expected, os.path.join(FIXDIR, "expected_resume.parquet"))

    # full_chain_extract: same params as the query (40 docs, seed 83)
    from davar_lab_ocr_spark.plans.full_chain import make_fullchain_fixture

    _, expected = make_fullchain_fixture(40, seed=83)
    _write_spans(expected, os.path.join(FIXDIR, "expected_fullchain.parquet"))

    # east_decode: planted golden quads, query fixture params (40 docs)
    from davar_lab_ocr_spark.operators.detection import make_east_fixture

    recs = {"doc_id": [], **{c: [] for c in
            ("x0", "y0", "x1", "y1", "x2", "y2", "x3", "y3")}, "conf": []}
    for d in range(40):
        row, golden = make_east_fixture(d, mode="RBOX" if d % 2 else "QUAD")
        for quad, n_pix in golden:
            recs["doc_id"].append(row["doc_id"])
            for i, c in enumerate(("x0", "y0", "x1", "y1", "x2", "y2", "x3", "y3")):
                recs[c].append(float(round(quad[i], 4)))
            recs["conf"].append(float(round(0.9 * n_pix, 4)))
    tbl = pa.table({k: pa.array(v, pa.string() if k == "doc_id" else pa.float64())
                    for k, v in recs.items()})
    pq.write_table(tbl, os.path.join(FIXDIR, "expected_east.parquet"))
    print(f"expected_east.parquet: {tbl.num_rows} rows")

    # tp_decode: local kernel replay on the query's fixture rows
    from davar_lab_ocr_spark.operators.tp_decode import make_tp_fixture, tp_decode_py

    recs = {"doc_id": [], "inst": [], "points": []}
    for i in range(20):
        fx = make_tp_fixture(16, 16, 64 + 4 * (i % 5), 32)
        for inst, poly in enumerate(tp_decode_py(**fx)):
            recs["doc_id"].append(f"tp-{i}")
            recs["inst"].append(inst)
            recs["points"].append(",".join(str(int(v)) for v in poly))
    tbl = pa.table(
        {
            "doc_id": pa.array(recs["doc_id"], pa.string()),
            "inst": pa.array(recs["inst"], pa.int32()),
            "points": pa.array(recs["points"], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(FIXDIR, "expected_tp.parquet"))
    print(f"expected_tp.parquet: {tbl.num_rows} rows")


if __name__ == "__main__":
    main()
