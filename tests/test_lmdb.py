"""Pure-stdlib LMDB parser/writer tests: roundtrips, structural
invariants, overflow values, and the Spark recognition-store scan.

The writer exists to give the parser real LMDB page structures to
chew on; cross-validation against a C-lmdb-written file is a known
gap (no lmdb lib in this environment) and is documented in the module.
"""

import struct

import numpy as np
import pytest

from davar_lab_ocr_spark.sources.lmdb_format import (
    MAGIC,
    P_INVALID,
    PAGE,
    lmdb_get,
    lmdb_items,
    lmdb_write,
)


def test_roundtrip_small():
    items = {b"b": b"2", b"a": b"1", b"c": b"x" * 100}
    buf = lmdb_write(items)
    assert len(buf) % PAGE == 0
    got = list(lmdb_items(buf))
    # full scan comes back key-sorted (B+tree order)
    assert got == [(b"a", b"1"), (b"b", b"2"), (b"c", b"x" * 100)]
    assert lmdb_get(buf, b"b") == b"2"
    assert lmdb_get(buf, b"zz") is None


def test_roundtrip_empty():
    buf = lmdb_write({})
    assert list(lmdb_items(buf)) == []


def test_overflow_values():
    big = bytes(range(256)) * 40  # 10240 bytes -> 3 overflow pages
    items = {b"big": big, b"small": b"s"}
    buf = lmdb_write(items)
    assert dict(lmdb_items(buf)) == items


def test_multi_leaf_tree_with_branch_root():
    rng = np.random.default_rng(3)
    items = {
        f"key-{i:09d}".encode(): rng.integers(0, 256, size=int(rng.integers(10, 900)))
        .astype(np.uint8).tobytes()
        for i in range(64)
    }
    buf = lmdb_write(items)
    got = list(lmdb_items(buf))
    assert [k for k, _ in got] == sorted(items)
    assert dict(got) == items


def test_meta_structural_invariants():
    buf = lmdb_write({b"k": b"v"})
    # both meta pages carry the magic; live one is txnid 1
    for pg in (0, 1):
        magic, version = struct.unpack_from("<II", buf, pg * PAGE + 16)
        assert magic == MAGIC and version == 1
    # empty store has an invalid root (offset: header 16 + meta head 24
    # + FREE_DBI 48 + md_root at 40 within MAIN_DBI)
    empty = lmdb_write({})
    root = struct.unpack_from("<Q", empty, 16 + 24 + 48 + 40)[0]
    assert root == P_INVALID


def test_corrupt_file_rejected():
    with pytest.raises(ValueError):
        list(lmdb_items(b"\x00" * PAGE * 2))


def test_rcg_lmdb_scan_spark(spark, tmp_path):
    """End-to-end: write a recognition store (reference key scheme),
    scan it distributed, check images+labels line up."""
    from davar_lab_ocr_spark.sources.datalist import rcg_lmdb_scan

    rng = np.random.default_rng(11)
    items = {b"num-samples": b"5"}
    want = {}
    for i in range(1, 6):
        img = rng.integers(0, 256, size=int(rng.integers(50, 3000))).astype(np.uint8).tobytes()
        items[b"image-%09d" % i] = img
        items[b"label-%09d" % i] = b"word%d" % i
        want[i] = (img, f"word{i}")
    p = tmp_path / "data.mdb"
    p.write_bytes(lmdb_write(items))
    rows = rcg_lmdb_scan(spark, str(p)).collect()
    got = {r["sample_id"]: (bytes(r["image"]), r["label"]) for r in rows}
    assert got == want
