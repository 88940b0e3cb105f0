"""Pure-stdlib LMDB data-file parser (+ minimal writer for fixtures).

The reference reads recognition datasets from LMDB stores
(davarocr/davar_rcg/datasets/pipelines/davar_loading_lmdb.py:23-302,
keys 'num-samples' / 'image-%09d' / 'label-%09d') via the lmdb C
library, which is not in this environment. The on-disk format, however,
is public (the LMDB source's mdb.c page/node layout), and a READ-ONLY
parser of a quiesced data.mdb is small: two meta pages pick the live
B+tree root; branch/leaf pages are offset arrays of nodes; big values
live on contiguous overflow pages. That is all an ETL scan needs.

Layout constants (little-endian, default 4096-byte pages):

- page header (16 bytes): pgno u64, pad u16, flags u16, lower u16,
  upper u16 — except OVERFLOW pages, where bytes 12..16 are the u32
  page count of the contiguous chunk.
- meta page (flags META=0x08): header, then magic u32 (0xBEEFC0DE),
  version u32, address u64, mapsize u64, two MDB_db records (FREE_DBI
  then MAIN_DBI), last_pg u64, txnid u64. The live meta is the one
  with the larger txnid.
- MDB_db (48 bytes): pad u32, flags u16, depth u16, branch_pages u64,
  leaf_pages u64, overflow_pages u64, entries u64, root u64.
- node: lo u16, hi u16, flags u16, ksize u16, key bytes, then value
  bytes (leaf; size = lo | hi<<16) or nothing (branch; child pgno =
  lo | hi<<16 | flags<<32). Leaf node flag BIGDATA=0x01 replaces the
  value with a u64 overflow pgno. Node offsets (u16 each, from page
  start) sit right after the page header; their count is
  (lower - 16) / 2.

Scope: plain MAIN_DBI without MDB_DUPSORT, 4096-byte pages, read path
only. The writer emits the same structures (leaf chain + one optional
branch root + both metas) purely so tests and the ETL demo have real
LMDB bytes to parse — self-roundtrip plus structural invariants pin it;
cross-validation against a C-lmdb-written file is pending an lmdb
install (documented limitation).
"""

from __future__ import annotations

import struct

PAGE = 4096
_HDRSZ = 16
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
MAGIC = 0xBEEFC0DE
VERSION = 1
P_INVALID = 0xFFFFFFFFFFFFFFFF

_DB = struct.Struct("<IHHQQQQQ")  # pad, flags, depth, branch, leaf, ovf, entries, root
_META = struct.Struct("<IIQQ")  # magic, version, address, mapsize (then 2x _DB, last_pg, txnid)
_NODE = struct.Struct("<HHHH")  # lo, hi, flags, ksize


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------
def _live_main_db(buf: bytes) -> tuple[int, int]:
    """(root pgno, entries) of MAIN_DBI from the live meta page."""
    best = None
    for pg in (0, 1):
        base = pg * PAGE
        if len(buf) < base + PAGE:
            continue
        flags = struct.unpack_from("<H", buf, base + 10)[0]
        off = base + _HDRSZ
        magic, version, _addr, _mapsize = _META.unpack_from(buf, off)
        if not (flags & P_META) or magic != MAGIC or version != VERSION:
            continue
        main = _DB.unpack_from(buf, off + _META.size + _DB.size)
        txnid = struct.unpack_from("<Q", buf, off + _META.size + 2 * _DB.size + 8)[0]
        if best is None or txnid > best[0]:
            best = (txnid, main[7], main[6])
    if best is None:
        raise ValueError("not an LMDB data file (no valid meta page)")
    return best[1], best[2]


def _page(buf: bytes, pgno: int):
    base = pgno * PAGE
    _pgno, _pad, flags, lower, upper = struct.unpack_from("<QHHHH", buf, base)
    return base, flags, lower, upper


def _node_offsets(buf: bytes, base: int, lower: int) -> tuple[int, ...]:
    n = (lower - _HDRSZ) >> 1
    return struct.unpack_from("<%dH" % n, buf, base + _HDRSZ)


def _iter_tree(buf: bytes, pgno: int):
    base, flags, lower, _upper = _page(buf, pgno)
    offs = _node_offsets(buf, base, lower)
    if flags & P_LEAF:
        for off in offs:
            lo, hi, nflags, ksize = _NODE.unpack_from(buf, base + off)
            kstart = base + off + _NODE.size
            key = bytes(buf[kstart : kstart + ksize])
            size = lo | (hi << 16)
            if nflags & F_BIGDATA:
                ovpg = struct.unpack_from("<Q", buf, kstart + ksize)[0]
                ovbase = ovpg * PAGE
                val = bytes(buf[ovbase + _HDRSZ : ovbase + _HDRSZ + size])
            else:
                val = bytes(buf[kstart + ksize : kstart + ksize + size])
            yield key, val
    elif flags & P_BRANCH:
        for off in offs:
            lo, hi, nflags, _ksize = _NODE.unpack_from(buf, base + off)
            child = lo | (hi << 16) | (nflags << 32)
            yield from _iter_tree(buf, child)
    else:
        raise ValueError(f"unexpected page flags {flags:#x} at pgno {pgno}")


def lmdb_items(buf: bytes):
    """Full ordered (key, value) scan of a quiesced LMDB data file."""
    root, _entries = _live_main_db(buf)
    if root == P_INVALID:
        return
    yield from _iter_tree(buf, root)


def lmdb_get(buf: bytes, key: bytes) -> bytes | None:
    """Point lookup (linear leaf probe via the full scan — the ETL use
    case is the scan; this exists for tests and spot reads)."""
    for k, v in lmdb_items(buf):
        if k == key:
            return v
    return None


def make_lmdb_fixture_items(n: int = 40, seed: int = 29) -> dict[bytes, bytes]:
    """Deterministic recognition-store content (reference key scheme,
    davar_loading_lmdb.py): shared by the lmdb_scan query (which writes
    + scans the store) and the fixture generator (which derives the
    expected output STRAIGHT from this dict, independent of the
    writer/parser under test). Sizes straddle the overflow threshold."""
    import numpy as np

    rng = np.random.default_rng(seed)
    items = {b"num-samples": str(n).encode()}
    for i in range(1, n + 1):
        size = int(rng.integers(64, 4000))
        img = rng.integers(0, 256, size=size).astype(np.uint8).tobytes()
        items[b"image-%09d" % i] = img
        items[b"label-%09d" % i] = f"word-{i:04d}".encode()
    return items


# ---------------------------------------------------------------------------
# writer (fixtures / demo stores)
# ---------------------------------------------------------------------------
def _even(n: int) -> int:
    return n + (n & 1)


def lmdb_write(items: dict[bytes, bytes]) -> bytes:
    """Serialize a key->value dict as a minimal valid LMDB data file:
    sorted leaf chain, one branch root when more than one leaf, values
    too big for half a page on overflow pages. Single committed txn."""
    entries = sorted(items.items())
    pages: dict[int, bytes] = {}
    next_pg = 2  # 0,1 are the metas

    def alloc(n: int = 1) -> int:
        nonlocal next_pg
        pg = next_pg
        next_pg += n
        return pg

    def page_bytes(pgno: int, flags: int, nodes: list[bytes]) -> bytes:
        body = bytearray(PAGE)
        ptrs = []
        upper = PAGE
        for node in nodes:
            upper -= _even(len(node))
            body[upper : upper + len(node)] = node
            ptrs.append(upper)
        lower = _HDRSZ + 2 * len(nodes)
        assert lower <= upper, "page overflow"
        # real LMDB stores the page's own number in the header (mdb.c
        # mp_pgno); the in-repo reader indexes by file offset, but a C
        # mdb_dump/debug-assert cross-check reads this field
        struct.pack_into("<QHHHH", body, 0, pgno, 0, flags, lower, upper)
        for i, p in enumerate(ptrs):
            struct.pack_into("<H", body, _HDRSZ + 2 * i, p)
        return bytes(body)

    # big-value threshold: LMDB uses ~page/2 minus overhead; any value
    # whose node would not fit two-per-page goes to overflow
    max_inline = (PAGE - _HDRSZ) // 2 - _NODE.size - 64

    leaf_nodes: list[list[bytes]] = [[]]
    leaf_first_keys: list[bytes] = []
    leaf_free = [PAGE - _HDRSZ]
    n_ovf = 0

    def add_leaf_node(node: bytes, key: bytes):
        nonlocal leaf_free
        need = _even(len(node)) + 2
        if need > leaf_free[-1]:
            leaf_nodes.append([])
            leaf_free.append(PAGE - _HDRSZ)
        if not leaf_nodes[-1]:
            leaf_first_keys.append(key)
        leaf_nodes[-1].append(node)
        leaf_free[-1] -= need

    ovf_chunks: list[tuple[int, bytes]] = []
    for key, val in entries:
        if len(val) > max_inline:
            n_pages = (len(val) + _HDRSZ + PAGE - 1) // PAGE
            ovpg = alloc(n_pages)
            ov = bytearray(n_pages * PAGE)
            struct.pack_into("<QHHI", ov, 0, ovpg, 0, P_OVERFLOW, n_pages)
            ov[_HDRSZ : _HDRSZ + len(val)] = val
            ovf_chunks.append((ovpg, bytes(ov)))
            n_ovf += n_pages
            node = _NODE.pack(len(val) & 0xFFFF, len(val) >> 16, F_BIGDATA, len(key))
            node += key + struct.pack("<Q", ovpg)
        else:
            node = _NODE.pack(len(val) & 0xFFFF, len(val) >> 16, 0, len(key))
            node += key + val
        add_leaf_node(node, key)

    leaf_pgnos = [alloc() for _ in leaf_nodes]
    for pg, nodes in zip(leaf_pgnos, leaf_nodes):
        pages[pg] = page_bytes(pg, P_LEAF, nodes)
    for pg, data in ovf_chunks:
        pages[pg] = data

    if len(leaf_pgnos) == 1:
        root, depth, n_branch = leaf_pgnos[0], 1, 0
    else:
        bnodes = []
        for i, (pg, first_key) in enumerate(zip(leaf_pgnos, leaf_first_keys)):
            k = b"" if i == 0 else first_key  # branch node 0 carries no key
            bnodes.append(
                _NODE.pack(pg & 0xFFFF, (pg >> 16) & 0xFFFF, pg >> 32, len(k)) + k
            )
        root = alloc()
        pages[root] = page_bytes(root, P_BRANCH, bnodes)
        depth, n_branch = 2, 1

    if not entries:
        root, depth = P_INVALID, 0

    last_pg = next_pg - 1
    out = bytearray(next_pg * PAGE)
    for pg, data in pages.items():
        out[pg * PAGE : pg * PAGE + len(data)] = data

    for meta_pg, txnid in ((0, 0), (1, 1)):  # meta 1 is the live txn
        base = meta_pg * PAGE
        struct.pack_into("<QHHHH", out, base, meta_pg, 0, P_META, _HDRSZ, PAGE)
        off = base + _HDRSZ
        _META.pack_into(out, off, MAGIC, VERSION, 0, next_pg * PAGE)
        _DB.pack_into(out, off + _META.size, 0, 0, 0, 0, 0, 0, 0, P_INVALID)  # FREE_DBI
        _DB.pack_into(
            out, off + _META.size + _DB.size,
            0, 0, depth, n_branch, len(leaf_pgnos) if entries else 0, n_ovf,
            len(entries), root,
        )
        tail = off + _META.size + 2 * _DB.size
        struct.pack_into("<QQ", out, tail, last_pg, txnid)
    return bytes(out)
