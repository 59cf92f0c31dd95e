"""Hand-construct a canonical LMDB data.mdb fixture, independent of
io/lmdb_lite.LmdbWriter.

Byte layout follows mdb.c's on-disk structures directly (LMDB 0.9.x,
the format py-lmdb writes on x86-64 — what data/LRHR_dataset.py:28-38
reads in the wild), reproducing the artifacts of a REAL single-write-txn
session that LmdbWriter's idealized bottom-up builder never produces:

  * page numbers allocated in INSERT/SPLIT order, so the branch root and
    overflow chain sit between the leaves in pgno space (LmdbWriter
    writes leaves first, branches after);
  * node heap bytes within a leaf in INSERTION order while mp_ptrs sort
    by key (mdb_node_add appends at mp_upper; LmdbWriter packs in key
    order);
  * meta parity: txn 1 commits to meta page 1 (mdb.c writes txnid & 1),
    meta page 0 keeps the empty txnid-0 snapshot from mdb_env_init_meta
    with root = P_INVALID;
  * the leftmost node of a branch page has ksize 0 (mdb_page_split adds
    the first child with a NULL key);
  * an F_BIGDATA node whose value spans a 3-page overflow chain
    (mp_pages u32 in the header union).

mdb.c struct reference (all little-endian):
  MDB_page:  mp_pgno u64 | mp_pad u16 | mp_flags u16 |
             { mp_lower u16, mp_upper u16 } or mp_pages u32    (16 bytes)
  MDB_node:  mn_lo u16 | mn_hi u16 | mn_flags u16 | mn_ksize u16 | key...
             (leaf: lo|hi<<16 = data size; branch: lo|hi<<16|flags<<32 =
              child pgno; node sizes rounded to 2-byte alignment)
  MDB_meta:  mm_magic u32 (0xBEEFC0DE) | mm_version u32 (1) |
             mm_address u64 | mm_mapsize u64 | mm_dbs[2] (MDB_db x2,
             page size stowed in mm_dbs[0].md_pad) | mm_last_pg u64 |
             mm_txnid u64
  MDB_db:    md_pad u32 | md_flags u16 | md_depth u16 | md_branch_pages
             u64 | md_leaf_pages u64 | md_overflow_pages u64 |
             md_entries u64 | md_root u64                      (48 bytes)

Writes tests/golden/canonical_small.mdb plus a .json manifest of the
expected contents.
"""

import json
import os
import struct
import zlib

PSIZE = 4096
PAGEHDRSZ = 16
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
P_INVALID = 0xFFFFFFFFFFFFFFFF
MAPSIZE = 10485760  # py-lmdb default map_size


def leaf_node(key, value):
    sz = len(value)
    n = struct.pack("<HHHH", sz & 0xFFFF, sz >> 16, 0, len(key)) + key + value
    return n + b"\x00" * (len(n) & 1)


def bigdata_node(key, value_len, ov_pgno):
    n = (struct.pack("<HHHH", value_len & 0xFFFF, value_len >> 16,
                     F_BIGDATA, len(key))
         + key + struct.pack("<Q", ov_pgno))
    return n + b"\x00" * (len(n) & 1)


def branch_node(key, child):
    n = struct.pack("<HHHH", child & 0xFFFF, (child >> 16) & 0xFFFF,
                    (child >> 32) & 0xFFFF, len(key)) + key
    return n + b"\x00" * (len(n) & 1)


def page(pgno, flags, nodes_in_heap_order, ptr_order):
    """Pack a page with heap bytes in ``nodes_in_heap_order`` (mdb appends
    at mp_upper, so later inserts sit LOWER in the page) and mp_ptrs
    permuted to key order via ``ptr_order`` (indices into heap order)."""
    buf = bytearray(PSIZE)
    offsets = {}
    upper = PSIZE
    for i, node in enumerate(nodes_in_heap_order):
        upper -= len(node)
        buf[upper:upper + len(node)] = node
        offsets[i] = upper
    ptrs = [offsets[i] for i in ptr_order]
    lower = PAGEHDRSZ + 2 * len(ptrs)
    assert lower <= upper
    struct.pack_into("<QHHHH", buf, 0, pgno, 0, flags, lower, upper)
    struct.pack_into(f"<{len(ptrs)}H", buf, PAGEHDRSZ, *ptrs)
    return bytes(buf)


def overflow_chain(pgno, value):
    npages = -(-(PAGEHDRSZ + len(value)) // PSIZE)
    buf = bytearray(npages * PSIZE)
    struct.pack_into("<QHHI", buf, 0, pgno, 0, P_OVERFLOW, npages)
    buf[PAGEHDRSZ:PAGEHDRSZ + len(value)] = value
    return bytes(buf), npages


DB = struct.Struct("<IHHQQQQQ")


def meta_page(pgno, txnid, root, depth, n_branch, n_leaf, n_ovf, entries,
              last_pg):
    buf = bytearray(PSIZE)
    struct.pack_into("<QHHHH", buf, 0, pgno, 0, P_META, 0, 0)
    struct.pack_into("<IIQQ", buf, PAGEHDRSZ, 0xBEEFC0DE, 1, 0, MAPSIZE)
    dbs = PAGEHDRSZ + 24
    # FREE_DBI: page size in md_pad; empty freelist after the first txn
    DB.pack_into(buf, dbs, PSIZE, 0, 0, 0, 0, 0, 0, P_INVALID)
    DB.pack_into(buf, dbs + DB.size, 0, 0, depth, n_branch, n_leaf, n_ovf,
                 entries, root)
    struct.pack_into("<QQ", buf, dbs + 2 * DB.size, last_pg, txnid)
    return bytes(buf)


def build():
    """Simulated session: put() keys in non-sorted order in one txn.

    Insert order: hr_128_00003, hr_128_00001, big_blob (8500 B),
    hr_128_00002, sr_16_128_00001, length, sr_16_128_00002, zz_tail.
    Page allocation replay (mdb.c alloc on demand):
      pg2: root leaf (everything until first split)
      pg3..5: overflow chain for big_blob (allocated at its insert)
      pg6: right leaf of first split       pg7: new branch root
      pg8: right leaf of second split
    """
    rnd = zlib.crc32  # deterministic filler derivation
    big = bytes((rnd(bytes([i & 0xFF])) >> (i % 24)) & 0xFF
                for i in range(8500))
    kv = {
        b"hr_128_00001": b"cube-one-bytes",
        b"hr_128_00002": b"cube-two-bytes" * 3,
        b"hr_128_00003": b"cube-three",
        b"big_blob": big,
        b"length": b"2",
        b"sr_16_128_00001": b"sr-one" * 10,
        b"sr_16_128_00002": b"sr-two",
        b"zz_tail": b"end",
    }

    # leaf contents after the dust settles (split points chosen as mdb
    # would on fill; exact splits don't matter for reader correctness,
    # realistic interleaving does)
    leaf2_keys = [b"big_blob", b"hr_128_00001", b"hr_128_00002"]
    leaf6_keys = [b"hr_128_00003", b"length", b"sr_16_128_00001"]
    leaf8_keys = [b"sr_16_128_00002", b"zz_tail"]

    ov_bytes, n_ovf = overflow_chain(3, big)
    assert n_ovf == 3

    def mknode(k):
        if k == b"big_blob":
            return bigdata_node(k, len(big), 3)
        return leaf_node(k, kv[k])

    # heap in (simulated) insertion order; ptrs in key order
    def mkleaf(pgno, keys, heap_order):
        heap = [mknode(k) for k in heap_order]
        ptr_order = [heap_order.index(k) for k in sorted(keys)]
        return page(pgno, P_LEAF, heap, ptr_order)

    pg2 = mkleaf(2, leaf2_keys,
                 [b"hr_128_00001", b"big_blob", b"hr_128_00002"])
    pg6 = mkleaf(6, leaf6_keys,
                 [b"hr_128_00003", b"sr_16_128_00001", b"length"])
    pg8 = mkleaf(8, leaf8_keys, [b"sr_16_128_00002", b"zz_tail"])

    # branch root: leftmost child with NULL key (mdb_page_split), then
    # separators = first key of each right sibling
    b_nodes = [branch_node(b"", 2),
               branch_node(b"hr_128_00003", 6),
               branch_node(b"sr_16_128_00002", 8)]
    pg7 = page(7, P_BRANCH, b_nodes, [0, 1, 2])

    last_pg = 8
    meta0 = meta_page(0, 0, P_INVALID, 0, 0, 0, 0, 0, 1)  # init snapshot
    meta1 = meta_page(1, 1, 7, 2, 1, 3, 3, len(kv), last_pg)

    blob = meta0 + meta1 + pg2 + ov_bytes + pg6 + pg7 + pg8
    assert len(blob) == (last_pg + 1) * PSIZE

    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests",
                           "golden")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "canonical_small.mdb"), "wb") as f:
        f.write(blob)
    manifest = {k.decode(): {"len": len(v), "crc32": zlib.crc32(v)}
                for k, v in kv.items()}
    with open(os.path.join(out_dir, "canonical_small.mdb.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"wrote canonical_small.mdb ({len(blob)} bytes, "
          f"{len(kv)} entries, 3-page overflow, branch depth 2)")


if __name__ == "__main__":
    build()
