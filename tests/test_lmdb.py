"""Dependency-free LMDB reader/writer + LRHR lmdb mode."""

import io
import os

import numpy as np
import pytest

from hsi_dmgasr_tpu.io.lmdb_lite import LmdbReader, LmdbWriter


def test_roundtrip_small(tmp_path):
    p = str(tmp_path / "db")
    with LmdbWriter(p) as w:
        w.put("alpha", b"1")
        w.put("beta", b"two")
        w.put(b"gamma", b"\x00\xffbin")
    with LmdbReader(p) as r:
        assert len(r) == 3
        assert r.get("alpha") == b"1"
        assert r.get(b"beta") == b"two"
        assert r.get("gamma") == b"\x00\xffbin"
        assert r.get("missing") is None
        assert [k for k, _ in r.items()] == [b"alpha", b"beta", b"gamma"]


def test_roundtrip_scale_branches_and_overflow(tmp_path):
    """Enough entries to force multiple leaf pages + branch levels, and
    values large enough to force overflow pages."""
    rng = np.random.RandomState(0)
    kv = {}
    for i in range(2000):
        kv[f"key_{i:06d}".encode()] = rng.bytes(rng.randint(1, 50))
    for i in range(20):  # > page-size values -> overflow pages
        kv[f"big_{i:03d}".encode()] = rng.bytes(5000 + i * 1000)
    p = str(tmp_path / "db")
    with LmdbWriter(p) as w:
        for k, v in kv.items():
            w.put(k, v)
    with LmdbReader(p) as r:
        assert len(r) == len(kv)
        for k, v in kv.items():
            assert r.get(k) == v, k
        # full scan in key order
        got = dict(r.items())
        assert got == kv


def test_lrhr_lmdb_mode(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from hsi_dmgasr_tpu.data.lrhr import LRHRDataset

    p = str(tmp_path / "faces")
    rng = np.random.RandomState(1)

    def png(arr):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()

    n, l_res, r_res = 3, 16, 32
    with LmdbWriter(p) as w:
        for i in range(n):
            hr = rng.randint(0, 255, (r_res, r_res, 3), np.uint8)
            lr = rng.randint(0, 255, (l_res, l_res, 3), np.uint8)
            sr = rng.randint(0, 255, (r_res, r_res, 3), np.uint8)
            w.put(f"hr_{r_res}_{i:05d}", png(hr))
            w.put(f"lr_{l_res}_{i:05d}", png(lr))
            w.put(f"sr_{l_res}_{r_res}_{i:05d}", png(sr))
        w.put("length", str(n))

    ds = LRHRDataset(p, datatype="lmdb", l_resolution=l_res,
                     r_resolution=r_res, split="val", need_LR=True)
    assert len(ds) == n
    item = ds[1]
    assert item["HR"].shape == (r_res, r_res, 3)
    assert item["SR"].shape == (r_res, r_res, 3)
    assert item["LR"].shape == (l_res, l_res, 3)
    assert -1.0 <= item["HR"].min() and item["HR"].max() <= 1.0


def test_prepare_data_lmdb_cli(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from hsi_dmgasr_tpu.data.lrhr import LRHRDataset
    from hsi_dmgasr_tpu.data.prepare_data import main

    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.RandomState(2)
    for i in range(2):
        Image.fromarray(
            rng.randint(0, 255, (40, 40, 3), np.uint8)
        ).save(str(src / f"{i}.png"))

    out = str(tmp_path / "out")
    main(["--path", str(src), "--out", out, "--size", "16,32", "--lmdb"])
    ds = LRHRDataset(f"{out}_16_32", datatype="lmdb", l_resolution=16,
                     r_resolution=32, split="val")
    assert len(ds) == 2
    item = ds[0]
    assert item["HR"].shape == (32, 32, 3)


def test_reader_parses_canonical_mdb_fixture():
    """Parse a hand-constructed canonical data.mdb (tests/golden/
    canonical_small.mdb, built by tools/make_lmdb_golden.py WITHOUT
    LmdbWriter) that reproduces real mdb.c session artifacts LmdbWriter
    never emits: interleaved page allocation (branch root + overflow
    chain between the leaves), insertion-order node heaps with key-order
    mp_ptrs, meta txn parity (live snapshot on meta page 1), and a
    3-page F_BIGDATA overflow value."""
    import json
    import zlib

    from hsi_dmgasr_tpu.io.lmdb_lite import LmdbReader

    golden = os.path.join(os.path.dirname(__file__), "golden",
                          "canonical_small.mdb")
    manifest = json.load(open(golden + ".json"))
    with LmdbReader(golden) as r:
        assert r.psize == 4096
        assert len(r) == len(manifest)
        # every key via point lookup (descends the branch level)
        for k, meta in manifest.items():
            v = r.get(k)
            assert v is not None, k
            assert len(v) == meta["len"]
            assert zlib.crc32(v) == meta["crc32"]
        # the 8.5 KB value really came through the overflow chain
        assert len(r.get("big_blob")) == 8500
        assert r.get("nope") is None
        assert r.get(b"hr_128_00000") is None
        # full scan in key order
        items = list(r.items())
        assert [k.decode() for k, _ in items] == sorted(manifest)
        assert all(zlib.crc32(v) == manifest[k.decode()]["crc32"]
                   for k, v in items)


def test_prepare_data_process_pool(tmp_path):
    """--mode process: reference-style multiprocessing workers with a
    shared counter (prepare_data.py:50-134) produce the same folder
    layout as the thread pool."""
    pytest.importorskip("PIL")
    from PIL import Image

    from hsi_dmgasr_tpu.data.prepare_data import prepare

    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.RandomState(5)
    for i in range(5):
        Image.fromarray(
            rng.randint(0, 255, (40, 40, 3), np.uint8)
        ).save(str(src / f"{i}.png"))

    out_dir, n = prepare(str(src), str(tmp_path / "mp"), size="16,32",
                         n_worker=3, mode="process")
    assert n == 5
    import os

    for sub in ("hr_32", "lr_16", "sr_16_32"):
        assert sorted(os.listdir(os.path.join(out_dir, sub))) == [
            f"{i:05d}.png" for i in range(5)
        ]
