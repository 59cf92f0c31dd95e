"""Data layer tests: datasets, loader, torch-bicubic parity."""

import os

import numpy as np
import pytest

from hsi_dmgasr_tpu.data import (
    DataLoader,
    HSTestData,
    HSTrainingData,
    TestsetFromFolder,
    TrainsetFromFolder,
    torch_bicubic_resize,
)

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "torch_bicubic_golden.npz"
)


@pytest.mark.parametrize("name", ["up4", "up8", "odd"])
def test_torch_bicubic_parity(name):
    g = np.load(GOLDEN)
    x = g[f"{name}__in"]
    s = int(g[f"{name}__scale"][0])
    out = torch_bicubic_resize(x, (x.shape[0] * s, x.shape[1] * s))
    np.testing.assert_allclose(out, g[f"{name}__out"], atol=5e-7)


def test_hs_training_data(synth_data):
    ds = HSTrainingData(
        os.path.join(synth_data, "mat_scenes"), n_scale=2, augment=True,
        rng=np.random.RandomState(0),
    )
    assert len(ds) == 2 * 8
    item = ds[3]
    assert item["HR"].shape == (64, 64, 31)
    assert item["SR"].shape == (64, 64, 31)
    assert item["LR"].shape == (32, 32, 31)
    assert 0.0 <= item["SR"].min() and item["SR"].max() <= 1.0


def test_hs_test_data(synth_data):
    ds = HSTestData(os.path.join(synth_data, "npy_scenes"), n_scale=2, gt_size=64)
    assert len(ds) == 2
    item = ds[0]
    assert item["HR"].shape == (64, 64, 31)
    assert item["LR"].shape == (32, 32, 31)
    # degradation is deterministic: same item twice
    item2 = ds[0]
    np.testing.assert_array_equal(item["SR"], item2["SR"])


def test_mat_pair_datasets(synth_data):
    tr = TrainsetFromFolder(os.path.join(synth_data, "pairs", "train"), scale=2)
    item = tr[0]
    assert item["LR"].shape == (48, 48, 31)
    assert item["HR"].shape == (96, 96, 31)
    assert item["SR"].shape == (96, 96, 31)
    te = TestsetFromFolder(
        os.path.join(synth_data, "pairs", "test"), scale=2,
        lr_size=32, hr_size=64,
    )
    item = te[0]
    assert item["LR"].shape == (32, 32, 31)
    assert item["HR"].shape == (64, 64, 31)
    assert item["SR"].shape == (64, 64, 31)


class _ExplodingDataset:
    def __len__(self):
        return 4

    def __getitem__(self, i):
        if i == 2:
            raise ValueError("boom at item 2")
        return np.zeros((3,), np.float32)


def test_dataloader_propagates_worker_exception():
    dl = DataLoader(_ExplodingDataset(), batch_size=1, prefetch=2)
    with pytest.raises(ValueError, match="boom at item 2"):
        list(dl)


def test_dataloader_early_break_unblocks_producer(synth_data):
    """Consumer breaking mid-epoch (n_iter stop) must not strand the
    producer thread on a full queue."""
    import threading

    ds = HSTrainingData(
        os.path.join(synth_data, "mat_scenes"), n_scale=2, augment=True,
        rng=np.random.RandomState(0),
    )
    before = threading.active_count()
    for _ in range(3):
        for batch in DataLoader(ds, batch_size=1, prefetch=1):
            break  # early exit with items still queued
    import time

    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_training_crops_threadsafe_and_distinct(synth_data):
    """Per-(item, visit) seeded crop RNG: concurrent workers yield valid,
    non-identical crops, and revisiting an item gives a fresh crop."""
    ds = HSTrainingData(
        os.path.join(synth_data, "mat_scenes"), n_scale=2, augment=False,
        rng=np.random.RandomState(0),
    )
    dl = DataLoader(ds, batch_size=2, num_workers=4, prefetch=0)
    epoch1 = [b["HR"].copy() for b in dl]
    epoch2 = [b["HR"].copy() for b in dl]
    for b in epoch1 + epoch2:
        assert b.shape == (2, 64, 64, 31)
        assert np.isfinite(b).all()
    # same item, different visit -> (almost surely) different crop
    assert not all(
        np.array_equal(a, b) for a, b in zip(epoch1, epoch2)
    )


def test_dataloader_batches(synth_data):
    ds = HSTestData(os.path.join(synth_data, "npy_scenes"), n_scale=2, gt_size=64)
    dl = DataLoader(ds, batch_size=2, shuffle=True, seed=1)
    batches = list(dl)
    assert len(batches) == 1
    assert batches[0]["HR"].shape == (2, 64, 64, 31)
    # unbatched remainder kept when drop_last=False
    dl2 = DataLoader(ds, batch_size=3, drop_last=True)
    assert len(list(dl2)) == 0
