"""Loss parity vs reference torch implementations + stage-1 trainer smoke."""

import os

import numpy as np
import pytest

from hsi_dmgasr_tpu.train.losses import cal_sam, h_loss, hybrid_loss, spe_loss

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "loss_golden.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("loss goldens not generated")
    return np.load(GOLDEN)


def _nhwc(x):
    return np.moveaxis(x, 1, -1)


def test_h_loss_parity(golden):
    y, gt = _nhwc(golden["y"]), _nhwc(golden["gt"])
    np.testing.assert_allclose(
        float(h_loss(y, gt, 0.3, 0.1)), float(golden["h_loss"]), rtol=1e-5
    )


def test_cal_sam_parity(golden):
    y, gt = _nhwc(golden["y"]), _nhwc(golden["gt"])
    np.testing.assert_allclose(
        float(cal_sam(y, gt)), float(golden["cal_sam"]), rtol=1e-5
    )


def test_hybrid_loss_parity(golden):
    y, gt = _nhwc(golden["y"]), _nhwc(golden["gt"])
    np.testing.assert_allclose(
        float(hybrid_loss(y, gt)), float(golden["hybrid_loss"]), rtol=1e-5
    )


def test_spe_loss_parity(golden):
    y, gt = _nhwc(golden["y"]), _nhwc(golden["gt"])
    np.testing.assert_allclose(
        float(spe_loss(y, gt, n=2)), float(golden["spe_loss"]), rtol=1e-5
    )


def test_gae_trainer_learns(tmp_path):
    """Stage-1 trainer: loss decreases on a fixed batch; save/load works."""
    from hsi_dmgasr_tpu.train import GAETrainer

    tr = GAETrainer(
        n_subs=8, n_ovls=2, n_colors=31, n_feats=8, lr=1e-3, example_hw=16
    )
    rng = np.random.RandomState(0)
    hr = rng.rand(2, 16, 16, 31).astype(np.float32)
    losses = [float(tr.train_step(hr)) for _ in range(30)]
    assert losses[-1] < losses[0]

    path = tmp_path / "gae_ckpt"
    tr.save(str(path))
    variables, cfg = GAETrainer.load_gae_variables(str(path))
    assert cfg["n_colors"] == 31 and cfg["G"] == 5
    recon = tr.reconstruct(hr)
    from hsi_dmgasr_tpu.models import GAE
    import jax

    gae = GAE(n_subs=8, n_ovls=2, n_colors=31, n_feats=8)
    recon2, _ = jax.jit(gae.apply)(variables, hr)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(recon2), atol=1e-6)
