"""GAN-HSI-SR path (reference GAE/net.py:23-189 + GAE/train.py:84-199):
G/D forward parity through converted weights, exact param counts,
RaGAN trainer dynamics, and the CLI entry end-to-end.

Golden from tools/make_gan_golden.py (reference torch modules run
in-process on CPU).
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from hsi_dmgasr_tpu.models.baselines.gan3d import (
    Discriminator,
    Generator,
    ragan_d_loss,
    ragan_g_loss,
    spe_loss_gan,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "gan3d_forward_golden.npz")


def _param_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("gan3d forward golden not generated")
    return np.load(GOLDEN)


def test_generator_forward_weight_parity(golden):
    from hsi_dmgasr_tpu.io.convert_torch import state_dict_to_flax

    sd = {k.split("::", 1)[1]: golden[k] for k in golden.files
          if k.startswith("gsd::")}
    variables = state_dict_to_flax(sd, model="gan3d_g")
    m = Generator(n_bands=31)
    # torch (B, 1, L, H, W) -> NHWC (B, H, W, L)
    x = np.moveaxis(golden["g_x"][:, 0], 1, -1)
    y = m.apply(variables, x)
    want = np.moveaxis(golden["g_y"][:, 0], 1, -1)
    np.testing.assert_allclose(np.asarray(y), want, atol=2e-5, rtol=1e-4)


def test_generator_param_count(golden):
    m = Generator(n_bands=31)
    v = m.init(jax.random.PRNGKey(0), np.zeros((2, 8, 8, 31), np.float32))
    assert _param_count(v["params"]) == int(golden["g_params"])


def test_discriminator_forward_weight_parity(golden):
    from hsi_dmgasr_tpu.io.convert_torch import state_dict_to_flax

    sd = {k.split("::", 1)[1]: golden[k] for k in golden.files
          if k.startswith("dsd::")}
    variables = state_dict_to_flax(sd, model="gan3d_d")
    assert "batch_stats" in variables  # randomized running stats exercised
    m = Discriminator()
    x = np.moveaxis(golden["d_x"][:, 0], 1, -1)
    y = m.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y), golden["d_y"], atol=2e-5,
                               rtol=1e-4)


def test_discriminator_param_count(golden):
    m = Discriminator()
    v = m.init(jax.random.PRNGKey(0), np.zeros((2, 32, 32, 31), np.float32))
    assert _param_count(v["params"]) == int(golden["d_params"])


def test_ragan_losses_at_equilibrium():
    # equal scores -> both relativistic terms sit at -2*log(sigmoid(0))
    d = np.zeros((4, 1), np.float32)
    want = -2.0 * np.log(0.5)
    assert float(ragan_d_loss(d, d)) == pytest.approx(want, rel=1e-5)
    assert float(ragan_g_loss(d, d)) == pytest.approx(want, rel=1e-5)
    # identical cubes have zero spectral angle
    x = np.random.RandomState(0).rand(2, 4, 4, 8).astype(np.float32)
    assert float(spe_loss_gan(x, x)) == pytest.approx(0.0, abs=1e-3)


def test_ragan_trainer_losses_decrease():
    from hsi_dmgasr_tpu.train.gan_trainer import GAN3DTrainer

    rng = np.random.RandomState(3)
    hw, bands = 4, 8
    lr_cube = rng.rand(2, hw, hw, bands).astype(np.float32)
    hr = rng.rand(2, hw * 4, hw * 4, bands).astype(np.float32)

    tr = GAN3DTrainer(n_bands=bands, lr_g=1e-3, lr_d=3e-3, seed=0,
                      example_hw=hw)

    # with the generator frozen, the discriminator must learn to
    # separate real from fake on a fixed batch (the pure-D objective,
    # no adversarial moving target)
    d_losses = []
    for _ in range(25):
        tr.d_state, d_loss = tr._d_step(tr.g_state, tr.d_state,
                                        lr_cube, hr)
        d_losses.append(float(d_loss))
    assert all(np.isfinite(d_losses))
    # skip step 0 (fresh BatchNorm stats make it off-manifold); Adam
    # needs ~15 warmup steps before the loss visibly moves
    assert d_losses[-1] < d_losses[1] - 0.01, d_losses

    # full alternating steps: the generator's dominant L1 term pulls
    # its output toward HR
    l1_before = float(np.mean(np.abs(np.asarray(tr.generate(lr_cube)) - hr)))
    g_losses = []
    for _ in range(6):
        g_loss, d_loss = tr.train_step(lr_cube, hr)
        g_losses.append(float(g_loss))
    l1_after = float(np.mean(np.abs(np.asarray(tr.generate(lr_cube)) - hr)))
    assert all(np.isfinite(g_losses))
    assert l1_after < l1_before


def test_gan_train_cli_smoke(tmp_path):
    # stacked-scene .npy in the ICVL layout (N, C, H, W), uint16 range
    rng = np.random.RandomState(0)
    scenes = (rng.rand(1, 8, 40, 40) * (2 ** 16 - 1)).astype(np.float32)
    data = tmp_path / "scenes.npy"
    np.save(data, scenes)
    out = tmp_path / "gan_ckpt"

    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "-m", "hsi_dmgasr_tpu.cli.gan_train",
         "--data", str(data), "--n_bands", "8", "--fis", "16",
         "--batch_size", "2", "--epochs", "1", "--max_steps", "2",
         "--lr", "1e-4", "--out", str(out), "--platform", "cpu"],
        capture_output=True, text=True, env=env, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert out.exists()
