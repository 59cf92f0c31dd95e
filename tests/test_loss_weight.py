"""Min-SNR loss weighting (GaussianDiffusion.loss_weight).

Beyond-reference knob (Hang et al. 2023, arXiv:2303.09556) motivated by
the round-3 chain-entry diagnosis: unweighted training lets the easy
high-γ samples dominate. Reference loss it must degrade to when off:
model/model.py:49-59 (L1 sum / numel == plain mean).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsi_dmgasr_tpu.diffusion import DiffusionSchedule, GaussianDiffusion
from hsi_dmgasr_tpu.diffusion.gaussian import DDPMDiffusion
from hsi_dmgasr_tpu.models.networks import diffusion_for_phase


def _gd(**kw):
    return GaussianDiffusion(
        schedule=DiffusionSchedule.create("cosine", 20, 1e-6, 1e-2), **kw
    )


def _const_dn(x, t):
    return jnp.zeros_like(x[..., :3])


def test_weight_none_is_plain_mean():
    gd = _gd()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
    sr = jnp.zeros_like(x)
    loss = gd.p_losses(_const_dn, key, x, sr)
    # with eps_pred == 0 the loss is the mean |noise|; reproduce it
    huge = dataclasses.replace(gd, loss_weight=("min_snr", 1e15))
    np.testing.assert_allclose(
        np.asarray(loss), np.asarray(huge.p_losses(_const_dn, key, x, sr)),
        rtol=1e-6,
    )


def test_min_snr_downweights_high_gamma():
    gd = _gd(loss_weight=("min_snr", 5.0))
    g = jnp.asarray([0.05, 0.5, 0.99, 0.9999])
    w = np.asarray(gd._loss_w(g))
    # low-γ (high noise) samples keep weight 1; high-γ samples shrink
    assert w[0] == pytest.approx(1.0)
    assert w[1] == pytest.approx(1.0)  # SNR=1/3 < 5
    assert w[2] < 0.11  # SNR≈49 -> 5/49
    assert w[3] < w[2]
    assert np.all(w > 0)


def test_min_snr_changes_loss_and_stays_finite():
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 8, 8, 3))
    sr = jnp.zeros_like(x)
    base_gd, w_gd = _gd(), _gd(loss_weight=("min_snr", 5.0))
    deltas = []
    for seed in range(8):  # one shared t per draw; sweep to hit high-γ t
        key = jax.random.PRNGKey(seed)
        base = float(base_gd.p_losses(_const_dn, key, x, sr))
        wloss = float(w_gd.p_losses(_const_dn, key, x, sr))
        assert np.isfinite(wloss)
        # weights are in (0, 1]: never amplifies, only downweights
        assert wloss <= base * (1 + 1e-6)
        deltas.append(base - wloss)
    assert max(deltas) > 0  # at least one draw hit a downweighted γ


def test_ddpm_variant_weighting():
    gd = DDPMDiffusion(
        schedule=DiffusionSchedule.create("linear", 20, 1e-4, 2e-2),
        loss_weight=("min_snr", 5.0),
    )
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 8, 8, 3))
    dn = lambda inp, t: jnp.zeros_like(inp[..., :3])
    loss = gd.p_losses(dn, key, x, jnp.zeros_like(x))
    assert np.isfinite(np.asarray(loss))


def _opt(loss_weight=None):
    d = {"image_size": 16, "channels": 3, "conditional": True}
    if loss_weight is not None:
        d["loss_weight"] = loss_weight
    return {
        "model": {
            "which_model_G": "sr3",
            "diffusion": d,
            "beta_schedule": {
                "train": {"schedule": "cosine", "n_timestep": 20,
                          "linear_start": 1e-6, "linear_end": 1e-2},
            },
        }
    }


def test_config_plumbing():
    gd = diffusion_for_phase(_opt(), "train")
    assert gd.loss_weight is None
    gd = diffusion_for_phase(
        _opt({"type": "min_snr", "gamma": 3.0}), "train"
    )
    assert gd.loss_weight == ("min_snr", 3.0)
    with pytest.raises(ValueError, match="loss_weight"):
        diffusion_for_phase(_opt({"type": "p2"}), "train")
