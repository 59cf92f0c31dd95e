"""DDIM fast sampler tests."""

import jax
import jax.numpy as jnp
import numpy as np

from hsi_dmgasr_tpu.diffusion import DiffusionSchedule, GaussianDiffusion
from hsi_dmgasr_tpu.models.unet import UNet


def _setup():
    net = UNet(in_channel=6, out_channel=3, inner_channel=8, norm_groups=4,
               channel_mults=(1, 2), attn_res=(8,), res_blocks=1,
               image_size=16)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)),
                 jnp.zeros((1, 1)))
    gd = GaussianDiffusion(
        schedule=DiffusionSchedule.create("cosine", 20, 1e-6, 1e-2)
    )
    return gd, lambda x, t: net.apply(v, x, t)


def test_ddim_shapes_and_determinism():
    gd, dn = _setup()
    cond = jnp.zeros((2, 16, 16, 3))
    a = gd.ddim_sample_loop(dn, jax.random.PRNGKey(5), cond=cond, steps=5)
    b = gd.ddim_sample_loop(dn, jax.random.PRNGKey(5), cond=cond, steps=5)
    assert a.shape == (2, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ddim_eta_adds_stochasticity_between_inits():
    gd, dn = _setup()
    cond = jnp.zeros((1, 16, 16, 3))
    a = gd.ddim_sample_loop(dn, jax.random.PRNGKey(1), cond=cond, steps=5)
    b = gd.ddim_sample_loop(dn, jax.random.PRNGKey(2), cond=cond, steps=5)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_ddpm_model_ddim_config():
    from hsi_dmgasr_tpu.train import DDPMModel

    opt = {
        "name": "ddim", "gpu_ids": [0],
        "model": {
            "which_model_G": "sr3",
            "unet": {"in_channel": 6, "out_channel": 3, "inner_channel": 8,
                     "norm_groups": 4, "channel_multiplier": [1, 2],
                     "attn_res": [8], "res_blocks": 1, "dropout": 0.0},
            "beta_schedule": {
                "train": {"schedule": "cosine", "n_timestep": 20,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "cosine", "n_timestep": 20,
                        "linear_start": 1e-6, "linear_end": 1e-2}},
            "diffusion": {"image_size": 16, "channels": 3,
                          "conditional": True, "sampler": "ddim",
                          "ddim_steps": 4},
        },
        "train": {"optimizer": {"lr": 1e-4}}, "path": {},
    }
    model = DDPMModel(opt, seed=0)
    out = model.super_resolution(jnp.zeros((1, 16, 16, 3)),
                                 key=jax.random.PRNGKey(0))
    assert out.shape == (1, 16, 16, 3)
