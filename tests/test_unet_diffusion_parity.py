"""UNet + diffusion parity vs torch reference goldens."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hsi_dmgasr_tpu.diffusion import DiffusionSchedule, GaussianDiffusion, make_beta_schedule
from hsi_dmgasr_tpu.io.convert_torch import state_dict_to_flax
from hsi_dmgasr_tpu.models.unet import UNet

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "unet_diffusion_golden.npz"
)


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden fixtures not generated")
    return np.load(GOLDEN)


def _sd(golden, prefix):
    return {
        k.split("::", 1)[1]: golden[k]
        for k in golden.files
        if k.startswith(prefix + "::")
    }


@pytest.mark.parametrize(
    "sched", ["quad", "linear", "warmup10", "warmup50", "const", "jsd", "cosine"]
)
def test_beta_schedules(golden, sched):
    mine = make_beta_schedule(sched, 20, 1e-6, 1e-2)
    np.testing.assert_allclose(mine, golden[f"betas_{sched}"], rtol=1e-10)


def test_schedule_buffers(golden):
    s = DiffusionSchedule.create("cosine", 20, 1e-6, 1e-2)
    np.testing.assert_allclose(
        s.sqrt_alphas_cumprod_prev, golden["buf_sqrt_alphas_cumprod_prev"], rtol=1e-10
    )
    for name in ["betas", "alphas_cumprod", "sqrt_recip_alphas_cumprod",
                 "sqrt_recipm1_alphas_cumprod", "posterior_log_variance_clipped",
                 "posterior_mean_coef1", "posterior_mean_coef2"]:
        np.testing.assert_allclose(
            getattr(s, name).astype(np.float32), golden[f"buf_{name}"], rtol=2e-5,
            err_msg=name,
        )


def _small_unet(time_embedding="continuous", norm="group"):
    return UNet(
        in_channel=6, out_channel=3, inner_channel=16, norm_groups=8,
        channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0.0,
        image_size=16, time_embedding=time_embedding, norm=norm,
    )


def test_sr3_unet_forward_parity(golden):
    net = _small_unet()
    variables = state_dict_to_flax(_sd(golden, "sr3_sd"))
    x = np.moveaxis(golden["sr3_x"], 1, -1)
    y = net.apply(variables, x, golden["sr3_gamma"])
    y_nchw = np.moveaxis(np.asarray(y), -1, 1)
    np.testing.assert_allclose(y_nchw, golden["sr3_y"], atol=2e-5, rtol=1e-4)


def test_sr3_unet_deep_forward_parity(golden):
    """5-level channel-mult config: validates the full skip-stack
    bookkeeping (initial conv + resblocks + downsamples all pushed)."""
    if "sr3d_y" not in golden:
        pytest.skip("deep-unet golden not generated")
    net = UNet(
        in_channel=6, out_channel=3, inner_channel=8, norm_groups=4,
        channel_mults=(1, 2, 4, 8, 8), attn_res=(16,), res_blocks=2,
        dropout=0.0, image_size=32,
    )
    variables = state_dict_to_flax(_sd(golden, "sr3d_sd"))
    x = np.moveaxis(golden["sr3d_x"], 1, -1)
    y = net.apply(variables, x, golden["sr3d_gamma"])
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(y), -1, 1), golden["sr3d_y"],
        atol=3e-5, rtol=1e-4,
    )


def test_ddpm_unet_forward_parity(golden):
    net = _small_unet(time_embedding="discrete", norm="batch")
    variables = state_dict_to_flax(_sd(golden, "ddpm_sd"))
    x = np.moveaxis(golden["ddpm_x"], 1, -1)
    y = net.apply(variables, x, golden["ddpm_t"])
    y_nchw = np.moveaxis(np.asarray(y), -1, 1)
    np.testing.assert_allclose(y_nchw, golden["ddpm_y"], atol=2e-5, rtol=1e-4)


def test_q_sample_parity(golden):
    s = DiffusionSchedule.create("cosine", 20, 1e-6, 1e-2)
    gd = GaussianDiffusion(schedule=s)
    x = np.moveaxis(golden["pmv_x"], 1, -1)
    noise = np.moveaxis(golden["qs_noise"], 1, -1)
    out = gd.q_sample(x, jnp.float32(golden["qs_gamma"][0]), noise)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out), -1, 1), golden["qs_out"], atol=1e-6
    )


@pytest.mark.parametrize("t", [0, 7, 19])
def test_p_mean_variance_parity(golden, t):
    """One reverse-step posterior (mean, logvar) must match the torch
    reference p_mean_variance for the same UNet weights and inputs."""
    net = _small_unet()
    variables = state_dict_to_flax(_sd(golden, "sr3_sd"))
    s = DiffusionSchedule.create("cosine", 20, 1e-6, 1e-2)
    gd = GaussianDiffusion(schedule=s, clip_denoised=True)

    x = np.moveaxis(golden["pmv_x"], 1, -1)
    cond = np.moveaxis(golden["pmv_cond"], 1, -1)

    def denoise_fn(inp, noise_level):
        return net.apply(variables, inp, noise_level)

    # replicate _step deterministically (mean only): use zero noise by
    # computing the posterior pieces directly
    sacp_prev = jnp.asarray(s.sqrt_alphas_cumprod_prev, jnp.float32)
    noise_level = jnp.full((x.shape[0], 1), sacp_prev[t + 1])
    eps = denoise_fn(jnp.concatenate([cond, x], axis=-1), noise_level)
    x_recon = (
        jnp.float32(s.sqrt_recip_alphas_cumprod[t]) * x
        - jnp.float32(s.sqrt_recipm1_alphas_cumprod[t]) * eps
    )
    x_recon = jnp.clip(x_recon, -1.0, 1.0)
    mean = (
        jnp.float32(s.posterior_mean_coef1[t]) * x_recon
        + jnp.float32(s.posterior_mean_coef2[t]) * x
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(mean), -1, 1), golden[f"pmv_mean_{t}"],
        atol=3e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.float32(s.posterior_log_variance_clipped[t]),
        golden[f"pmv_logvar_{t}"], rtol=1e-5,
    )


def test_full_chain_sampler_parity(golden):
    """The COMPOSED 20-step reverse chain (lax.scan) must match the torch
    reference p_sample_loop with identical weights, x_T, and per-step
    noise (diffusion.py:177-201). This is the strongest <=0.1 dB parity
    argument available without trained stage-2 weights."""
    if "chain_final" not in golden:
        pytest.skip("full-chain golden not generated")
    net = _small_unet()
    variables = state_dict_to_flax(_sd(golden, "sr3_sd"))
    s = DiffusionSchedule.create("cosine", 20, 1e-6, 1e-2)
    gd = GaussianDiffusion(schedule=s, clip_denoised=True)

    def denoise_fn(inp, nl):
        return net.apply(variables, inp, nl)

    x_init = np.moveaxis(golden["chain_x_init"], 1, -1)
    cond = np.moveaxis(golden["chain_cond"], 1, -1)
    noises = np.moveaxis(golden["chain_noises"], 2, -1)  # (T,B,C,H,W)->NHWC
    out = gd.sample_loop(
        denoise_fn, jax.random.PRNGKey(0), cond=cond,
        x_init=x_init, noise_seq=noises,
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(out), -1, 1), golden["chain_final"],
        atol=2e-4, rtol=1e-3,
    )


def test_sample_loop_runs_and_is_deterministic():
    """Full scan sampler: shape, dtype, determinism under fixed key."""
    net = _small_unet()
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 16, 16, 6))
    variables = net.init(rng, x, jnp.zeros((1, 1)))
    s = DiffusionSchedule.create("cosine", 5, 1e-6, 1e-2)
    gd = GaussianDiffusion(schedule=s)

    def denoise_fn(inp, nl):
        return net.apply(variables, inp, nl)

    cond = jnp.zeros((1, 16, 16, 3))
    out1 = gd.super_resolution(denoise_fn, jax.random.PRNGKey(42), cond)
    out2 = gd.super_resolution(denoise_fn, jax.random.PRNGKey(42), cond)
    assert out1.shape == (1, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = gd.super_resolution(denoise_fn, jax.random.PRNGKey(43), cond)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_truncated_chain_t_start():
    """t_start (init_from_cond + last-t0-steps scan) matches a manual
    per-step loop, and t_start=T reproduces the full step count from the
    cond-seeded start state. Guards: t_start needs cond, valid range."""
    import pytest

    net = _small_unet()
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 16, 16, 6))
    variables = net.init(rng, x, jnp.zeros((1, 1)))
    s = DiffusionSchedule.create("cosine", 6, 1e-6, 1e-2)
    gd = GaussianDiffusion(schedule=s)

    def denoise_fn(inp, nl):
        return net.apply(variables, inp, nl)

    cond = jnp.asarray(
        np.random.RandomState(5).randn(1, 16, 16, 3), jnp.float32)
    t0 = 3
    key = jax.random.PRNGKey(7)
    got = gd.sample_loop(denoise_fn, key, cond=cond, t_start=t0)

    # manual replication of the scan with identical key discipline
    k_init, k_steps = jax.random.split(key)
    x_man = gd.init_from_cond(cond, k_init, t0)
    step_keys = jax.random.split(k_steps, t0)
    for i, t in enumerate(range(t0 - 1, -1, -1)):
        x_man = gd._step(denoise_fn, x_man, t, step_keys[i], cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x_man),
                               rtol=1e-5, atol=1e-5)

    # start state stays close to cond at high gamma (the whole point)
    g = float(s.sqrt_alphas_cumprod_prev[t0])
    assert g > 0.5  # t0=3 of T=6 cosine sits in the usable-gamma regime

    # full-length truncation runs the full T steps
    out_T = gd.sample_loop(denoise_fn, key, cond=cond, t_start=6)
    assert out_T.shape == cond.shape

    with pytest.raises(ValueError, match="t_start"):
        gd.sample_loop(denoise_fn, key, shape=(1, 16, 16, 3), t_start=3)
    with pytest.raises(ValueError, match="outside"):
        gd.sample_loop(denoise_fn, key, cond=cond, t_start=9)


def test_t_start_through_model_config(tmp_path):
    """model.diffusion.t_start flows through DDPMModel.super_resolution
    and changes the chain (and ddim/unconditional reject it)."""
    import copy

    import pytest

    from hsi_dmgasr_tpu.train.ddpm_model import DDPMModel

    opt = {
        "model": {
            "which_model_G": "sr3",
            "unet": {"in_channel": 6, "out_channel": 3,
                     "inner_channel": 8, "norm_groups": 4,
                     "channel_multiplier": [1, 2], "attn_res": [8],
                     "res_blocks": 1, "dropout": 0.0},
            "beta_schedule": {
                "train": {"schedule": "cosine", "n_timestep": 4,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "cosine", "n_timestep": 4,
                        "linear_start": 1e-6, "linear_end": 1e-2}},
            "diffusion": {"image_size": 16, "channels": 3,
                          "conditional": True, "t_start": 2},
        },
        "train": {"optimizer": {"type": "adam", "lr": 1e-4}},
        "path": {},
    }
    m = DDPMModel(opt, seed=0)
    cond = jnp.asarray(
        np.random.RandomState(1).randn(1, 16, 16, 3), jnp.float32)
    out = m.super_resolution(cond, key=jax.random.PRNGKey(0))
    assert out.shape == cond.shape
    # truncated start stays in cond's neighborhood (pure-noise full
    # chain through a random net would not)
    assert float(jnp.sqrt(jnp.mean((out - cond) ** 2))) < 2.0

    opt_bad = copy.deepcopy(opt)
    opt_bad["model"]["diffusion"]["sampler"] = "ddim"
    opt_bad["model"]["diffusion"]["ddim_steps"] = 2
    m2 = DDPMModel(opt_bad, seed=0)
    with pytest.raises(ValueError, match="t_start"):
        m2.super_resolution(cond, key=jax.random.PRNGKey(0))
