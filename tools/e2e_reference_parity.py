"""Measure the composed end-to-end quality delta: reference vs rebuild.

The north-star acceptance clause (BASELINE.md) requires the rebuilt
pipeline to match the reference within 0.1 dB MPSNR *as one composed
number* — not just module-level parity. This tool runs BOTH frameworks
end-to-end on the same cube, same weights, same noise sequence:

  reference (torch, in-process):
      model_GAE.encode(SR) -> per-group GaussianDiffusion
      .super_resolution(z_g) -> model_GAE.decode(SR.shape, z_list)
      -> clamp [0,1] -> eval_hsi.quality_assessment
      exactly as sr_gae.py:455-496 composes them (the val branch),
      using the reference's OWN p_sample_loop (sr3_modules/
      diffusion.py:177-201) with torch.randn/randn_like patched to a
      recorded numpy stream;

  rebuild (jax):
      DMGASRPipeline: encode -> fold -> sample_loop(x_init, noise_seq
      = the recorded stream) -> unfold -> decode -> clip ->
      evalhsi.quality_assessment.

Any composition bug — latent ordering, affine placement, group
fold/unfold, decode overlap averaging, clamp order — shows up as a
MPSNR mismatch here even though every module-level parity test passes.

Usage:
    python tools/e2e_reference_parity.py \
        --ckpt /root/reference/GAE_pretrained/GAE_4_Pav.pth \
        --size 64 --timesteps 20 --platform cpu

Prints one JSON line with ref/jax MPSNR (and the full metric deltas).
tests/test_e2e_parity.py asserts |delta| <= 0.1 dB.
"""

import argparse
import importlib.util
import json
import os
import sys

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF = os.environ.get("REFERENCE_DIR", "/root/reference")

# small SR3 UNet config used on BOTH sides (random torch init, converted;
# quality parity is about composition, not about a trained model)
UNET_CFG = dict(
    in_channel=6, out_channel=3, inner_channel=16, norm_groups=8,
    res_blocks=1, dropout=0.0,
)
CHANNEL_MULTS = (1, 2)
ATTN_RES = (8,)


def _shim_ref_deps():
    """Satisfy reference imports absent from this image. skimage's two
    metric entry points are backed by our own implementations, which
    were built to match skimage semantics (evalhsi/metrics.py:13-15) —
    the asserted quantity (MPSNR) only uses peak_signal_noise_ratio."""
    import types

    from hsi_dmgasr_tpu.evalhsi.metrics import psnr as _psnr, ssim as _ssim

    if "skimage.metrics" not in sys.modules:
        sk = types.ModuleType("skimage")
        skm = types.ModuleType("skimage.metrics")
        skm.structural_similarity = (
            lambda im1, im2, data_range=None: _ssim(im1, im2, data_range)
        )
        skm.peak_signal_noise_ratio = (
            lambda image_true, image_test, data_range=None:
            _psnr(image_true, image_test, data_range)
        )
        sk.metrics = skm
        sys.modules["skimage"] = sk
        sys.modules["skimage.metrics"] = skm
    # eval_hsi.py:16 imports HSTestData but quality_assessment never
    # touches it
    if "HStest" not in sys.modules:
        hst = types.ModuleType("HStest")
        hst.HSTestData = object
        sys.modules["HStest"] = hst


def _load_ref_module(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


class _RecordedGauss:
    """Replaces torch.randn/randn_like with a recorded numpy stream so
    the reference's own p_sample_loop becomes deterministic and its
    draws can be replayed through the jax sampler."""

    def __init__(self, seed):
        self.rs = np.random.RandomState(seed)
        self.draws = []

    def randn(self, *shape, **kw):
        if len(shape) == 1 and not isinstance(shape[0], int):
            shape = tuple(shape[0])
        a = self.rs.randn(*shape).astype(np.float32)
        self.draws.append(a)
        import torch

        return torch.from_numpy(a)

    def randn_like(self, x):
        return self.randn(*tuple(x.shape))


def run_reference(cube_hr, cube_sr, ckpt, timesteps, noise_seed):
    """The sr_gae.py:455-496 val composition, reference modules, torch CPU.

    Returns (metrics, y_hwc, unet_state_dict, recorded_draws,
    group_count)."""
    import torch

    from make_gae_golden import attach_forwards

    from hsi_dmgasr_tpu.io.convert_torch import load_torch_module

    torch.manual_seed(0)
    torch.set_grad_enabled(False)

    _shim_ref_deps()
    attach_forwards()
    gae = load_torch_module(ckpt).eval()

    sr3_unet = _load_ref_module("model/sr3_modules/unet.py", "_e2e_ref_unet")
    sr3_diff = _load_ref_module(
        "model/sr3_modules/diffusion.py", "_e2e_ref_diff"
    )
    eval_hsi = _load_ref_module("eval_hsi.py", "_e2e_ref_eval")

    net = sr3_unet.UNet(
        channel_mults=CHANNEL_MULTS, attn_res=ATTN_RES,
        image_size=cube_hr.shape[0], **UNET_CFG,
    ).eval()
    gd = sr3_diff.GaussianDiffusion(
        net, image_size=cube_hr.shape[0], channels=3, loss_type="l1",
        conditional=True,
    )
    gd.set_new_noise_schedule(
        {"schedule": "cosine", "n_timestep": timesteps,
         "linear_start": 1e-6, "linear_end": 1e-2},
        device="cpu",
    )

    sr_t = torch.from_numpy(
        cube_sr.transpose(2, 0, 1)[None].astype(np.float32)
    )
    z_list = gae.encode_cpu(sr_t)

    rec = _RecordedGauss(noise_seed)
    orig_randn, orig_randn_like = torch.randn, torch.randn_like
    torch.randn, torch.randn_like = rec.randn, rec.randn_like
    try:
        new_list = []
        for z in z_list:
            out = gd.super_resolution(z, continous=False)
            # p_sample_loop returns ret_img[-1] -> (3,h,w); sr_gae.py:466
            # unsqueezes back to (1,3,h,w)
            new_list.append(torch.unsqueeze(out, 0))
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_randn_like

    y = gae.decode_cpu(tuple(sr_t.shape), new_list)
    # sr_gae.py:476-477 clamps the decoded cube into [0,1] in place
    y[y < 0] = 0
    y[y > 1] = 1.0
    y_hwc = y[0].numpy().transpose(1, 2, 0)

    metrics = eval_hsi.quality_assessment(
        cube_hr, y_hwc, data_range=1.0, ratio=4
    )
    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    return metrics, y_hwc, sd, rec.draws, len(z_list)


def run_rebuild(cube_hr, cube_sr, ckpt, timesteps, draws, n_groups):
    """DMGASRPipeline composition with the recorded noise injected."""
    import jax
    import jax.numpy as jnp

    from hsi_dmgasr_tpu.evalhsi import quality_assessment
    from hsi_dmgasr_tpu.io.convert_torch import (
        load_torch_gae, state_dict_to_flax,
    )
    from hsi_dmgasr_tpu.pipeline import DMGASRPipeline
    from hsi_dmgasr_tpu.train.ddpm_model import DDPMModel

    variables, cfg = load_torch_gae(ckpt)
    size = cube_hr.shape[0]
    opt = {
        "name": "e2e_parity",
        "gpu_ids": [0],
        "model": {
            "which_model_G": "sr3",
            "finetune_norm": False,
            "unet": {
                "in_channel": UNET_CFG["in_channel"],
                "out_channel": UNET_CFG["out_channel"],
                "inner_channel": UNET_CFG["inner_channel"],
                "norm_groups": UNET_CFG["norm_groups"],
                "channel_multiplier": list(CHANNEL_MULTS),
                "attn_res": list(ATTN_RES),
                "res_blocks": UNET_CFG["res_blocks"],
                "dropout": 0.0,
            },
            "beta_schedule": {
                "train": {"schedule": "cosine", "n_timestep": timesteps,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "cosine", "n_timestep": timesteps,
                        "linear_start": 1e-6, "linear_end": 1e-2},
            },
            "diffusion": {"image_size": size, "channels": 3,
                          "conditional": True},
        },
        "train": {"optimizer": {"type": "adam", "lr": 1e-4}},
        "path": {},
    }
    ddpm = DDPMModel(opt, seed=0,
                     example_shape=(1, size, size, UNET_CFG["in_channel"]))
    pipeline = DMGASRPipeline(opt, variables, cfg, ddpm=ddpm)

    # overwrite the random flax init with the torch UNet's weights
    unet_sd = draws["unet_sd"]
    converted = state_dict_to_flax(unet_sd)
    ddpm.state = ddpm.state.replace(params=converted["params"])

    # reassemble the recorded stream: per group g the reference drew
    # [x_init, n_{t=T-1}, ..., n_{t=1}] (t=0 uses zeros, p_sample
    # diffusion.py:174-176) -> batched NHWC x_init (G,h,w,3) and
    # noise_seq (T, G, h, w, 3) ordered t=T-1..0
    seq = draws["draws"]
    per_group = timesteps  # 1 x_init + (T-1) step noises
    assert len(seq) == n_groups * per_group, (
        f"recorded {len(seq)} draws, expected {n_groups * per_group}"
    )
    to_nhwc = lambda a: np.moveaxis(a, 1, -1)[0]  # (1,3,h,w)->(h,w,3)
    x_init, noises = [], []
    for g in range(n_groups):
        chunk = seq[g * per_group:(g + 1) * per_group]
        x_init.append(to_nhwc(chunk[0]))
        steps = [to_nhwc(c) for c in chunk[1:]]
        steps.append(np.zeros_like(steps[0]))  # t=0
        noises.append(np.stack(steps))  # (T, h, w, 3)
    x_init = np.stack(x_init)  # (G, h, w, 3)
    noise_seq = np.stack(noises, axis=1)  # (T, G, h, w, 3)

    z_sr = pipeline.encode(jnp.asarray(cube_sr[None]))
    cond = pipeline._fold(z_sr)
    denoise_fn = ddpm._eval_denoise_fn()
    z_out = ddpm.val_diffusion.sample_loop(
        denoise_fn, jax.random.PRNGKey(0), cond=cond,
        x_init=jnp.asarray(x_init), noise_seq=jnp.asarray(noise_seq),
    )
    y = pipeline.decode(pipeline._unfold(z_out, 1))
    y = np.clip(np.asarray(y)[0], 0.0, 1.0)

    metrics = quality_assessment(cube_hr, y, data_range=1.0, ratio=4)
    return metrics, y


def measure(ckpt, size=64, timesteps=20, scene_seed=2024, noise_seed=515,
            platform=None):
    """Returns a summary dict with both metric suites and the deltas."""
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    from make_synth_data import synth_cube

    from hsi_dmgasr_tpu.io.convert_torch import gae_config_from_module  # noqa: F401
    from hsi_dmgasr_tpu.data.imresize import imresize

    # n_colors from the checkpoint without building the full model twice
    from hsi_dmgasr_tpu.io.convert_torch import load_torch_gae

    _, cfg = load_torch_gae(ckpt)
    rng = np.random.RandomState(scene_seed)
    hr = synth_cube(rng, size, size, cfg["n_colors"]).astype(np.float32)
    lr = np.clip(imresize(hr, output_shape=(size // 4, size // 4)), 0, 1)
    sr = np.clip(imresize(lr, output_shape=(size, size)), 0, 1
                 ).astype(np.float32)

    ref_metrics, y_ref, unet_sd, rec_draws, n_groups = run_reference(
        hr, sr, ckpt, timesteps, noise_seed
    )
    jax_metrics, y_jax = run_rebuild(
        hr, sr, ckpt, timesteps,
        {"unet_sd": unet_sd, "draws": rec_draws}, n_groups,
    )

    deltas = {
        k: float(jax_metrics[k] - ref_metrics[k])
        for k in ref_metrics
        if k in jax_metrics and np.isfinite(ref_metrics[k])
    }
    return {
        "ckpt": os.path.basename(ckpt),
        "size": size,
        "timesteps": timesteps,
        "n_groups": n_groups,
        "ref_mpsnr": float(ref_metrics["MPSNR"]),
        "jax_mpsnr": float(jax_metrics["MPSNR"]),
        "delta_mpsnr_db": float(jax_metrics["MPSNR"] - ref_metrics["MPSNR"]),
        "max_abs_output_diff": float(np.abs(y_ref - y_jax).max()),
        "deltas": deltas,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--ckpt", default=os.path.join(REF, "GAE_pretrained", "GAE_4_Pav.pth")
    )
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--timesteps", type=int, default=20)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    summary = measure(args.ckpt, size=args.size, timesteps=args.timesteps,
                      platform=args.platform)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
