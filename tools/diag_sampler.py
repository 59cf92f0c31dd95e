"""Latent-space sampler diagnostic for the stage-2 quality plateau.

The end-to-end val score (decode(sampled z)) mixes three error sources:
GAE decode error (the ceiling), model error (is the predicted x0 near
z_HR?), and sampler stochasticity (posterior noise over T ancestral
steps). This tool separates them on one val scene with a trained
checkpoint:

  * cond gap      : ||z_SR - z_HR||            (what conditioning gives)
  * ancestral z   : ||sample - z_HR|| x seeds  (what the val loop does)
  * seed-mean z   : ||mean_s(sample) - z_HR||  (noise-dominance probe:
                    if averaging samples closes most of the gap, the
                    model's conditional mean is fine and the posterior
                    noise of the T-step chain is what the metric sees)
  * ddim z        : deterministic DDIM at the same step count
  * end-to-end MPSNR_cc of each variant vs the do-nothing baseline
    decode(z_SR) and the ceiling decode(z_HR).

Run (CPU works; ~1 min/sample at 128^2):
  python tools/diag_sampler.py -c configs/pavia_x4_r3.json \
      --exp experiments/Pav4_r3 [--seeds 4] [--scene 0] [--platform cpu]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default="configs/pavia_x4_r3.json")
    ap.add_argument("--exp", required=True, help="experiments root")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (default: best.json's)")
    ap.add_argument("--scene", type=int, default=0)
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from hsi_dmgasr_tpu.cli.common import force_platform

    force_platform(args.platform)

    import jax
    import jax.numpy as jnp

    from hsi_dmgasr_tpu import config as C
    from hsi_dmgasr_tpu.evalhsi import color_correction, quality_assessment
    from hsi_dmgasr_tpu.train import stage2_driver

    opt = C.parse(args.config, phase="val", experiments_root=args.exp)
    ckpt = args.ckpt
    if ckpt is None:
        best = stage2_driver._read_best(opt["path"]["checkpoint"])
        if not best:
            raise SystemExit("no best.json; pass --ckpt")
        ckpt = os.path.join(opt["path"]["checkpoint"], best["name"])
        print(f"using {ckpt} (MPSNR_cc {best.get('value'):.3f} "
              f"at iter {best.get('iter')})")
    opt["path"]["resume_state"] = ckpt

    pipeline = stage2_driver.build_pipeline(opt, seed=0)
    scale = opt.get("scale") or 4
    val_opt = opt["datasets"]["val"]
    val_set = stage2_driver.build_dataset(val_opt, "val", scale)
    item = val_set[args.scene]
    hr, sr = item["HR"][None], item["SR"][None]

    z_hr = np.asarray(pipeline.encode(jnp.asarray(hr)))
    z_sr = np.asarray(pipeline.encode(jnp.asarray(sr)))

    def l2(a, b):
        return float(np.sqrt(np.mean((a - b) ** 2)))

    def e2e(y):
        y = np.clip(np.asarray(y), 0, 1)[0]
        gt = hr[0]
        cc = color_correction(gt, y, num_channels=gt.shape[-1])
        qa = quality_assessment(gt, cc, data_range=1.0, ratio=scale)
        return qa["MPSNR"], qa["SAM"]

    rec = {}
    rec["cond_gap_rmse"] = l2(z_sr, z_hr)
    rec["z_scale"] = float(np.sqrt(np.mean(z_hr ** 2)))
    p0, s0 = e2e(pipeline.decode(jnp.asarray(z_sr)))
    rec["do_nothing_mpsnr_cc"] = p0
    pc, sc = e2e(pipeline.decode(jnp.asarray(z_hr)))
    rec["ceiling_mpsnr_cc"] = pc
    print(json.dumps(rec), flush=True)  # cheap stats first

    # ancestral samples across seeds (--seeds 0: probes only)
    zs, psnrs = [], []
    for s in range(args.seeds):
        y, z = pipeline.super_resolve(
            jnp.asarray(sr), key=jax.random.PRNGKey(100 + s),
            return_latents=True,
        )
        z = np.asarray(z)
        zs.append(z)
        p, _ = e2e(y)
        psnrs.append(p)
        print(json.dumps({"seed": s, "z_rmse_to_hr": l2(z, z_hr),
                          "mpsnr_cc": round(p, 3)}), flush=True)
    if zs:
        zm = np.mean(zs, axis=0)
        rec["ancestral_mpsnr_cc_mean"] = float(np.mean(psnrs))
        rec["ancestral_z_rmse_mean"] = float(
            np.mean([l2(z, z_hr) for z in zs]))
        rec["seedmean_z_rmse"] = l2(zm, z_hr)
        p, _ = e2e(pipeline.decode(jnp.asarray(zm)))
        rec["seedmean_mpsnr_cc"] = p

        # deterministic DDIM at the same step budget (re-resolve the
        # best snapshot: the rolling best may have moved while sampling)
        opt_ddim = copy.deepcopy(opt)
        opt_ddim["model"]["diffusion"]["sampler"] = "ddim"
        opt_ddim["model"]["diffusion"]["ddim_steps"] = (
            opt["model"]["beta_schedule"]["val"]["n_timestep"])
        if args.ckpt is None and not os.path.isdir(ckpt):
            best = stage2_driver._read_best(opt["path"]["checkpoint"])
            opt_ddim["path"]["resume_state"] = os.path.join(
                opt["path"]["checkpoint"], best["name"])
            print(f"best rolled over; ddim uses {best['name']}")
        pipe_ddim = stage2_driver.build_pipeline(opt_ddim, seed=0)
        y, z = pipe_ddim.super_resolve(
            jnp.asarray(sr), key=jax.random.PRNGKey(0),
            return_latents=True)
        rec["ddim_z_rmse"] = l2(np.asarray(z), z_hr)
        p, _ = e2e(y)
        rec["ddim_mpsnr_cc"] = p

    # x̂0-recovery probes: feed the TRAINED net x_noisy built from the
    # true z_HR at known noise levels and measure how well one call
    # recovers x0. Separates model power (bad recovery at mid/low noise
    # = undertrained/bug) from chain dynamics (good recovery here but
    # bad ancestral samples = the T-step chain is what loses it).
    ddpm = pipeline.ddpm
    sched = ddpm.val_diffusion.schedule
    cond = np.asarray(pipeline._fold(jnp.asarray(
        z_sr.reshape(z_sr.shape))))
    zf = np.asarray(pipeline._fold(jnp.asarray(z_hr)))
    T = sched.num_timesteps
    rng = np.random.RandomState(0)
    eps = rng.randn(*zf.shape).astype(np.float32)
    probes = {}
    for tag, t in [("hi_noise", T - 1), ("mid_noise", T // 2),
                   ("lo_noise", 1)]:
        g = float(sched.sqrt_alphas_cumprod_prev[t + 1])
        x_noisy = g * zf + np.sqrt(1.0 - g * g) * eps
        lvl = jnp.full((zf.shape[0], 1), g, jnp.float32)
        inp = jnp.concatenate([jnp.asarray(cond), jnp.asarray(x_noisy)],
                              axis=-1)
        e_pred, _ = ddpm._denoise_apply(
            ddpm.eval_params, ddpm.state.batch_stats, inp, lvl,
            train=False)
        srac = float(sched.sqrt_recip_alphas_cumprod[t])
        sracm1 = float(sched.sqrt_recipm1_alphas_cumprod[t])
        x0_hat = srac * x_noisy - sracm1 * np.asarray(e_pred)
        probes[tag] = {
            "gamma": round(g, 5),
            "x0hat_rmse_to_hr": l2(x0_hat, zf),
            "eps_rmse": l2(np.asarray(e_pred), eps),
        }
        # zero-info baseline: x̂0 from predicting eps exactly = perfect;
        # from predicting 0 = x_noisy/γ amplification
        probes[tag]["x0_from_cond_rmse"] = l2(cond, zf)
    rec["probes"] = probes

    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
