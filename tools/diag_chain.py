"""Truncated-chain experiment: initialize the reverse chain at t0 from
the conditioning (x_{t0} = γ_{t0}·cond + sqrt(1-γ²)·ε, CCDF-style) and
sweep t0, measuring latent RMSE + end-to-end MPSNR_cc per t0.

Motivation (tools/diag_sampler.py on the round-3 checkpoint): the model
recovers x̂0 to ~cond-gap precision for γ ≥ ~0.3, but the first reverse
steps sit at γ ~ 2.5e-3 where x̂0 = x/γ - ... amplifies ε-error 400x —
the T=20 cosine chain destroys the conditioning it was given. t0 = T
reproduces the full chain (pure-noise init) as the reference runs it.

Run: python tools/diag_chain.py --exp experiments/Pav4_r3 --platform cpu
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", default="configs/pavia_x4_r3.json")
    ap.add_argument("--exp", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--scene", type=int, default=0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--t0", type=int, nargs="*", default=None)
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
        ckpt = os.path.join(opt["path"]["checkpoint"], best["name"])
        print(f"using {ckpt} (iter {best.get('iter')})")
    opt["path"]["resume_state"] = ckpt

    pipeline = stage2_driver.build_pipeline(opt, seed=0)
    ddpm = pipeline.ddpm
    diff = ddpm.val_diffusion
    sched = diff.schedule
    T = sched.num_timesteps
    scale = opt.get("scale") or 4
    val_set = stage2_driver.build_dataset(
        opt["datasets"]["val"], "val", scale)
    item = val_set[args.scene]
    hr, sr = item["HR"][None], item["SR"][None]

    z_hr = np.asarray(pipeline.encode(jnp.asarray(hr)))
    z_sr = np.asarray(pipeline.encode(jnp.asarray(sr)))
    cond = pipeline._fold(jnp.asarray(z_sr))
    zf = np.asarray(pipeline._fold(jnp.asarray(z_hr)))

    def l2(a, b):
        return float(np.sqrt(np.mean((a - b) ** 2)))

    def e2e(zlat):
        y = pipeline.decode(pipeline._unfold(jnp.asarray(zlat), 1))
        y = np.clip(np.asarray(y), 0, 1)[0]
        gt = hr[0]
        cc = color_correction(gt, y, num_channels=gt.shape[-1])
        return quality_assessment(gt, cc, data_range=1.0,
                                  ratio=scale)["MPSNR"]

    def denoise_fn(x, lvl):
        out, _ = ddpm._denoise_apply(
            ddpm.eval_params, ddpm.state.batch_stats, x, lvl, train=False)
        return out

    step = jax.jit(lambda x, t, key: diff._step(
        denoise_fn, x, t, key, cond))

    print(json.dumps({"cond_gap": l2(np.asarray(cond), zf),
                      "T": T}), flush=True)
    t0s = args.t0 if args.t0 else [T, T - 2, 16, 12, 8, 4, 2]
    key0 = jax.random.PRNGKey(0)
    for t0 in t0s:
        g0 = float(sched.sqrt_alphas_cumprod_prev[t0])
        keys = jax.random.split(jax.random.fold_in(key0, t0), T + 1)
        if t0 >= T:
            x = jax.random.normal(keys[-1], cond.shape, jnp.float32)
        else:
            eps = jax.random.normal(keys[-1], cond.shape, jnp.float32)
            x = g0 * cond + np.sqrt(1.0 - g0 * g0) * eps
        for t in range(t0 - 1, -1, -1):
            x = step(x, t, keys[t])
        x = np.asarray(x)
        print(json.dumps({
            "t0": t0, "gamma_t0": round(g0, 5),
            "z_rmse_to_hr": l2(x, zf),
            "mpsnr_cc": round(e2e(x), 3),
        }), flush=True)


if __name__ == "__main__":
    main()
