"""Diagnose the GAE latent distribution the stage-2 diffusion lives in.

The sampler clips the predicted x0 to [-1, 1] every reverse step
(diffusion/gaussian.py:105-106, mirroring the reference
model/sr3_modules/diffusion.py:163-164), but the GAE encoder ends in a
plain conv (AE.py:168-199) — nothing bounds its latents. If the
converted checkpoint's latents leave [-1, 1] on real inputs, the clip
actively fights the decoder and caps achievable quality (VERDICT r2
weak-item #1). This tool measures it.

Usage:
    python tools/diag_latents.py --ckpt /root/reference/GAE_pretrained/GAE_4_Pav.pth \
        --scenes /tmp/hsi_synth/npy_scenes --platform cpu
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt",
                    default="/root/reference/GAE_pretrained/GAE_4_Pav.pth")
    ap.add_argument("--scenes", default="/tmp/hsi_synth/npy_scenes")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--scale", type=int, default=4)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from hsi_dmgasr_tpu.io.convert_torch import load_torch_gae
    from hsi_dmgasr_tpu.models.gae import GAE
    from hsi_dmgasr_tpu.data.imresize import imresize

    variables, cfg = load_torch_gae(args.ckpt)
    gae = GAE(n_subs=cfg["n_subs"], n_ovls=cfg["n_ovls"],
              n_colors=cfg["n_colors"], n_feats=cfg["n_feats"])
    encode = jax.jit(lambda v, x: gae.apply(v, x, method=GAE.encode))

    paths = sorted(glob.glob(os.path.join(args.scenes, "*.npy")))
    if not paths:
        raise SystemExit(f"no .npy scenes under {args.scenes}")

    all_hr, all_sr = [], []
    for p in paths:
        cube = np.load(p).astype(np.float32)
        h = min(args.crop, cube.shape[0] - cube.shape[0] % args.scale)
        hr = cube[:h, :h, : cfg["n_colors"]]
        lr = np.clip(imresize(hr, output_shape=(h // args.scale,
                                                h // args.scale)), 0, 1)
        sr = np.clip(imresize(lr, output_shape=(h, h)), 0, 1)
        z_hr = np.asarray(encode(variables, jnp.asarray(hr[None])))
        z_sr = np.asarray(encode(variables, jnp.asarray(sr[None])))
        all_hr.append(z_hr.ravel())
        all_sr.append(z_sr.ravel())

    def stats(name, z):
        z = np.concatenate(z)
        qs = np.percentile(z, [0.1, 1, 50, 99, 99.9])
        frac_out = float(np.mean(np.abs(z) > 1.0))
        print(f"{name}: min {z.min():+.3f} max {z.max():+.3f} "
              f"mean {z.mean():+.3f} std {z.std():.3f}")
        print(f"   p0.1 {qs[0]:+.3f}  p1 {qs[1]:+.3f}  p50 {qs[2]:+.3f}  "
              f"p99 {qs[3]:+.3f}  p99.9 {qs[4]:+.3f}")
        print(f"   fraction |z|>1: {frac_out:.4%}")
        return z

    print(f"ckpt: {args.ckpt}  ({len(paths)} scenes, crop {args.crop})")
    z_hr = stats("HR latents", all_hr)
    stats("SR latents", all_sr)

    # suggested affine map so that ~p99.9 lands at +-0.95
    lo, hi = np.percentile(z_hr, [0.05, 99.95])
    shift = (hi + lo) / 2.0
    scale = 0.95 / max(abs(hi - shift), abs(lo - shift))
    print(f"suggested latent affine: shift {shift:+.4f} scale {scale:.4f} "
          f"(maps p0.05/p99.95 -> +-0.95)")


if __name__ == "__main__":
    main()
