"""Measure a GAE checkpoint's reconstruction ceiling on a scene set.

The stage-2 diffusion refines latents that the GAE decoder turns back
into a cube, so encode(HR) -> decode is the quality upper bound any
stage-2 run can reach on a given val set (the reference computes the
same bound implicitly when AE_test.py round-trips a cube through the
autoencoder — /root/reference/GAE/AE_test.py:100-187). Every round-3
recipe config documents this ceiling next to its latent affine; this
tool is the one-command way to (re)measure both on a fresh scene set:

    python tools/measure_ceiling.py \
        --ckpt /root/reference/GAE_pretrained/GAE_4_Chi.pth \
        --scenes /tmp/hsi_chi_r3/val/npy_scenes --platform cpu

Prints per-scene MPSNR/SAM, the mean ceiling, and the suggested latent
affine (same fit as tools/diag_latents.py: p0.05/p99.95 -> +-0.95).
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(ckpt, scene_paths, crop=128, platform=None):
    """Returns (per_scene, summary) for encode->decode reconstruction.

    per_scene: list of {path, MPSNR, MPSNR_cc, SAM}; summary:
    {ceiling_mpsnr, ceiling_mpsnr_cc, latent_shift, latent_scale,
    n_colors, frac_clipped}. ceiling_mpsnr_cc applies the same per-band
    mean/std color correction the stage-2 val loop selects checkpoints
    on (stage2_driver.py:157), so run-vs-ceiling comparisons are
    apples-to-apples on either metric. (cc usually raises MPSNR by
    removing per-band bias but is not guaranteed to — it is moment
    matching, not a least-squares fit.)
    """
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    import jax
    import jax.numpy as jnp

    from hsi_dmgasr_tpu.evalhsi import color_correction, quality_assessment
    from hsi_dmgasr_tpu.models.gae import GAE

    if ckpt.endswith(".pth"):
        from hsi_dmgasr_tpu.io.convert_torch import load_torch_gae

        variables, cfg = load_torch_gae(ckpt)
    else:
        # own-trained orbax checkpoint (GAETrainer.save) — same dispatch
        # as the stage-2 driver's load_gae (train/stage2_driver.py:42-54)
        from hsi_dmgasr_tpu.train.stage1_gae import GAETrainer

        variables, cfg = GAETrainer.load_gae_variables(ckpt)
    gae = GAE(n_subs=cfg["n_subs"], n_ovls=cfg["n_ovls"],
              n_colors=cfg["n_colors"], n_feats=cfg["n_feats"])
    encode = jax.jit(lambda v, x: gae.apply(v, x, method=GAE.encode))
    decode = jax.jit(lambda v, z: gae.apply(v, z, method=GAE.decode))

    per_scene, latents = [], []
    for p in scene_paths:
        if p.endswith(".npy"):
            cube = np.load(p)
        else:
            import scipy.io as sio

            cube = np.asarray(
                sio.loadmat(p, verify_compressed_data_integrity=False)["block"]
            )
        cube = cube.astype(np.float32)
        if cube.shape[-1] < cfg["n_colors"]:
            raise ValueError(
                f"{p}: scene has {cube.shape[-1]} bands but the "
                f"checkpoint expects {cfg['n_colors']}"
            )
        if cube.shape[-1] > cfg["n_colors"]:
            print(f"  [warn] {os.path.basename(p)}: truncating "
                  f"{cube.shape[-1]} bands to the checkpoint's "
                  f"{cfg['n_colors']}", file=sys.stderr)
        cube = cube[:crop, :crop, : cfg["n_colors"]]
        z = encode(variables, jnp.asarray(cube[None]))
        y = np.clip(np.asarray(decode(variables, z))[0], 0, 1)
        q = quality_assessment(cube, y, data_range=1.0, ratio=4)
        y_cc = color_correction(cube, y, num_channels=cfg["n_colors"])
        q_cc = quality_assessment(cube, y_cc, data_range=1.0, ratio=4)
        latents.append(np.asarray(z).ravel())
        per_scene.append({"path": p, "MPSNR": float(q["MPSNR"]),
                          "MPSNR_cc": float(q_cc["MPSNR"]),
                          "SAM": float(q["SAM"])})

    z = np.concatenate(latents)
    lo, hi = np.percentile(z, [0.05, 99.95])
    shift = float((hi + lo) / 2.0)
    half_range = max(abs(hi - shift), abs(lo - shift))
    if half_range < 1e-12:
        raise ValueError(
            "latent percentiles collapsed (p0.05 == p99.95 == "
            f"{lo:.6g}) — degenerate/constant scene set; refusing to "
            "fit an affine"
        )
    scale = float(0.95 / half_range)
    summary = {
        "ceiling_mpsnr": float(np.mean([s["MPSNR"] for s in per_scene])),
        "ceiling_mpsnr_cc": float(
            np.mean([s["MPSNR_cc"] for s in per_scene])
        ),
        "latent_shift": round(shift, 4),
        "latent_scale": round(scale, 4),
        "n_colors": cfg["n_colors"],
        "frac_clipped": float(np.mean(np.abs(z) > 1.0)),
    }
    return per_scene, summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt",
                    default="/root/reference/GAE_pretrained/GAE_4_Pav.pth")
    ap.add_argument("--scenes", required=True,
                    help="dir of .npy or .mat ('block') HWC cubes")
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    paths = sorted(glob.glob(os.path.join(args.scenes, "*.npy"))
                   or glob.glob(os.path.join(args.scenes, "*.mat")))
    if not paths:
        raise SystemExit(f"no .npy/.mat scenes under {args.scenes}")
    per_scene, summary = measure(args.ckpt, paths, crop=args.crop,
                                 platform=args.platform)
    for s in per_scene:
        print(f"  {os.path.basename(s['path'])}: "
              f"MPSNR {s['MPSNR']:.2f}  MPSNR_cc {s['MPSNR_cc']:.2f}  "
              f"SAM {s['SAM']:.3f}")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
