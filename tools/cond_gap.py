"""Per-geometry conditioning-information decomposition (no diffusion ckpt).

Round-5 CAVE diagnosis (BENCHMARKS.md) showed the informative probe for
"where does a stage-2 run saturate" needs only the GAE and the val
scenes: MPSNR_cc of
  * ceiling    = decode(encode(HR))         — the GAE reconstruction bound
  * cond-alone = decode(encode(SR_bicubic)) — what faithfully copying the
                 conditioning achieves (the t_start chain enters ON the
                 conditioning, so a run that adds nothing lands here)
  * bicubic    = plain imresize x4 up       — the no-learning baseline
The cond->ceiling gap is the detail the denoiser must ADD; geometries
with a small gap (Pavia ~1.9 dB) saturate near ceiling, large-gap
geometries (CAVE ~9.3 dB) saturate near cond-alone (reference behavior:
conditioning enters via concat, sr3_modules/unet.py:218-248).

    python tools/cond_gap.py --ckpt GAE_4_Har.pth --scenes <npy_dir>
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(ckpt, scene_paths, crop=128, scale=4, platform=None):
    """Returns {ceiling_cc, cond_alone_cc, bicubic_cc, per_scene}."""
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    import jax
    import jax.numpy as jnp

    from hsi_dmgasr_tpu.data.imresize import imresize
    from hsi_dmgasr_tpu.evalhsi import color_correction, quality_assessment
    from hsi_dmgasr_tpu.models.gae import GAE

    if ckpt.endswith(".pth"):
        from hsi_dmgasr_tpu.io.convert_torch import load_torch_gae

        variables, cfg = load_torch_gae(ckpt)
    else:
        from hsi_dmgasr_tpu.train.stage1_gae import GAETrainer

        variables, cfg = GAETrainer.load_gae_variables(ckpt)
    gae = GAE(n_subs=cfg["n_subs"], n_ovls=cfg["n_ovls"],
              n_colors=cfg["n_colors"], n_feats=cfg["n_feats"])
    roundtrip = jax.jit(lambda v, x: gae.apply(
        v, gae.apply(v, x, method=GAE.encode), method=GAE.decode))

    def cc_psnr(gt, y):
        y_cc = color_correction(gt, np.clip(y, 0, 1),
                                num_channels=cfg["n_colors"])
        return float(quality_assessment(
            gt, y_cc, data_range=1.0, ratio=scale)["MPSNR"])

    per_scene = []
    for p in scene_paths:
        cube = (np.load(p) if p.endswith(".npy") else None)
        if cube is None:
            import scipy.io as sio

            cube = np.asarray(sio.loadmat(
                p, verify_compressed_data_integrity=False)["block"])
        cube = cube.astype(np.float32)[:crop, :crop, : cfg["n_colors"]]
        # the exact degradation the data layer applies (data/lrhr.py)
        lr = imresize(cube, scalar_scale=1.0 / scale)
        sr = imresize(lr, scalar_scale=scale).astype(np.float32)
        ceil_y = np.asarray(roundtrip(variables, jnp.asarray(cube[None])))[0]
        cond_y = np.asarray(roundtrip(variables, jnp.asarray(sr[None])))[0]
        per_scene.append({
            "scene": os.path.basename(p),
            "ceiling_cc": cc_psnr(cube, ceil_y),
            "cond_alone_cc": cc_psnr(cube, cond_y),
            "bicubic_cc": cc_psnr(cube, sr),
        })
    out = {k: float(np.mean([s[k] for s in per_scene]))
           for k in ("ceiling_cc", "cond_alone_cc", "bicubic_cc")}
    out["cond_gap_db"] = out["ceiling_cc"] - out["cond_alone_cc"]
    out["per_scene"] = per_scene
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--scenes", required=True)
    ap.add_argument("--crop", type=int, default=128)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    paths = sorted(glob.glob(os.path.join(args.scenes, "*.npy")) +
                   glob.glob(os.path.join(args.scenes, "*.mat")))
    if not paths:
        sys.exit(f"no scenes under {args.scenes}")
    res = measure(args.ckpt, paths, crop=args.crop, scale=args.scale,
                  platform=args.platform)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
