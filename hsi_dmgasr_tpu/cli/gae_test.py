"""GAE reconstruction round-trip evaluation (reference GAE/AE_test.py).

Loads a GAE checkpoint (.pth or orbax), encodes+decodes test cubes, and
reports the HSI quality suite per cube and averaged.

Usage:
  python -m hsi_dmgasr_tpu.cli.gae_test --ckpt GAE_4_Pav.pth \
      --data /path/npy_scenes --gt_size 64 [--platform cpu]
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from ..data import HSTestData
from ..evalhsi import quality_assessment, sum_dict
from ..models import GAE


def load_gae(ckpt):
    if ckpt.endswith(".pth"):
        from ..io import load_torch_gae

        return load_torch_gae(ckpt)
    from ..train.stage1_gae import GAETrainer

    return GAETrainer.load_gae_variables(ckpt)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--data", required=True)
    p.add_argument("--gt_size", type=int, default=64)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args(argv)

    from .common import force_platform

    force_platform(args.platform)

    variables, cfg = load_gae(args.ckpt)
    gae = GAE(n_subs=cfg["n_subs"], n_ovls=cfg["n_ovls"],
              n_colors=cfg["n_colors"], n_feats=cfg["n_feats"])

    @jax.jit
    def roundtrip(x):
        recon, _ = gae.apply(variables, x)
        return recon

    ds = HSTestData(args.data, n_scale=args.scale, gt_size=args.gt_size)
    indices, n = None, 0
    for i in range(len(ds)):
        gt = ds[i]["HR"]
        recon = np.clip(np.asarray(roundtrip(gt[None]))[0], 0, 1)
        qa = quality_assessment(gt, recon, data_range=1.0, ratio=args.scale)
        print(f"cube {i}: {qa}")
        indices = qa if indices is None else sum_dict(indices, qa)
        n += 1
    indices = {k: v / n for k, v in indices.items()}
    print(f"averaged reconstruction metrics: {indices}")
    return indices


if __name__ == "__main__":
    main()
