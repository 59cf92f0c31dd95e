"""3-D attention GAN training entry (reference GAE/train.py +
GAE/icvl_train.py): RaGAN over ICVL-style tiled scenes.

Usage:
  python -m hsi_dmgasr_tpu.cli.gan_train --data scenes.npy --n_bands 31 \
      --epochs 5 --out ./weight/gan [--platform cpu]
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

from ..data import DataLoader
from ..data.scenes import ICVLTiles
from ..train.gan_trainer import GAN3DTrainer

logger = logging.getLogger("base")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True, help="stacked-scene .npy")
    p.add_argument("--n_bands", type=int, default=31)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--fis", type=int, default=144)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--out", default="./weight/gan3d")
    args = p.parse_args(argv)

    from .common import force_platform

    force_platform(args.platform)
    logging.basicConfig(level=logging.INFO)

    ds = ICVLTiles(args.data, s=args.scale, fis=args.fis)
    loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True,
                        seed=args.seed)
    trainer = GAN3DTrainer(
        n_bands=args.n_bands, lr_g=args.lr, lr_d=args.lr, seed=args.seed,
        example_hw=args.fis // args.scale,
    )
    step = 0
    for epoch in range(args.epochs):
        for lr_cube, hr in loader:
            g_loss, d_loss = trainer.train_step(lr_cube, hr)
            step += 1
            if step % 5 == 0:
                logger.info("epoch %d step %d g=%.4f d=%.4f",
                            epoch, step, float(g_loss), float(d_loss))
            if args.max_steps and step >= args.max_steps:
                break
        if args.max_steps and step >= args.max_steps:
            break

    import orbax.checkpoint as ocp
    import os

    import jax

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(
            os.path.abspath(args.out),
            {"g_params": jax.device_get(trainer.g_state.params),
             "d_params": jax.device_get(trainer.d_state.params)},
            force=True,  # re-saving a given path overwrites (resume reruns)
        )
    logger.info("saved %s", args.out)


if __name__ == "__main__":
    main()
