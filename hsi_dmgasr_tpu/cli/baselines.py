"""Baseline zoo train/test entry (reference GAE/*_train.py, GAE/test.py).

Usage:
  python -m hsi_dmgasr_tpu.cli.baselines train --model sspsr \
      --data /path/mat_scenes --n_colors 31 --scale 4 --out ./weight/sspsr
  python -m hsi_dmgasr_tpu.cli.baselines test --model sspsr \
      --data /path/npy_scenes --ckpt ./weight/sspsr --n_colors 31
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

from ..data import DataLoader, HSTestData, HSTrainingData
from ..evalhsi import quality_assessment, sum_dict
from ..train.baseline_trainer import BaselineTrainer

logger = logging.getLogger("base")


def add_common(p):
    p.add_argument("--model", required=True,
                   choices=["sspsr", "gelin", "edsr", "mcnet", "gdrrn"])
    p.add_argument("--data", required=True)
    p.add_argument("--n_colors", type=int, default=31)
    p.add_argument("--scale", type=int, default=4)
    p.add_argument("--n_feats", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None)


def main(argv=None):
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    tr = sub.add_parser("train")
    add_common(tr)
    tr.add_argument("--epochs", type=int, default=40)
    tr.add_argument("--batch_size", type=int, default=16)
    tr.add_argument("--lr", type=float, default=1e-4)
    tr.add_argument("--out", default="./weight/baseline")
    tr.add_argument("--max_steps", type=int, default=None)
    tr.add_argument("--grad_clip", type=float, default=None)
    te = sub.add_parser("test")
    add_common(te)
    te.add_argument("--ckpt", required=True)
    te.add_argument("--gt_size", type=int, default=64)
    args = ap.parse_args(argv)

    from .common import force_platform
    force_platform(args.platform)

    logging.basicConfig(level=logging.INFO)
    overrides = {}
    if args.n_feats:
        overrides["n_feats"] = args.n_feats

    if args.cmd == "train":
        trainer = BaselineTrainer(
            args.model, args.n_colors, args.scale, lr=args.lr,
            seed=args.seed, grad_clip=args.grad_clip, **overrides,
        )
        ds = HSTrainingData(args.data, n_scale=args.scale, augment=True)
        loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True,
                            seed=args.seed)
        step = 0
        for epoch in range(args.epochs):
            for batch in loader:
                loss = trainer.train_step(
                    batch["LR"], batch["HR"], lms=batch["SR"]
                    if args.model in ("gelin",) else None
                )
                step += 1
                if step % 10 == 0:
                    logger.info("epoch %d step %d loss %.5f",
                                epoch, step, float(loss))
                if args.max_steps and step >= args.max_steps:
                    break
            trainer.save(args.out)
            if args.max_steps and step >= args.max_steps:
                break
        logger.info("saved %s", args.out)
    else:
        trainer = BaselineTrainer(
            args.model, args.n_colors, args.scale, seed=args.seed, **overrides
        )
        trainer.load(args.ckpt)
        ds = HSTestData(args.data, n_scale=args.scale, gt_size=args.gt_size)
        indices, n = None, 0
        for item in (ds[i] for i in range(len(ds))):
            lr = item["LR"][None]
            lms = item["SR"][None]
            pred = np.asarray(trainer.predict(
                lr, lms if args.model in ("gelin",) else None
            ))[0]
            pred = np.clip(pred, 0, 1)
            qa = quality_assessment(item["HR"], pred, data_range=1.0,
                                    ratio=args.scale)
            indices = qa if indices is None else sum_dict(indices, qa)
            n += 1
        indices = {k: v / n for k, v in indices.items()}
        print(indices)
        return indices


if __name__ == "__main__":
    main()
