"""Unconditional DDPM generation entry (reference sample.py:72-162).

Trains (phase=train) or samples (phase=val) an unconditional model on the
LRHR face data.
"""

from __future__ import annotations

import logging
import os

import numpy as np

from ..config import setup_logger
from ..data import create_dataloader, create_dataset
from ..evalhsi.image_io import save_img, tensor2img
from ..train.ddpm_model import DDPMModel
from .common import base_parser, force_platform, parse_opt

logger = logging.getLogger("base")


def main(argv=None):
    args = base_parser("configs/sample_ddpm_16.json", "train").parse_args(argv)
    force_platform(args.platform)
    opt = parse_opt(args)
    setup_logger("base", opt["path"]["log"], args.phase, screen=True)

    model = DDPMModel(opt, seed=args.seed)
    result_path = opt["path"]["results"]
    os.makedirs(result_path, exist_ok=True)

    if args.phase == "train":
        train_set = create_dataset(opt["datasets"]["train"], "train")
        loader = create_dataloader(train_set, opt["datasets"]["train"], "train")
        n_iter = opt["train"]["n_iter"]
        step = 0
        while step < n_iter:
            for batch in loader:
                step += 1
                if step > n_iter:
                    break
                loss = model.train_step({"HR": batch["HR"], "SR": None})
                if step % opt["train"]["print_freq"] == 0:
                    logger.info("iter %d l_pix %.4e", step, float(loss))
                if step % opt["train"]["save_checkpoint_freq"] == 0:
                    model.save_checkpoint(opt["path"]["checkpoint"], 0, step)
                if step % opt["train"]["val_freq"] == 0:
                    imgs = np.asarray(model.sample(batch_size=1))
                    save_img(
                        tensor2img(imgs, min_max=(-1, 1)),
                        f"{result_path}/{step}_sample.png",
                    )
    else:
        # evaluation phase: continous process grids + finals
        # (reference sample.py:134-158)
        for i in range(opt["datasets"]["val"].get("data_len") or 1):
            stack = model.sample(batch_size=1, continous=True)
            save_img(
                tensor2img(stack, min_max=(-1, 1)),
                f"{result_path}/{i}_sample_process.png",
            )
            save_img(
                tensor2img(stack[-1:], min_max=(-1, 1)),
                f"{result_path}/sample_{i}.png",
            )
        logger.info("wrote samples to %s", result_path)


if __name__ == "__main__":
    main()
