"""SR3 inference-only entry (reference infer.py:60-101): run conditional
super-resolution over the val split and save result grids."""

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
    p = base_parser("configs/sr_sr3_16_128.json", "val")
    p.add_argument("--process_mode", choices=["grid", "single", "none"],
                   default="grid",
                   help="reverse-process artifacts: 'grid' tiles the "
                        "denoising progression into {idx}_sr_process.png "
                        "(reference infer.py:85-90), 'single' saves one "
                        "PNG per kept step (infer.py:78-83), 'none' skips")
    args = p.parse_args(argv)
    force_platform(args.platform)
    opt = parse_opt(args)
    setup_logger("base", opt["path"]["log"], "infer", screen=True)

    model = DDPMModel(opt, seed=args.seed)
    val_set = create_dataset(opt["datasets"]["val"], "val")
    loader = create_dataloader(val_set, opt["datasets"]["val"], "val")
    result_path = opt["path"]["results"]
    os.makedirs(result_path, exist_ok=True)

    for idx, batch in enumerate(loader):
        if args.process_mode == "none":
            sr = np.asarray(model.super_resolution(batch["SR"]))
        else:
            # continous=True: [SR-cond, strided reverse-chain states,
            # final] stacked on the batch axis (diffusion.py:177-201)
            stack = model.super_resolution(batch["SR"], continous=True)
            b = np.asarray(batch["SR"]).shape[0]
            sr = stack[-b:]
            if args.process_mode == "grid":
                save_img(
                    tensor2img(stack, min_max=(-1, 1)),
                    f"{result_path}/{idx}_sr_process.png",
                )
            else:
                for it in range(stack.shape[0] // b):
                    save_img(
                        tensor2img(stack[it * b:(it + 1) * b],
                                   min_max=(-1, 1)),
                        f"{result_path}/{idx}_sr_{it}.png",
                    )
        save_img(
            tensor2img(sr, min_max=(-1, 1)),
            f"{result_path}/{idx}_sr.png",
        )
        save_img(
            tensor2img(batch["HR"], min_max=(-1, 1)),
            f"{result_path}/{idx}_hr.png",
        )
        save_img(
            tensor2img(batch["SR"], min_max=(-1, 1)),
            f"{result_path}/{idx}_inf.png",
        )
        logger.info("wrote %s/%d_*.png", result_path, idx)


if __name__ == "__main__":
    main()
