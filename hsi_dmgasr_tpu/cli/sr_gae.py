"""DMGASR stage-2 entry point (reference sr_gae.py).

Usage: python -m hsi_dmgasr_tpu.cli.sr_gae -c configs/pavia_x4.json -p train
"""

from __future__ import annotations

from ..train import stage2_driver
from .common import base_parser, force_platform, parse_opt


def main(argv=None):
    args = base_parser("configs/pavia_x4.json").parse_args(argv)
    force_platform(args.platform)
    opt = parse_opt(args)
    if args.phase == "train":
        stage2_driver.train(opt, seed=args.seed)
    else:
        stage2_driver.run_val_phase(opt, seed=args.seed)


if __name__ == "__main__":
    main()
