"""Shared CLI argument handling (reference sr_gae.py:128-146 flags)."""

from __future__ import annotations

import argparse
import os

from .. import config as config_mod

# The axon remote-TPU client keeps a replay journal of every uploaded
# buffer (for reconnect replay); an unbounded journal leaks the full
# training input stream on the host (~27 MB/step -> OOM-killed at 125 GB
# after ~2200 steps, reproduced in tools-level probes). Compaction caps
# it at a steady state. Must be set before the backend initializes.
os.environ.setdefault("AXON_JOURNAL_COMPACT", "1")


def force_platform(platform):
    """Pin the jax platform (the image's sitecustomize pre-imports jax and
    pins 'axon,cpu', so env vars alone cannot select CPU)."""
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def base_parser(default_config, default_phase="train"):
    p = argparse.ArgumentParser()
    p.add_argument("-c", "--config", type=str, default=default_config)
    p.add_argument("-p", "--phase", type=str,
                   choices=["train", "val"], default=default_phase)
    p.add_argument("-gpu", "--gpu_ids", type=str, default=None)
    p.add_argument("-debug", "-d", action="store_true")
    p.add_argument("-enable_wandb", action="store_true")
    p.add_argument("-log_wandb_ckpt", action="store_true")
    p.add_argument("-log_eval", action="store_true")
    p.add_argument("-log_infer", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default=None,
                   help="force jax platform (e.g. cpu)")
    p.add_argument("--resume", type=str, default=None,
                   help="override path.resume_state (orbax ckpt dir or "
                        "torch '{prefix}' for {prefix}_gen.pth)")
    p.add_argument("--experiments_root", type=str, default=None,
                   help="pin the experiment dir (default: "
                        "experiments/{name}_{timestamp})")
    return p


def parse_opt(args):
    opt = config_mod.parse(
        args.config,
        phase=args.phase,
        device_ids=args.gpu_ids,
        debug=args.debug,
        enable_wandb=args.enable_wandb,
        log_wandb_ckpt=getattr(args, "log_wandb_ckpt", False),
        log_eval=getattr(args, "log_eval", False),
        log_infer=getattr(args, "log_infer", False),
        experiments_root=getattr(args, "experiments_root", None),
    )
    if getattr(args, "resume", None):
        opt["path"]["resume_state"] = args.resume
    return opt
