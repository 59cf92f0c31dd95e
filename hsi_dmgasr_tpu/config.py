"""Config system: JSON with ``//`` comments, NoneDict semantics, debug mode.

Behavioral parity with the reference's ``core/logger.py:21-112``:
  * JSON configs may carry ``//`` line comments (stripped per line).
  * ``parse`` creates the experiment directory tree
    ``experiments/{name}_{timestamp}/{log,tb_logger,results,checkpoint}``.
  * ``-debug`` rewrites the config into a miniature end-to-end run
    (val_freq=2, n_timestep=10, data_len=6/3, batch_size=2).
  * Missing keys read as ``None`` (NoneDict).

TPU adaptation: ``gpu_ids`` is accepted for schema compatibility but maps
to a requested data-parallel device count (``n_devices``); device placement
is owned by the mesh (parallel/mesh.py), never by env vars.
"""

from __future__ import annotations

import json
import os
from collections import OrderedDict
from datetime import datetime


class NoneDict(dict):
    """dict returning None for missing keys (core/logger.py:97-100)."""

    def __missing__(self, key):
        return None


def dict_to_nonedict(opt):
    """Recursively convert dicts to NoneDict (core/logger.py:103-112)."""
    if isinstance(opt, dict):
        return NoneDict(**{k: dict_to_nonedict(v) for k, v in opt.items()})
    if isinstance(opt, list):
        return [dict_to_nonedict(v) for v in opt]
    return opt


def dict2str(opt, indent_l=1):
    """Pretty-print nested config for logging (core/logger.py:115-125)."""
    msg = ""
    for k, v in opt.items():
        if isinstance(v, dict):
            msg += " " * (indent_l * 2) + k + ":[\n"
            msg += dict2str(v, indent_l + 1)
            msg += " " * (indent_l * 2) + "]\n"
        else:
            msg += " " * (indent_l * 2) + k + ": " + str(v) + "\n"
    return msg


def get_timestamp():
    return datetime.now().strftime("%y%m%d_%H%M%S")


def load_json_with_comments(path):
    """Load a JSON file stripping ``//`` line comments (core/logger.py:27-32)."""
    json_str = ""
    with open(path, "r") as f:
        for line in f:
            json_str += line.split("//")[0] + "\n"
    return json.loads(json_str, object_pairs_hook=OrderedDict)


def apply_debug(opt):
    """Miniaturize a config for smoke runs (core/logger.py:61-70)."""
    opt["train"]["val_freq"] = 2
    opt["train"]["print_freq"] = 2
    opt["train"]["save_checkpoint_freq"] = 3
    opt["datasets"]["train"]["batch_size"] = 2
    opt["model"]["beta_schedule"]["train"]["n_timestep"] = 10
    opt["model"]["beta_schedule"]["val"]["n_timestep"] = 10
    opt["datasets"]["train"]["data_len"] = 6
    opt["datasets"]["val"]["data_len"] = 3
    return opt


def parse(
    config,
    phase="train",
    device_ids=None,
    debug=False,
    enable_wandb=False,
    log_wandb_ckpt=False,
    log_eval=False,
    log_infer=False,
    make_dirs=True,
    experiments_root=None,
):
    """Parse a config file (or pre-loaded dict) into an option NoneDict.

    Mirrors ``Logger.parse`` (core/logger.py:21-94) with the CUDA env-var
    export replaced by a device-count request consumed by the mesh layer.
    """
    opt = (
        load_json_with_comments(config)
        if isinstance(config, (str, os.PathLike))
        else json.loads(json.dumps(config), object_pairs_hook=OrderedDict)
    )

    if debug:
        opt["name"] = "debug_{}".format(opt["name"])

    if experiments_root is None:
        experiments_root = os.path.join(
            "experiments", "{}_{}".format(opt["name"], get_timestamp())
        )
    opt.setdefault("path", OrderedDict())
    opt["path"]["experiments_root"] = experiments_root
    for key, path in list(opt["path"].items()):
        if "resume" not in key and "experiments" not in key:
            opt["path"][key] = os.path.join(experiments_root, path)
            if make_dirs:
                os.makedirs(opt["path"][key], exist_ok=True)

    opt["phase"] = phase

    # device selection: schema keeps gpu_ids; we derive a device count.
    if device_ids is not None:
        if isinstance(device_ids, str):
            device_ids = [int(x) for x in device_ids.split(",")]
        opt["gpu_ids"] = list(device_ids)
    ids = opt.get("gpu_ids") or [0]
    opt["n_devices"] = len(ids)
    opt["distributed"] = len(ids) > 1

    if "debug" in opt["name"]:
        apply_debug(opt)

    if phase == "train" and opt.get("datasets", {}).get("val") is not None:
        opt["datasets"]["val"]["data_len"] = 3

    opt["log_wandb_ckpt"] = log_wandb_ckpt
    opt["log_eval"] = log_eval
    opt["log_infer"] = log_infer
    opt["enable_wandb"] = enable_wandb

    return dict_to_nonedict(opt)


def setup_logger(logger_name, root, phase, level=None, screen=False):
    """File+screen logger pair (core/logger.py:128-141)."""
    import logging

    if level is None:
        level = logging.INFO
    l = logging.getLogger(logger_name)
    formatter = logging.Formatter(
        "%(asctime)s.%(msecs)03d - %(levelname)s: %(message)s",
        datefmt="%y-%m-%d %H:%M:%S",
    )
    log_file = os.path.join(root, "{}.log".format(phase))
    # append: a supervised restart (cli/sr_gae.py --supervise) reuses
    # the experiment dir and must not truncate the training curve
    fh = logging.FileHandler(log_file, mode="a")
    fh.setFormatter(formatter)
    l.setLevel(level)
    l.addHandler(fh)
    if screen:
        sh = logging.StreamHandler()
        sh.setFormatter(formatter)
        l.addHandler(sh)
    return l
