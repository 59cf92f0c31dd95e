"""Config system parity tests (core/logger.py semantics)."""

import json
import os

import pytest

from hsi_dmgasr_tpu import config as C


@pytest.fixture()
def cfg_file(tmp_path):
    cfg = {
        "name": "unit",
        "phase": "train",
        "gpu_ids": [0, 1],
        "path": {"log": "logs", "results": "results",
                 "checkpoint": "checkpoint", "resume_state": "some/prefix"},
        "datasets": {"train": {"batch_size": 16, "data_len": -1},
                     "val": {"data_len": 50}},
        "model": {"beta_schedule": {"train": {"n_timestep": 2000},
                                    "val": {"n_timestep": 2000}}},
        "train": {"val_freq": 1000, "print_freq": 100,
                  "save_checkpoint_freq": 1000},
    }
    p = tmp_path / "c.json"
    # inject // comments like the reference configs carry
    text = json.dumps(cfg, indent=2).replace(
        '"name": "unit",', '"name": "unit", // experiment name'
    )
    p.write_text(text)
    return str(p)


def test_comment_stripping_and_nonedict(cfg_file, tmp_path):
    opt = C.parse(cfg_file, experiments_root=str(tmp_path / "exp"))
    assert opt["name"] == "unit"
    assert opt["missing_key"] is None
    assert opt["model"]["missing"] is None


def test_debug_rewrites(cfg_file, tmp_path):
    opt = C.parse(cfg_file, debug=True, experiments_root=str(tmp_path / "exp"))
    assert opt["name"].startswith("debug_")
    assert opt["train"]["val_freq"] == 2
    assert opt["model"]["beta_schedule"]["train"]["n_timestep"] == 10
    assert opt["datasets"]["train"]["data_len"] == 6
    assert opt["datasets"]["val"]["data_len"] == 3
    assert opt["datasets"]["train"]["batch_size"] == 2


def test_train_phase_limits_val_len(cfg_file, tmp_path):
    opt = C.parse(cfg_file, phase="train",
                  experiments_root=str(tmp_path / "exp"))
    assert opt["datasets"]["val"]["data_len"] == 3  # core/logger.py:73-74


def test_experiment_dirs_and_resume_untouched(cfg_file, tmp_path):
    root = str(tmp_path / "exp")
    opt = C.parse(cfg_file, experiments_root=root)
    assert os.path.isdir(opt["path"]["log"])
    assert opt["path"]["log"].startswith(root)
    # resume paths must NOT be relocated (core/logger.py:38-41)
    assert opt["path"]["resume_state"] == "some/prefix"


def test_device_count_from_gpu_ids(cfg_file, tmp_path):
    opt = C.parse(cfg_file, experiments_root=str(tmp_path / "e1"))
    assert opt["n_devices"] == 2 and opt["distributed"]
    opt = C.parse(cfg_file, device_ids="0",
                  experiments_root=str(tmp_path / "e2"))
    assert opt["n_devices"] == 1 and not opt["distributed"]


def test_regroup_predictions():
    """eval_hsi.py:319-405 band interleaving."""
    import numpy as np

    from hsi_dmgasr_tpu.cli.eval_hsi import regroup_predictions

    groups, test_num = 3, 2
    preds = []
    # pred_list layout: index = j + i*test_num (cube j, group i)
    for i in range(groups):
        for j in range(test_num):
            p = np.full((4, 4, 3), 0, np.float32)
            for ch in range(3):
                p[:, :, ch] = 10 * j + 3 * ch + i  # encodes (cube, ch, group)
            preds.append(p)
    preds_arr = [preds[j + i * test_num] for i in range(groups) for j in range(test_num)]
    cubes = regroup_predictions(np.array(preds_arr), test_num, groups, pad_last=1)
    assert cubes[0].shape == (4, 4, groups * 3 + 1)
    # cube 0: first `groups` bands are channel-0 of groups 0..G-1
    assert [cubes[0][0, 0, g] for g in range(groups)] == [0, 1, 2]
    # next block: channel-1 planes
    assert [cubes[0][0, 0, groups + g] for g in range(groups)] == [3, 4, 5]
    # pad repeats the final plane
    assert cubes[0][0, 0, -1] == cubes[0][0, 0, -2]


SHIPPED_CONFIGS = sorted(
    f for f in os.listdir(os.path.join(os.path.dirname(__file__), "..",
                                       "configs"))
    if f.endswith(".json")
)


@pytest.mark.parametrize("cfg", SHIPPED_CONFIGS)
def test_shipped_configs_parse(cfg, tmp_path):
    """Every shipped config parses, carries the reference schema spine,
    and (for the stage-2 recipes) a loadable GAE checkpoint path —
    insurance against config rot across the per-dataset recipes."""
    path = os.path.join(os.path.dirname(__file__), "..", "configs", cfg)
    opt = C.parse(path, experiments_root=str(tmp_path / "exp"))
    assert opt["name"]
    assert opt["model"]["beta_schedule"]["train"]["n_timestep"] > 0
    sched = opt["model"]["beta_schedule"]["train"]["schedule"]
    assert sched in ("quad", "linear", "warmup10", "warmup50",
                     "const", "jsd", "cosine")
    gae = opt["gae"]
    if gae:  # stage-2 dataset recipes
        # either a converted reference .pth or an own-trained orbax dir
        # (the self-contained recipe, pavia_selfcontained_r5.json)
        assert gae["checkpoint"]
        assert gae["checkpoint"].endswith(".pth") or "gae" in os.path.basename(
            gae["checkpoint"])
        # latent affine recipes must ship both halves or neither
        assert (gae["latent_shift"] is None) == (gae["latent_scale"] is None)
        ts = opt["model"]["diffusion"]["t_start"]
        if ts is not None:
            assert 0 < ts <= opt["model"]["beta_schedule"]["val"]["n_timestep"]
