"""Stage-2 driver e2e: the sr_gae train loop on synthetic data with a
converted GAE checkpoint (when available), miniature diffusion config."""

import json
import os

import numpy as np
import pytest

GAE_CKPT = os.environ.get(
    "GAE_PRETRAINED", "/root/reference/GAE_pretrained/GAE_4_Cav.pth"
)


@pytest.mark.skipif(not os.path.exists(GAE_CKPT),
                    reason="reference GAE checkpoint unavailable")
def test_sr_gae_train_loop_end_to_end(synth_data, tmp_path):
    from hsi_dmgasr_tpu import config as C
    from hsi_dmgasr_tpu.train import stage2_driver

    cfg = {
        "name": "drv",
        "gpu_ids": [0],
        "scale": 2,
        "path": {"log": "logs", "results": "results",
                 "checkpoint": "checkpoint", "tb_logger": "tb"},
        "gae": {"checkpoint": GAE_CKPT},
        "datasets": {
            "train": {"dataroot": os.path.join(synth_data, "mat_scenes"),
                      "datatype": "hsi_mat", "l_resolution": 16,
                      "batch_size": 2, "use_shuffle": True, "data_len": 4},
            "val": {"dataroot": os.path.join(synth_data, "npy_scenes"),
                    "datatype": "hsi_npy", "r_resolution": 32, "data_len": 1},
        },
        "model": {
            "which_model_G": "sr3",
            "finetune_norm": False,
            "unet": {"in_channel": 6, "out_channel": 3, "inner_channel": 8,
                     "norm_groups": 4, "channel_multiplier": [1, 2],
                     "attn_res": [8], "res_blocks": 1, "dropout": 0.0},
            "beta_schedule": {
                "train": {"schedule": "cosine", "n_timestep": 3,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "cosine", "n_timestep": 3,
                        "linear_start": 1e-6, "linear_end": 1e-2}},
            "diffusion": {"image_size": 32, "channels": 3,
                          "conditional": True},
        },
        "train": {"n_iter": 2, "val_freq": 2, "save_checkpoint_freq": 2,
                  "print_freq": 1, "optimizer": {"type": "adam", "lr": 1e-4}},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    opt = C.parse(str(cfg_path), phase="train",
                  experiments_root=str(tmp_path / "exp"))

    pipeline, results = stage2_driver.train(opt, seed=0)
    assert results, "validation should have run at val_freq"
    for k in ["MPSNR", "MSSIM", "SAM"]:
        assert np.isfinite(results["indices"][k])
        assert np.isfinite(results["indices_cc"][k])
    # artifacts: checkpoint + result images/npy
    ckpts = os.listdir(opt["path"]["checkpoint"])
    assert any(c.startswith("I2_E") for c in ckpts)
    result_files = []
    for root, _, files in os.walk(opt["path"]["results"]):
        result_files += files
    assert any(f.endswith("_sr.npy") for f in result_files)
    assert any(f.endswith("_err.png") for f in result_files)
    # best-val tracking: the first val sweep must have produced a best
    # snapshot + best.json metadata
    assert any(c.startswith("best_I") for c in ckpts), ckpts
    best = stage2_driver._read_best(opt["path"]["checkpoint"])
    assert best and best["name"].startswith("best_I")
    assert np.isfinite(best["value"])
    # -p val with no resume_state defaults to the best snapshot
    opt_val = dict(opt)
    opt_val["path"] = dict(opt["path"], resume_state=None)
    results_val = stage2_driver.run_val_phase(opt_val, seed=0)
    assert np.isfinite(results_val["indices"]["MPSNR"])

@pytest.mark.skipif(not os.path.exists(GAE_CKPT),
                    reason="reference GAE checkpoint unavailable")
def test_resume_continues_step_counter(synth_data, tmp_path):
    """Elastic recovery: a new process resuming from I{it}_E{ep} must
    continue the iteration counter, not restart at 0 (the supervisor's
    contract, cli/sr_gae.py)."""
    import jax
    from hsi_dmgasr_tpu import config as C
    from hsi_dmgasr_tpu.train import stage2_driver

    cfg = {
        "name": "drv_resume",
        "gpu_ids": [0],
        "scale": 2,
        "path": {"log": "logs", "results": "results",
                 "checkpoint": "checkpoint", "tb_logger": "tb"},
        "gae": {"checkpoint": GAE_CKPT},
        "datasets": {
            "train": {"dataroot": os.path.join(synth_data, "mat_scenes"),
                      "datatype": "hsi_mat", "l_resolution": 16,
                      "batch_size": 2, "use_shuffle": True, "data_len": 4},
            "val": {"dataroot": os.path.join(synth_data, "npy_scenes"),
                    "datatype": "hsi_npy", "r_resolution": 32, "data_len": 1},
        },
        "model": {
            "which_model_G": "sr3",
            "finetune_norm": False,
            "unet": {"in_channel": 6, "out_channel": 3, "inner_channel": 8,
                     "norm_groups": 4, "channel_multiplier": [1, 2],
                     "attn_res": [8], "res_blocks": 1, "dropout": 0.0},
            "beta_schedule": {
                "train": {"schedule": "cosine", "n_timestep": 3,
                          "linear_start": 1e-6, "linear_end": 1e-2},
                "val": {"schedule": "cosine", "n_timestep": 3,
                        "linear_start": 1e-6, "linear_end": 1e-2}},
            "diffusion": {"image_size": 32, "channels": 3,
                          "conditional": True},
        },
        "train": {"n_iter": 2, "val_freq": 100, "save_checkpoint_freq": 2,
                  "print_freq": 10, "optimizer": {"type": "adam", "lr": 1e-4}},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    opt = C.parse(str(cfg_path), phase="train",
                  experiments_root=str(tmp_path / "exp"))
    pipeline, _ = stage2_driver.train(opt, seed=0)
    ckpt = os.path.join(opt["path"]["checkpoint"], "I2_E1")
    assert os.path.isdir(ckpt)
    params_after_2 = jax.device_get(pipeline.ddpm.state.params)

    # "restart": fresh parse with resume_state, raised n_iter
    opt2 = C.parse(str(cfg_path), phase="train",
                   experiments_root=str(tmp_path / "exp"))
    opt2["path"]["resume_state"] = ckpt
    opt2["train"]["n_iter"] = 4
    pipeline2, _ = stage2_driver.train(opt2, seed=0)
    assert pipeline2.ddpm.begin_step == 2
    ckpts = os.listdir(opt2["path"]["checkpoint"])
    assert any(c.startswith("I4_E") for c in ckpts), ckpts
    # the restored params matched the step-2 state before training on
    leaves1 = jax.tree.leaves(params_after_2)
    assert all(np.isfinite(l).all() for l in leaves1)


def test_latest_checkpoint_picker(tmp_path):
    from hsi_dmgasr_tpu.cli.sr_gae import _latest_checkpoint

    assert _latest_checkpoint(str(tmp_path / "nope")) is None
    for name in ["I100_E3", "I900_E7", "I2500_E11", "junk", "I33",
                 "best_I9000_E5"]:
        os.makedirs(tmp_path / name)
    # The pick is by iteration number, best_* and periodic alike:
    # best snapshots are written by the same ddpm.save_checkpoint and
    # hold the FULL train state (params, opt_state, step counter, EMA),
    # so resuming from whichever has the highest iteration is safe and
    # loses the least work (val_freq < save_checkpoint_freq means the
    # newest best_* is often ahead of the newest periodic; observed:
    # PavT200_r4 redid 2000->2500 on every restart before this).
    assert _latest_checkpoint(str(tmp_path)).endswith("best_I9000_E5")
    # with no best_* ahead, the newest periodic still wins
    os.rmdir(tmp_path / "best_I9000_E5")
    assert _latest_checkpoint(str(tmp_path)).endswith("I2500_E11")


def test_best_checkpoint_rolls(tmp_path):
    """save_best_checkpoint keeps exactly one best_* snapshot and
    best.json tracks the winner."""
    from hsi_dmgasr_tpu.train.stage2_driver import (
        _read_best,
        save_best_checkpoint,
    )

    class _FakeDDPM:
        def save_checkpoint(self, ckpt_dir, epoch, it, name=None):
            path = os.path.join(ckpt_dir, name or f"I{it}_E{epoch}")
            os.makedirs(path)
            return path

    class _FakePipeline:
        ddpm = _FakeDDPM()

    d = str(tmp_path)
    assert _read_best(d) is None
    save_best_checkpoint(_FakePipeline(), d, 1, 500, 20.0)
    assert _read_best(d)["value"] == 20.0
    assert os.path.isdir(os.path.join(d, "best_I500_E1"))
    save_best_checkpoint(_FakePipeline(), d, 2, 1500, 23.5)
    best = _read_best(d)
    assert best["name"] == "best_I1500_E2" and best["value"] == 23.5
    assert not os.path.exists(os.path.join(d, "best_I500_E1"))
    assert os.path.isdir(os.path.join(d, "best_I1500_E2"))


def test_prune_periodic_checkpoints(tmp_path):
    """Retention keeps the newest N periodic saves (numeric iteration
    order, not lexicographic) and never touches best_* / best.json."""
    from hsi_dmgasr_tpu.train.stage2_driver import (
        prune_periodic_checkpoints)

    names = ["I500_E32", "I1000_E63", "I9500_E594", "I10000_E625",
             "best_I9500_E594"]
    for n in names:
        (tmp_path / n).mkdir()
    (tmp_path / "best.json").write_text("{}")

    prune_periodic_checkpoints(str(tmp_path), keep=2)
    left = sorted(p.name for p in tmp_path.iterdir())
    assert left == ["I10000_E625", "I9500_E594", "best.json",
                    "best_I9500_E594"]

    # keep<=0 disables (reference behavior: keep everything)
    prune_periodic_checkpoints(str(tmp_path), keep=0)
    assert sorted(p.name for p in tmp_path.iterdir()) == left
