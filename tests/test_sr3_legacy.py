"""SR3 legacy face-SR path: shipped celebahq fixtures end-to-end.

Exercises LRHRDataset 'img' mode on the reference's dataset folder
(skipped when unavailable) and the unconditional DDPM path.
"""

import os

import jax
import numpy as np
import pytest

CELEB = os.environ.get(
    "CELEBAHQ_DIR", "/root/reference/dataset/celebahq_16_128"
)

TINY_FACE_OPT = {
    "name": "face_tiny",
    "gpu_ids": [0],
    "model": {
        "which_model_G": "sr3",
        "unet": {
            "in_channel": 6, "out_channel": 3, "inner_channel": 8,
            "norm_groups": 4, "channel_multiplier": [1, 2], "attn_res": [8],
            "res_blocks": 1, "dropout": 0.0,
        },
        "beta_schedule": {
            "train": {"schedule": "cosine", "n_timestep": 4,
                      "linear_start": 1e-6, "linear_end": 1e-2},
            "val": {"schedule": "cosine", "n_timestep": 4,
                    "linear_start": 1e-6, "linear_end": 1e-2},
        },
        "diffusion": {"image_size": 128, "channels": 3, "conditional": True},
    },
    "train": {"optimizer": {"type": "adam", "lr": 1e-4}},
    "path": {},
}


@pytest.mark.skipif(not os.path.isdir(CELEB), reason="celebahq fixture absent")
def test_lrhr_img_mode_loads_shipped_fixture():
    from hsi_dmgasr_tpu.data import LRHRDataset

    ds = LRHRDataset(CELEB, datatype="img", l_resolution=16, r_resolution=128,
                     split="val", need_LR=True)
    assert len(ds) >= 1
    item = ds[0]
    assert item["HR"].shape == (128, 128, 3)
    assert item["SR"].shape == (128, 128, 3)
    assert item["LR"].shape == (16, 16, 3)
    assert -1.0 <= item["HR"].min() and item["HR"].max() <= 1.0


@pytest.mark.skipif(not os.path.isdir(CELEB), reason="celebahq fixture absent")
def test_sr3_train_step_on_faces():
    from hsi_dmgasr_tpu.data import LRHRDataset
    from hsi_dmgasr_tpu.train import DDPMModel

    ds = LRHRDataset(CELEB, datatype="img", l_resolution=16, r_resolution=128,
                     split="train")
    item = ds[0]
    batch = {"HR": item["HR"][None], "SR": item["SR"][None]}
    model = DDPMModel(TINY_FACE_OPT, seed=0)
    loss = model.train_step(batch, key=jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_unconditional_sampling():
    from hsi_dmgasr_tpu.train import DDPMModel

    opt = {**TINY_FACE_OPT, "model": {**TINY_FACE_OPT["model"]}}
    opt["model"] = dict(opt["model"])
    opt["model"]["unet"] = dict(opt["model"]["unet"], in_channel=3)
    opt["model"]["diffusion"] = dict(
        opt["model"]["diffusion"], conditional=False, image_size=16
    )
    model = DDPMModel(opt, seed=0,
                      example_shape=(1, 16, 16, 3))
    out = model.sample(batch_size=2, key=jax.random.PRNGKey(1))
    assert out.shape == (2, 16, 16, 3)
