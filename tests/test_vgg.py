"""VGG19 perceptual-loss path: architecture/converter parity vs torch.

torchvision's pretrained weights are not downloadable here (zero
egress), so the torch side is built in-process with EXACTLY
torchvision's vgg19 module layout and state_dict key names
(tools/make_vgg_golden.build_torch_vgg19) and random weights — a real
user-supplied vgg19.pth has identical keys/shapes, so parity on this
model proves the conversion path (reference recipe: AE.py:551-604).
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

torch = pytest.importorskip("torch")

from hsi_dmgasr_tpu.io.convert_torch import state_dict_to_flax  # noqa: E402
from hsi_dmgasr_tpu.models.vgg import VGG19  # noqa: E402
from tools.make_vgg_golden import build_torch_vgg19  # noqa: E402


@pytest.fixture(scope="module")
def torch_vgg():
    torch.manual_seed(3)
    net = build_torch_vgg19().eval()
    sd = net.state_dict()
    for k, v in sd.items():
        sd[k] = v * 0.5 if k.endswith("weight") else v
    net.load_state_dict(sd)
    return net


@pytest.mark.parametrize("hw", [64, 96])
def test_vgg19_forward_parity(torch_vgg, hw):
    """Full logits parity, incl. the adaptive 7x7 pool at feature sizes
    below (64 -> 2x2) and not dividing (96 -> 3x3) the output bins, and
    the NCHW-order classifier flatten."""
    with torch.no_grad():
        rng = np.random.RandomState(5)
        x = rng.rand(2, 3, hw, hw).astype(np.float32)
        want = torch_vgg(torch.from_numpy(x)).numpy()

    sd = {k: v.numpy() for k, v in torch_vgg.state_dict().items()}
    variables = state_dict_to_flax(sd)
    got = VGG19().apply(variables, np.moveaxis(x, 1, -1))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=1e-3)


def test_vgg19_feature_extract(torch_vgg):
    with torch.no_grad():
        rng = np.random.RandomState(6)
        x = rng.rand(1, 3, 64, 64).astype(np.float32)
        want = torch_vgg.features(torch.from_numpy(x)).numpy()
    sd = {k: v.numpy() for k, v in torch_vgg.state_dict().items()}
    variables = state_dict_to_flax(sd)
    got = VGG19(extract="features").apply(variables, np.moveaxis(x, 1, -1))
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got), -1, 1), want, atol=1e-4, rtol=1e-3
    )


def test_load_torch_vgg19_file(torch_vgg, tmp_path):
    """The user-facing path: a saved vgg19 state_dict .pth round-trips
    through load_torch_vgg19 into working flax variables."""
    from hsi_dmgasr_tpu.io.convert_torch import load_torch_vgg19

    p = tmp_path / "vgg19.pth"
    torch.save(torch_vgg.state_dict(), str(p))
    variables = load_torch_vgg19(str(p))
    out = VGG19().apply(variables, np.zeros((1, 32, 32, 3), np.float32))
    assert out.shape == (1, 1000)
    assert np.isfinite(np.asarray(out)).all()


def test_perceptual_fn_in_gae_trainer(torch_vgg):
    """End-to-end stage-1 VGGSAM recipe: HLoss + 1e-3 * vgg L1 on 3
    random bands, gradients flowing (AE.py:602-615)."""
    from hsi_dmgasr_tpu.train.stage1_gae import (
        GAETrainer,
        make_vgg_perceptual_fn,
    )

    sd = {k: v.numpy() for k, v in torch_vgg.state_dict().items()}
    vgg_vars = state_dict_to_flax(sd)
    pfn = make_vgg_perceptual_fn(vgg_vars)
    rng = np.random.RandomState(0)
    hr = rng.rand(2, 32, 32, 31).astype(np.float32)

    # the perceptual term itself is live (random-weight vgg logits are
    # tiny, ~1e-9; pretrained weights give O(1) — so the trainer test
    # uses an exaggerated weight to make the contribution visible)
    p = float(pfn(hr * 0.5, hr, jax.random.PRNGKey(0)))
    assert p > 0

    tr = GAETrainer(
        n_subs=8, n_ovls=2, n_colors=31, n_feats=8, example_hw=32,
        perceptual_fn=pfn, perceptual_weight=1e8,
    )
    l1 = float(tr.train_step(hr))
    l2 = float(tr.train_step(hr))
    assert np.isfinite(l1) and np.isfinite(l2)
    tr0 = GAETrainer(n_subs=8, n_ovls=2, n_colors=31, n_feats=8,
                     example_hw=32)
    base = float(tr0.train_step(hr))
    assert abs(l1 - base) > 1e-6
