"""Baseline zoo: structural parity (exact param counts vs the torch
reference at fixed configs) + forward shape checks."""

import os

import jax
import numpy as np
import pytest

from hsi_dmgasr_tpu.models.baselines import EDSR, GDRNN, GELIN, MCNet, SSPSR

GOLDEN = os.path.join(
    os.path.dirname(__file__), "golden", "baseline_params_golden.npz"
)


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("baseline goldens not generated")
    return np.load(GOLDEN)


def _n(v):
    return sum(p.size for p in jax.tree.leaves(v))


@pytest.fixture(scope="module")
def x():
    return np.random.RandomState(0).rand(1, 8, 8, 31).astype(np.float32)


def test_sspsr(golden, x):
    m = SSPSR(n_subs=8, n_ovls=2, n_colors=31, n_blocks=3, n_feats=16, n_scale=4)
    v = m.init(jax.random.PRNGKey(0), x, x)
    assert _n(v) == int(golden["sspsr_params"])
    assert m.apply(v, x, x).shape == (1, 32, 32, 31)


def test_sspsr_forward_weight_parity():
    """Converted reference SSPSR weights reproduce the torch forward."""
    path = os.path.join(
        os.path.dirname(__file__), "golden", "sspsr_forward_golden.npz"
    )
    if not os.path.exists(path):
        pytest.skip("sspsr forward golden not generated")
    from hsi_dmgasr_tpu.io.convert_torch import state_dict_to_flax

    g = np.load(path)
    sd = {k.split("::", 1)[1]: g[k] for k in g.files if k.startswith("sd::")}
    variables = state_dict_to_flax(sd)
    m = SSPSR(n_subs=8, n_ovls=2, n_colors=31, n_blocks=3, n_feats=16,
              n_scale=4)
    xin = np.moveaxis(g["x"], 1, -1)
    y = m.apply(variables, xin, xin)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(y), -1, 1), g["y"], atol=2e-5, rtol=1e-4
    )


def test_gelin(golden, x):
    lms = np.random.RandomState(1).rand(1, 32, 32, 31).astype(np.float32)
    m = GELIN(n_feats=16, n_colors=31, n_subs=8, n_ovls=2, blocks=2, scale=4)
    v = m.init(jax.random.PRNGKey(0), x, lms)
    assert _n(v) == int(golden["gelin_params"])
    assert m.apply(v, x, lms).shape == (1, 32, 32, 31)


def test_gelin_forward_weight_parity():
    """Converted reference GELIN weights (incl. deconv IOHW layout and
    PReLU alphas) reproduce the torch forward."""
    path = os.path.join(
        os.path.dirname(__file__), "golden", "gelin_forward_golden.npz"
    )
    if not os.path.exists(path):
        pytest.skip("gelin forward golden not generated")
    from hsi_dmgasr_tpu.io.convert_torch import state_dict_to_flax

    g = np.load(path)
    sd = {k.split("::", 1)[1]: g[k] for k in g.files if k.startswith("sd::")}
    variables = state_dict_to_flax(sd)
    m = GELIN(n_feats=16, n_colors=31, n_subs=8, n_ovls=2, blocks=2, scale=4)
    xin = np.moveaxis(g["x"], 1, -1)
    lms = np.moveaxis(g["lms"], 1, -1)
    y = m.apply(variables, xin, lms)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(y), -1, 1), g["y"], atol=2e-5, rtol=1e-4
    )


def test_mcnet(golden, x):
    m = MCNet(scale=4, n_colors=31, n_feats=8)
    v = m.init(jax.random.PRNGKey(0), x)
    assert _n(v) == int(golden["mcnet_params"])
    assert m.apply(v, x).shape == (1, 32, 32, 31)


def test_edsr(golden, x):
    m = EDSR(n_resblocks=2, n_feats=16, n_colors=31)
    v = m.init(jax.random.PRNGKey(0), x)
    assert _n(v) == int(golden["edsr_params"])
    assert m.apply(v, x).shape == (1, 16, 16, 31)  # x2 internal scale


def test_gdrrn(golden, x):
    m = GDRNN(input_chnl_hsi=31, group=4)
    v = m.init(jax.random.PRNGKey(0), x)
    assert _n(v) == int(golden["gdrrn_params"])
    assert m.apply(v, x).shape == (1, 8, 8, 31)


def _forward_parity(name, model, model_hint, atol=2e-5):
    path = os.path.join(
        os.path.dirname(__file__), "golden", f"{name}_forward_golden.npz"
    )
    if not os.path.exists(path):
        pytest.skip(f"{name} forward golden not generated")
    from hsi_dmgasr_tpu.io.convert_torch import state_dict_to_flax

    g = np.load(path)
    sd = {k.split("::", 1)[1]: g[k] for k in g.files if k.startswith("sd::")}
    variables = state_dict_to_flax(sd, model=model_hint)
    xin = np.moveaxis(g["x"], 1, -1)
    y = model.apply(variables, xin)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(y), -1, 1), g["y"], atol=atol, rtol=1e-4
    )


def test_edsr_forward_weight_parity():
    _forward_parity("edsr", EDSR(n_resblocks=2, n_feats=16, n_colors=31),
                    "edsr")


def test_gdrrn_forward_weight_parity():
    """Covers the reference's inplace-relu aliasing semantics."""
    _forward_parity("gdrrn", GDRNN(input_chnl_hsi=31, group=4), None,
                    atol=5e-5)


def test_mcnet_forward_weight_parity():
    """Covers weight-norm g/v conversion incl. the ConvTranspose3d
    input-channel norm axis."""
    _forward_parity("mcnet", MCNet(scale=4, n_colors=31, n_feats=8), "mcnet")


def test_cegatsr_forward_weight_parity():
    """Covers the on-device kNN adjacency matching scipy cdist ranks,
    GAT conversion, and depthwise-conv layout."""
    from hsi_dmgasr_tpu.models.baselines import CEGATSR

    path = os.path.join(
        os.path.dirname(__file__), "golden", "cegatsr_forward_golden.npz"
    )
    if not os.path.exists(path):
        pytest.skip("cegatsr forward golden not generated")
    from hsi_dmgasr_tpu.io.convert_torch import state_dict_to_flax

    g = np.load(path)
    sd = {k.split("::", 1)[1]: g[k] for k in g.files if k.startswith("sd::")}
    variables = state_dict_to_flax(sd, model="cegatsr")
    m = CEGATSR(n_subs=8, n_ovls=2, in_feats=31, n_blocks=1, out_feats=16,
                n_scale=4)
    xin = np.moveaxis(g["x"], 1, -1)
    lms = np.moveaxis(g["lms"], 1, -1)
    y = m.apply(variables, xin, lms)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(y), -1, 1), g["y"], atol=2e-5, rtol=1e-4
    )


@pytest.mark.parametrize("scale", [2, 8])
def test_gelin_scale_variants(scale):
    """NGIM x2 (GAE/GELIN.py:182-205) and x8 (GELIN.py:153-165) deconv
    geometries."""
    m = GELIN(n_feats=16, n_colors=31, n_subs=8, n_ovls=2, blocks=1,
              scale=scale)
    x = np.random.RandomState(0).rand(1, 8, 8, 31).astype(np.float32)
    lms = np.random.RandomState(1).rand(1, 8 * scale, 8 * scale, 31).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), x, lms)
    assert m.apply(v, x, lms).shape == (1, 8 * scale, 8 * scale, 31)
