"""GAE variant coverage: trunkless (AE_duichen), ungrouped AE, encoder-only,
PostGAE, toy AE, random_mask."""

import jax
import jax.numpy as jnp
import numpy as np

from hsi_dmgasr_tpu.models import (
    AE,
    GAE,
    PostGAE,
    SREncoder,
    random_mask,
)
from hsi_dmgasr_tpu.models.gae import ToyAutoencoder


def test_gae_trunkless_is_plain_overlap_average():
    """use_trunk=False == AE_duichen (AE.py:433-513): decode is the bare
    overlap-average with no residual refinement."""
    m = GAE(n_subs=8, n_ovls=2, n_colors=31, n_feats=8, use_trunk=False)
    x = np.random.RandomState(0).rand(1, 16, 16, 31).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    # no trunk/final params
    assert "trunk" not in v["params"] and "final" not in v["params"]
    recon, z = m.apply(v, x)
    assert recon.shape == x.shape

    # decode == scatter-average of decoder outputs (verified by linearity:
    # zero latents -> decoder(0) pattern averaged, no extra residual path)
    z0 = jnp.zeros_like(z)
    y0 = m.apply(v, z0, method=GAE.decode)
    dec0 = m.apply(
        v, z0.reshape(-1, 16, 16, 3),
        method=lambda mdl, t: mdl.decoder(t),
    )
    # middle bands covered by exactly one group must equal decoder output
    np.testing.assert_allclose(
        np.asarray(y0[0, :, :, 1]), np.asarray(dec0[0, :, :, 1]), atol=1e-6
    )


def test_ungrouped_ae_roundtrip():
    m = AE(in_channels=31, n_feats=8)
    x = np.random.RandomState(0).rand(1, 16, 16, 31).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    recon, z = m.apply(v, x)
    assert recon.shape == x.shape
    assert z.shape == (1, 16, 16, 3)


def test_sr_encoder_only():
    m = SREncoder(n_subs=8, n_ovls=2, n_colors=31, n_feats=8)
    x = np.random.RandomState(0).rand(1, 16, 16, 31).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    z = m.apply(v, x)
    assert z.shape == (1, 5, 16, 16, 3)


def test_post_gae_and_toy_ae():
    x = np.random.RandomState(0).rand(1, 16, 16, 31).astype(np.float32)
    pg = PostGAE(n_colors=31)
    v = pg.init(jax.random.PRNGKey(0), x)
    assert pg.apply(v, x).shape == x.shape

    toy = ToyAutoencoder(in_channels=33)
    xt = np.random.RandomState(1).rand(1, 16, 16, 33).astype(np.float32)
    vt = toy.init(jax.random.PRNGKey(0), xt)
    y, z = toy.apply(vt, xt)
    assert y.shape == xt.shape and z.shape == (1, 4, 4, 3)


def test_random_mask_fraction():
    x = jnp.ones((64, 64))
    m = random_mask(jax.random.PRNGKey(0), x, p=0.3)
    frac = float((np.asarray(m) == 0).mean())
    assert 0.2 < frac < 0.4