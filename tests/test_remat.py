"""UNet gradient rematerialization: identical math, trainable."""

import jax
import jax.numpy as jnp
import numpy as np

from hsi_dmgasr_tpu.models.unet import UNet


def _cfg(remat):
    return UNet(in_channel=6, out_channel=3, inner_channel=8, norm_groups=4,
                channel_mults=(1, 2), attn_res=(8,), res_blocks=1,
                image_size=16, remat=remat)


def test_remat_same_function():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 6), jnp.float32)
    t = jnp.zeros((1, 1))
    v = _cfg(False).init(jax.random.PRNGKey(0), x, t)
    o1 = _cfg(False).apply(v, x, t)
    o2 = _cfg(True).apply(v, x, t)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-6)


def test_remat_gradients():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 6), jnp.float32)
    t = jnp.zeros((1, 1))
    net = _cfg(True)
    v = net.init(jax.random.PRNGKey(0), x, t)

    def loss(p):
        return (net.apply({"params": p}, x, t) ** 2).sum()

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # gradients should match the non-remat path
    net0 = _cfg(False)

    def loss0(p):
        return (net0.apply({"params": p}, x, t) ** 2).sum()

    g0 = jax.grad(loss0)(v["params"])
    for a, b in zip(leaves, jax.tree.leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-3)