"""Pallas flash-attention kernel: numerical parity vs the XLA path.

Runs in interpreter mode on CPU (same kernel code the TPU compiles);
covers padding (S not a multiple of the block), multi-head, and scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from hsi_dmgasr_tpu.kernels.attention import _xla_attention
from hsi_dmgasr_tpu.kernels.flash_attention import flash_attention


@pytest.mark.parametrize("s,h,d", [(300, 1, 64), (256, 2, 32), (1000, 1, 128)])
def test_flash_matches_xla(s, h, d):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, s, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(2, s, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(2, s, h, d), jnp.float32)
    scale = 1.0 / np.sqrt(h * d)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(flash_attention(q, k, v, scale))
    ref = np.asarray(_xla_attention(q, k, v, scale)).reshape(2, s, h, d)
    np.testing.assert_allclose(out, ref, atol=2e-5)
