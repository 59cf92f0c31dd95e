"""GDRRN baseline (reference GAE/models_GDRRN.py:168-201).

Grouped deep recursive residual network: 9 recursions of a SHARED
grouped conv pair with a persistent skip to the input features. Grouped
convs map to lax feature_group_count.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


class GroupedConv(nn.Module):
    """Bias-free grouped 3x3 conv with the reference's He-normal init
    (std = sqrt(2 / (k*k*out)), GAE/models_GDRRN.py:181-184)."""

    features: int
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        std = math.sqrt(2.0 / (9 * self.features))
        kernel = self.param(
            "kernel",
            lambda k, s: std * jax.random.normal(k, s, jnp.float32),
            (3, 3, in_ch // self.groups, self.features),
        )
        return jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )


class GDRNN(nn.Module):
    input_chnl_hsi: int
    group: int = 1
    num_chnl: int = 128
    recursions: int = 9

    @nn.compact
    def __call__(self, x):
        conv_in = GroupedConv(self.num_chnl, 1, name="input")
        conv1 = GroupedConv(self.num_chnl, self.group, name="conv1")
        conv2 = GroupedConv(self.num_chnl, self.group, name="conv2")
        conv_out = GroupedConv(self.input_chnl_hsi, 1, name="output")

        # the reference uses nn.ReLU(inplace=True), so its in-place relus
        # ALIAS earlier tensors (GAE/models_GDRRN.py:186-201):
        #   * `residual = x` is mutated to relu(x) by the first relu;
        #   * `inputs` aliases `out` in recursion 0, so the skip source
        #     becomes relu(inputs) from then on.
        # Replicated functionally:
        xr = nn.relu(x)
        residual = xr
        inputs = conv_in(xr)
        out = inputs
        for i in range(self.recursions):
            r = nn.relu(out)
            if i == 0:
                inputs = r
            out = conv2(nn.relu(conv1(r)))
            out = out + inputs
        out = conv_out(nn.relu(out))
        return out + residual
