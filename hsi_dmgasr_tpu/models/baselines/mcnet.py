"""MCNet baseline (reference GAE/MCNet.py).

Mixed 2D/3D conv SR network with weight normalization: the HSI cube is
treated as a 3-D volume (depth = spectral bands, 1 input channel), four
SSRM blocks mix separable 3-D convs with 2-D convs applied by folding
the depth axis into the batch, and a ConvTranspose3d tail upsamples
spatially.

Layout: torch NCDHW (C=feats) maps to NDHWC here; the 2-D fold
(_to_4d_tensor, GAE/MCNet.py:33-54) becomes a plain reshape.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ...ops.blocks import Conv2d
from ...ops.extra import Conv3d, Deconv3d


class S3Dblock(nn.Module):
    """(1,3,3) then (3,1,1) weight-normed convs + relu (MCNet.py:20-30)."""

    n_feats: int

    @nn.compact
    def __call__(self, x):
        x = Conv3d(self.n_feats, (1, 3, 3), padding=(0, 1, 1),
                   weight_norm=True, name="c0")(x)
        x = nn.relu(x)
        x = Conv3d(self.n_feats, (3, 1, 1), padding=(1, 0, 0),
                   weight_norm=True, name="c1")(x)
        return nn.relu(x)


class WNConv2dPair(nn.Module):
    """conv-relu-conv on the depth-folded tensor (MCNet.py:84-100)."""

    n_feats: int

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        y = x.reshape(b * d, h, w, c)
        y = Conv2d(self.n_feats, 3, weight_norm=True, name="c0")(y)
        y = nn.relu(y)
        y = Conv2d(self.n_feats, 3, weight_norm=True, name="c1")(y)
        return y.reshape(b, d, h, w, c)


class SSRMBlock(nn.Module):
    """MCNet Block (GAE/MCNet.py:57-128)."""

    n_feats: int
    n_conv: int = 1

    @nn.compact
    def __call__(self, x):
        res = x

        def stack(name, inp):
            y = inp
            for i in range(self.n_conv):
                y = S3Dblock(self.n_feats, name=f"{name}_{i}")(y)
            return y

        x1 = stack("block1", x) + x
        x2 = stack("block2", x1) + x1
        x3 = stack("block3", x2) + x2

        x1 = WNConv2dPair(self.n_feats, name="conv1")(x1)
        x2 = WNConv2dPair(self.n_feats, name="conv2")(x2)
        x3 = WNConv2dPair(self.n_feats, name="conv3")(x3)

        gamma = self.param(
            "gamma", lambda k, s: jnp.ones(s, jnp.float32), (3,)
        )
        y = jnp.concatenate(
            [gamma[0] * x1, gamma[1] * x2, gamma[2] * x3], axis=-1
        )
        y = Conv3d(self.n_feats, (1, 1, 1), padding=(0, 0, 0),
                   weight_norm=True, name="reduceF")(y)
        y = nn.relu(y)
        y = y + res
        return S3Dblock(self.n_feats, name="conv_out")(y)


class MCNet(nn.Module):
    scale: int = 4
    n_colors: int = 31
    n_feats: int = 32
    n_conv: int = 1

    @nn.compact
    def __call__(self, x):
        """x: (B, h, w, C) LR cube -> (B, h*scale, w*scale, C)."""
        # NHWC cube -> NDHWC volume with 1 channel (depth = bands)
        v = jnp.moveaxis(x, -1, 1)[..., None]
        t = Conv3d(self.n_feats, (3, 3, 3), weight_norm=True, name="head")(v)
        y = t
        for i in range(4):
            y = SSRMBlock(self.n_feats, self.n_conv, name=f"ssrm_{i}")(y) + t
        s = self.scale
        y = Deconv3d(
            self.n_feats, (3, 2 + s, 2 + s), (1, s, s), (1, 1, 1),
            weight_norm=True, name="tail_up",
        )(y)
        y = Conv3d(1, (3, 3, 3), weight_norm=True, name="tail_conv")(y)
        return jnp.moveaxis(y[..., 0], 1, -1)
