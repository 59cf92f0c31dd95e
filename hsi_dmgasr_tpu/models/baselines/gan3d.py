"""3-D attention GAN baseline (reference GAE/net.py — GAN-HSI-SR).

Generator: 3-D conv stem, three band-attention blocks (3-D convs +
spectral squeeze-excite over the band axis), two bicubic x2 stages with
3-D conv refinement. Discriminator: strided 3-D conv pyramid with
BatchNorm + global pool + MLP head. ``spe_loss_gan`` vectorizes the
reference's per-pixel double loop (net.py:244-262) into one reduction.

Layout: torch (B, C, L, H, W) with L = bands maps to NDHWC (D = bands).
Kernel (5,3,3) with padding (2,1,1) throughout (net.py:19-20).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.extra import Conv3d, make_torch_bicubic_jax

_K = (5, 3, 3)
_P = (2, 1, 1)


def lrelu(x):
    return jax.nn.leaky_relu(x, 0.01)


class BandAttention(nn.Module):
    """Band attention (net.py:23-72): two 3-D convs, band-pooled
    squeeze-excite MLP over the L axis, residual."""

    n_bands: int = 31

    @nn.compact
    def __call__(self, x):
        x1 = lrelu(Conv3d(32, _K, padding=_P, name="conv1a")(x))
        x1 = lrelu(Conv3d(32, _K, padding=_P, name="conv1b")(x1))
        # AdaptiveAvgPool3d((L,1,1)): mean over H,W keeps the band axis
        x2 = jnp.mean(x1, axis=(2, 3))  # (B, L, C)
        w = nn.Dense(8, use_bias=False, name="fc0")(x2.swapaxes(1, 2))
        w = lrelu(w)
        w = nn.Dense(self.n_bands, use_bias=False, name="fc1")(w)
        w = nn.sigmoid(w)  # (B, C, L)
        gate = w.swapaxes(1, 2)[:, :, None, None, :]  # (B, L, 1, 1, C)
        return x + x1 * gate


class Generator(nn.Module):
    """x4 generator (net.py:75-131); input (B, h, w, L) -> (B, 4h, 4w, L)."""

    n_bands: int = 31

    @nn.compact
    def __call__(self, x):
        b, h, w, L = x.shape
        v = jnp.moveaxis(x, -1, 1)[..., None]  # (B, L, H, W, 1)
        x1 = lrelu(Conv3d(32, _K, padding=_P, name="conv1")(v))
        x2 = BandAttention(self.n_bands, name="attn1")(x1)
        x2 = BandAttention(self.n_bands, name="attn2")(x2)
        x2 = BandAttention(self.n_bands, name="attn3")(x2)
        x2 = lrelu(Conv3d(32, _K, padding=_P, name="conv2")(x2))
        x3 = x2 + x1
        x4 = Conv3d(1, _K, padding=_P, name="conv3")(x3)[..., 0]  # (B,L,H,W)

        conv4 = Conv3d(1, _K, padding=_P, name="conv4")

        def up2(t, hw):
            # torch treats (B, L, H, W) as NCHW for the bicubic x2
            up = make_torch_bicubic_jax(hw, (hw[0] * 2, hw[1] * 2))
            return up(jnp.moveaxis(t, 1, -1))  # (B, H', W', L) -> back below

        t = up2(x4, (h, w))
        t = jnp.moveaxis(t, -1, 1)[..., None]
        t = lrelu(conv4(t))[..., 0]
        t = up2(t, (h * 2, w * 2))
        t = jnp.moveaxis(t, -1, 1)[..., None]
        t = lrelu(conv4(t))
        t = lrelu(conv4(t[..., 0][..., None]))
        y = Conv3d(1, _K, padding=_P, name="conv5")(t)[..., 0]
        return jnp.moveaxis(y, 1, -1)  # (B, 4h, 4w, L)


class Discriminator(nn.Module):
    """3-D conv pyramid + MLP head (net.py:134-185)."""

    @nn.compact
    def __call__(self, x, train=False):
        v = jnp.moveaxis(x, -1, 1)[..., None]  # (B, L, H, W, 1)

        def bn(z, name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, name=name)(z)

        y = lrelu(Conv3d(32, _K, padding=_P, name="c1")(v))
        # one-sided pad ((1,2),(1,0),(1,0)) with value 1, stride-2 conv
        y = jnp.pad(y, ((0, 0), (1, 2), (1, 0), (1, 0), (0, 0)),
                    constant_values=1.0)
        y = lrelu(bn(Conv3d(32, _K, stride=2, padding=(0, 0, 0), name="c2")(y), "b2"))
        y = lrelu(bn(Conv3d(64, _K, padding=_P, name="c3")(y), "b3"))
        y = jnp.pad(y, ((0, 0), (1, 2), (1, 0), (1, 0), (0, 0)),
                    constant_values=1.0)
        y = lrelu(bn(Conv3d(64, _K, stride=2, padding=(0, 0, 0), name="c4")(y), "b4"))
        y = lrelu(bn(Conv3d(128, _K, padding=_P, name="c5")(y), "b5"))
        y = lrelu(bn(Conv3d(128, _K, padding=_P, name="c6")(y), "b6"))
        y = jnp.mean(y, axis=(1, 2, 3))  # global pool -> (B, 128)
        y = lrelu(nn.Dense(256, name="fc0")(y))
        return nn.sigmoid(nn.Dense(1, name="fc1")(y))


def spe_loss_gan(x, y):
    """Per-pixel spectral angle mean (net.py:244-262), vectorized.

    x, y: (B, H, W, L). The reference loops every pixel and sums
    acos(<x,y>/(|x||y|)) over the batch-band inner product; here it is
    one fused reduction."""
    fz = jnp.sum(x * y, axis=(0, 3))
    fm = jnp.sqrt(jnp.sum(x * x, axis=(0, 3))) * jnp.sqrt(
        jnp.sum(y * y, axis=(0, 3))
    )
    ang = jnp.arccos(jnp.clip(fz / jnp.maximum(fm, 1e-12), -1.0, 1.0))
    return jnp.mean(ang)


def ragan_d_loss(d_real, d_fake):
    """Relativistic average GAN discriminator loss (GAE/train.py:84-199)."""
    real_rel = nn.sigmoid(d_real - jnp.mean(d_fake))
    fake_rel = nn.sigmoid(d_fake - jnp.mean(d_real))
    eps = 1e-8
    return -jnp.mean(jnp.log(real_rel + eps)) - jnp.mean(
        jnp.log(1.0 - fake_rel + eps)
    )


def ragan_g_loss(d_real, d_fake):
    real_rel = nn.sigmoid(d_real - jnp.mean(d_fake))
    fake_rel = nn.sigmoid(d_fake - jnp.mean(d_real))
    eps = 1e-8
    return -jnp.mean(jnp.log(fake_rel + eps)) - jnp.mean(
        jnp.log(1.0 - real_rel + eps)
    )
