"""Extra ops for the baseline model zoo (NHWC / NDHWC).

torch-semantics equivalents needed by SSPSR/GELIN/MCNet/GDRRN:
ConvTranspose2d/3d, PReLU, AvgPool2d, Conv3d (with optional weight
normalization as in MCNet's ``wn`` wrapper), nearest resize, and a
jittable torch-style bicubic up-sampler (used inside model forwards,
e.g. SSPSR's global skip, SSPSR.py:124-130).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .blocks import torch_conv_init


class PReLU(nn.Module):
    """torch.nn.PReLU(n) — per-channel negative slope, init 0.25."""

    channels: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda k, s: jnp.full(s, 0.25, jnp.float32),
            (self.channels,),
        )
        return jnp.maximum(x, 0) + alpha.astype(x.dtype) * jnp.minimum(x, 0)


class Deconv2d(nn.Module):
    """torch.nn.ConvTranspose2d(in, out, k, stride, padding) in NHWC.

    out_size = (in-1)*stride - 2*padding + kernel. Param layout is HWIO
    (I=in, O=out) with torch's default init (fan_in = out*k*k for
    transposed convs).
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.stride, self.padding
        op = self.output_padding
        in_ch = x.shape[-1]
        fan_in = self.features * k * k  # torch uses weight.size(1)*k*k
        bound = 1.0 / math.sqrt(fan_in)
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                  -bound, bound),
            (k, k, in_ch, self.features),
        )
        # transpose_kernel=True reads the kernel as (spatial..., O, I) and
        # flips it — the gradient-of-conv convention torch uses; our param
        # stays (k, k, I=in, O=out) for clean checkpoint mapping.
        y = jax.lax.conv_transpose(
            x, kernel.astype(x.dtype).swapaxes(-2, -1),
            strides=(s, s),
            padding=[(k - 1 - p, k - 1 - p + op), (k - 1 - p, k - 1 - p + op)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            transpose_kernel=True,
        )
        if self.use_bias:
            bias = self.param("bias", torch_conv_init(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def avg_pool(x, window, stride=None):
    """torch.nn.AvgPool2d on NHWC."""
    stride = stride or window
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, window, window, 1), (1, stride, stride, 1), "VALID",
    ) / (window * window)


def resize_nearest(x, out_hw):
    """F.interpolate(mode='nearest') to an explicit (H, W)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="nearest")


def make_torch_bicubic_jax(in_hw, out_hw, align_corners=False):
    """Jittable torch-style bicubic resize for static shapes.

    Builds the dense per-axis interpolation matrices on host (a=-0.75
    cubic, edge clamp) and applies them as two einsums; matches
    F.interpolate(mode='bicubic', align_corners=...) to f32 eps.
    """
    from ..data.interp import _cubic_torch

    def axis_matrix(n_in, n_out):
        dst = np.arange(n_out, dtype=np.float64)
        if align_corners and n_out > 1:
            src = dst * (n_in - 1) / (n_out - 1)
        else:
            src = (dst + 0.5) * n_in / n_out - 0.5
        base = np.floor(src).astype(np.int64)
        frac = src - base
        mat = np.zeros((n_out, n_in))
        for kk in range(-1, 3):
            idx = np.clip(base + kk, 0, n_in - 1)
            w = _cubic_torch(frac - kk)
            np.add.at(mat, (np.arange(n_out), idx), w)
        return jnp.asarray(mat, jnp.float32)

    mh = axis_matrix(in_hw[0], out_hw[0])
    mw = axis_matrix(in_hw[1], out_hw[1])

    def f(x):
        y = jnp.einsum("oh,bhwc->bowc", mh.astype(x.dtype), x,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("pw,bowc->bopc", mw.astype(x.dtype), y,
                          precision=jax.lax.Precision.HIGHEST)

    return f


# ---------------------------------------------------------------------------
# 3-D convs (MCNet): NDHWC layout, optional weight normalization


def _wn_kernel(module, name, shape, fan_in, norm_axis=-1):
    """Weight-normalized kernel params: v (direction) + g (magnitude),
    matching torch.nn.utils.weight_norm over dim 0.

    torch's dim 0 is the OUTPUT channel for Conv (our last axis) but the
    INPUT channel for ConvTranspose (our -2 axis) — ``norm_axis`` selects
    which axis the per-channel norms are kept over.
    """
    bound = 1.0 / math.sqrt(fan_in)
    v = module.param(
        f"{name}_v",
        lambda key, s: jax.random.uniform(key, s, jnp.float32, -bound, bound),
        shape,
    )
    norm_axis = norm_axis % len(shape)
    axes = tuple(a for a in range(len(shape)) if a != norm_axis)
    init_norm = lambda key, s: jnp.sqrt(jnp.sum(v * v, axis=axes))
    g = module.param(f"{name}_g", init_norm, (shape[norm_axis],))
    norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True) + 1e-12)
    g_shape = [1] * len(shape)
    g_shape[norm_axis] = shape[norm_axis]
    return v / norm * g.reshape(g_shape)


class Conv3d(nn.Module):
    """torch.nn.Conv3d on NDHWC (D = spectral depth)."""

    features: int
    kernel_size: Sequence[int]  # (kd, kh, kw)
    stride: int = 1
    padding: Sequence[int] = None  # (pd, ph, pw); None -> k//2
    use_bias: bool = True
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        kd, kh, kw = self.kernel_size
        in_ch = x.shape[-1]
        fan_in = in_ch * kd * kh * kw
        shape = (kd, kh, kw, in_ch, self.features)
        if self.weight_norm:
            kernel = _wn_kernel(self, "kernel", shape, fan_in)
        else:
            bound = 1.0 / math.sqrt(fan_in)
            kernel = self.param(
                "kernel",
                lambda key, s: jax.random.uniform(key, s, jnp.float32,
                                                  -bound, bound),
                shape,
            )
        pad = self.padding
        if pad is None:
            pad = (kd // 2, kh // 2, kw // 2)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=(self.stride,) * 3,
            padding=[(p, p) for p in pad],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", torch_conv_init(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class Deconv3d(nn.Module):
    """torch.nn.ConvTranspose3d on NDHWC."""

    features: int
    kernel_size: Sequence[int]
    stride: Sequence[int]
    padding: Sequence[int]
    use_bias: bool = True
    weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        ks = tuple(self.kernel_size)
        st = tuple(self.stride)
        pd = tuple(self.padding)
        in_ch = x.shape[-1]
        fan_in = self.features * int(np.prod(ks))
        shape = ks + (in_ch, self.features)
        if self.weight_norm:
            # torch weight_norm dim 0 == INPUT channels for ConvTranspose
            kernel = _wn_kernel(self, "kernel", shape, fan_in, norm_axis=-2)
        else:
            bound = 1.0 / math.sqrt(fan_in)
            kernel = self.param(
                "kernel",
                lambda key, s: jax.random.uniform(key, s, jnp.float32,
                                                  -bound, bound),
                shape,
            )
        y = jax.lax.conv_transpose(
            x, kernel.astype(x.dtype).swapaxes(-2, -1),
            strides=st,
            padding=[(k - 1 - p, k - 1 - p) for k, p in zip(ks, pd)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            transpose_kernel=True,
        )
        if self.use_bias:
            bias = self.param("bias", torch_conv_init(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y
