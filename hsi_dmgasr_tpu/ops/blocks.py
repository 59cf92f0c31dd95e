"""Shared conv/attention building blocks (Flax, NHWC).

TPU-native rewrite of the reference op library (common.py:19-126 and the
SSPSR block family in AE.py:102-165):

  * All tensors are NHWC (channels-last) — the layout XLA tiles onto the
    MXU/VPU without transposes; the reference's NCHW appears only at
    torch-checkpoint conversion boundaries (io/convert_torch.py).
  * Parameter initialization matches torch.nn.Conv2d defaults
    (kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)) for both kernel and
    bias) so from-scratch training dynamics are comparable.
  * PixelShuffle is a reshape/transpose pair — free at the XLA level.

``Conv2d`` owns its kernel/bias params directly (paths ``.../kernel``,
``.../bias``), so converted torch state_dicts map 1:1 onto the flax param
tree (see io/convert_torch.py).
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(±1/sqrt(fan_in)) on an HWIO kernel — torch Conv2d default init."""
    h, w, i, _ = shape
    fan_in = max(h * w * i, 1)
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_init(fan_in):
    """Bias initializer paired with torch_conv_kernel_init."""
    bound = 1.0 / math.sqrt(max(fan_in, 1))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv2d(nn.Module):
    """Minimal NHWC conv with torch-compatible init and param layout.

    Equivalent of torch.nn.Conv2d(k, stride, padding=k//2*dilation) — the
    reference's ``default_conv`` (common.py:19-32). Param paths are
    ``{name}/kernel`` (HWIO) and ``{name}/bias``.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    dilation: int = 1
    padding: str | int | None = None  # None -> torch-style k//2 * dilation
    weight_norm: bool = False  # torch.nn.utils.weight_norm reparam

    @nn.compact
    def __call__(self, x, params_only=False):
        k = self.kernel_size
        in_ch = x.shape[-1]
        if self.weight_norm:
            from .extra import _wn_kernel

            kernel = _wn_kernel(
                self, "kernel", (k, k, in_ch, self.features), k * k * in_ch
            )
        else:
            kernel = self.param(
                "kernel", torch_conv_kernel_init, (k, k, in_ch, self.features)
            )
        if params_only:
            # fused-kernel path (kernels/fused_conv.py): hand back the
            # raw (kernel, bias) so the caller can run the conv itself
            bias = (self.param("bias", torch_conv_init(k * k * in_ch),
                               (self.features,))
                    if self.use_bias else None)
            return kernel, bias
        if self.padding is None:
            pad = (k // 2) * self.dilation
        else:
            pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        # mixed precision: follow the input's compute dtype (params may be
        # stored in bf16 for inference or f32 for training)
        if kernel.dtype != x.dtype:
            kernel = kernel.astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride, self.stride),
            padding=pad,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", torch_conv_init(k * k * in_ch), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class Dense(nn.Module):
    """torch.nn.Linear equivalent (param paths kernel/bias, torch init)."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param(
            "kernel",
            lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -1.0 / math.sqrt(in_f), 1.0 / math.sqrt(in_f)
            ),
            (in_f, self.features),
        )
        bias = self.param("bias", torch_conv_init(in_f), (self.features,))
        return x @ kernel + bias


def pixel_shuffle(x, r):
    """torch.nn.PixelShuffle semantics in NHWC.

    out[b, h*r+i, w*r+j, c] = x[b, h, w, c*r*r + i*r + j]
    """
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b h i w j c
    return x.reshape(b, h * r, w * r, c)


def leaky_relu(x):
    """LeakyReLU with torch's default negative_slope=0.01 (AE.py:192)."""
    return jax.nn.leaky_relu(x, negative_slope=0.01)


class CALayer(nn.Module):
    """Channel attention: GAP -> 1x1 squeeze/excite convs -> sigmoid gate.

    Matches common.py:35-51 (the SSPSR blocks instantiate it with
    reduction=3, common.py:88).
    """

    channel: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = Conv2d(self.channel // self.reduction, 1, name="conv_du0")(y)
        y = nn.relu(y)
        y = Conv2d(self.channel, 1, name="conv_du1")(y)
        y = nn.sigmoid(y)
        return x * y


class ResBlock(nn.Module):
    """conv-act-conv residual block with res_scale (common.py:54-73)."""

    n_feats: int
    kernel_size: int = 3
    act: Callable = nn.relu
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        res = Conv2d(self.n_feats, self.kernel_size, name="conv0")(x)
        res = self.act(res)
        res = Conv2d(self.n_feats, self.kernel_size, name="conv1")(res)
        return res * self.res_scale + x


class ResAttentionBlock(nn.Module):
    """ResBlock + channel-attention tail (common.py:76-97; the SSPSR
    family uses CALayer reduction=3, CEGATSR's variant uses 16)."""

    n_feats: int
    kernel_size: int = 3
    act: Callable = nn.relu
    res_scale: float = 1.0
    ca_reduction: int = 3

    @nn.compact
    def __call__(self, x):
        res = Conv2d(self.n_feats, self.kernel_size, name="conv0")(x)
        res = self.act(res)
        res = Conv2d(self.n_feats, self.kernel_size, name="conv1")(res)
        res = CALayer(self.n_feats, reduction=self.ca_reduction, name="ca")(res)
        return res * self.res_scale + x


class SSB(nn.Module):
    """Spatial-spectral block: 3x3 ResBlock then 1x1 ResAttentionBlock
    (AE.py:102-109)."""

    n_feats: int
    kernel_size: int = 3
    act: Callable = leaky_relu
    res_scale: float = 0.1
    ca_reduction: int = 3

    @nn.compact
    def __call__(self, x):
        x = ResBlock(self.n_feats, self.kernel_size, self.act, self.res_scale, name="spa")(x)
        x = ResAttentionBlock(self.n_feats, 1, self.act, self.res_scale,
                              ca_reduction=self.ca_reduction, name="spc")(x)
        return x


class SSPN(nn.Module):
    """n_blocks SSBs with a long skip (AE.py:120-141)."""

    n_feats: int
    n_blocks: int
    act: Callable = leaky_relu
    res_scale: float = 0.1
    ca_reduction: int = 3

    @nn.compact
    def __call__(self, x):
        res = x
        for i in range(self.n_blocks):
            res = SSB(self.n_feats, 3, self.act, self.res_scale,
                      ca_reduction=self.ca_reduction, name=f"net_{i}")(res)
        return res + x


class Upsampler(nn.Module):
    """PixelShuffle upsampling chain for scale 2^n or 3 (common.py:100-126).

    scale == 1 is the identity (zero shuffle stages), matching the
    reference's ``int(math.log(1, 2)) == 0`` loop count.
    """

    scale: int
    n_feats: int

    @nn.compact
    def __call__(self, x):
        s = self.scale
        if s == 1:
            return x
        if (s & (s - 1)) == 0:
            for i in range(int(math.log2(s))):
                x = Conv2d(4 * self.n_feats, 3, name=f"conv_{i}")(x)
                x = pixel_shuffle(x, 2)
            return x
        if s == 3:
            x = Conv2d(9 * self.n_feats, 3, name="conv_0")(x)
            return pixel_shuffle(x, 3)
        raise NotImplementedError(f"Upsampler scale {s}")


class BranchUnit(nn.Module):
    """head conv -> SSPN -> Upsampler -> optional tail (AE.py:145-165)."""

    n_colors: int
    n_feats: int
    n_blocks: int
    act: Callable = leaky_relu
    res_scale: float = 0.1
    up_scale: int = 1
    use_tail: bool = True

    @nn.compact
    def __call__(self, x):
        y = Conv2d(self.n_feats, 3, name="head")(x)
        y = SSPN(self.n_feats, self.n_blocks, self.act, self.res_scale, name="body")(y)
        y = Upsampler(self.up_scale, self.n_feats, name="upsample")(y)
        if self.use_tail:
            y = Conv2d(self.n_colors, 3, name="tail")(y)
        return y
