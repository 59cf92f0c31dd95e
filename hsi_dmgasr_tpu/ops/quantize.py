"""DAQ distribution-aware quantization (reference quantize.py).

Activation quantizer (quantize.py:25-117): per-(batch,channel) spatial
mean/std drive a Gaussian-optimal step size; activations are rounded to
2^a_bit levels with a straight-through estimator. The post-ReLU branch
(x.min()==0) estimates stats over positive pixels only and centers at
the clipping threshold. Optional second-level quantization of the step
sigmas (qq_bit).

Weight quantizer (quantize.py:122-167): whole-tensor std, symmetric
rounding, straight-through. Both compose into the DAQ res-blocks
(common.py:273-342) via the ``a_bit/w_bit`` flags on our SSB/ResBlock
construction (ops/blocks.py usage in models).

Straight-through is ``quantized.detach() + x - x.detach()`` in torch ==
``x + stop_gradient(quantized - x)`` here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import Conv2d, torch_conv_kernel_init

gaussian_steps = {0: 2.0, 1: 1.596, 2: 0.996, 3: 0.586, 4: 0.335, 5: 0.188,
                  6: 0.104, 7: 0.057, 8: 0.031, 15: 1 / 8, 16: 1 / 8}


def _ste(x, q):
    """Straight-through estimator."""
    return x + jax.lax.stop_gradient(q - x)


def _round_sym(c, step, thr):
    """Symmetric mid-rise rounding with zero-step guard
    (quantize.py:74-80 pattern)."""
    safe_step = jnp.where(step == 0, -1.0, step)
    y = (jnp.round(c / safe_step + 0.5) - 0.5) * safe_step * (safe_step > 0)
    return jnp.clip(y, -thr, thr)


def quantize_weights(w, w_bit, finetune=False):
    """DAQ weight quantization (quantize.py:139-167); NHWC/HWIO layout
    irrelevant (whole-tensor std)."""
    if w_bit >= 32:
        return w
    step0 = 1.596 if finetune else gaussian_steps[w_bit - 1]
    sigma = jnp.std(w)
    step = step0 * sigma
    lvls = 2 ** w_bit / 2
    thr = (lvls - 0.5) * step
    q = _round_sym(w, step, thr)
    return _ste(w, q)


class Quantization(nn.Module):
    """DAQ activation quantization (quantize.py:25-117); input NHWC.

    Spatial statistics are over (H, W) per batch/channel — torch dims
    (2,3) map to axes (1,2) here.
    """

    bit: int
    qq_bit: int = 32
    finetune: bool = False

    def _steps(self):
        if self.finetune:
            return 1.596, 0.057
        return (
            gaussian_steps[self.bit - 1],
            gaussian_steps.get(self.qq_bit - 1, 1 / 8),
        )

    def _quantize_sigma(self, sigma, sig_step0):
        """Second-level sigma quantization (quantize.py:51-66)."""
        mu_sigma = jax.lax.stop_gradient(jnp.mean(sigma, axis=3, keepdims=True))
        sig_sigma = jax.lax.stop_gradient(jnp.std(sigma, axis=3, keepdims=True))
        step = sig_step0 * sig_sigma
        thr = (2 ** self.qq_bit / 2 - 0.5) * step
        y = _round_sym(sigma - mu_sigma, step, thr)
        return y + mu_sigma

    @nn.compact
    def __call__(self, x):
        if self.bit >= 32:
            return x
        step0, sig_step0 = self._steps()
        post_relu = jnp.min(x) == 0

        def relu_branch(x):
            x_num = jnp.sum(x > 0, axis=(1, 2), keepdims=True) + 1.0
            mu = jnp.sum(x, axis=(1, 2), keepdims=True) / x_num
            x2 = jnp.sum(x ** 2, axis=(1, 2), keepdims=True) / x_num
            sigma = jnp.sqrt(jnp.maximum(x2 - mu ** 2, 0.0))
            sigma = jax.lax.stop_gradient(sigma)
            if self.qq_bit != 32:
                sigma = self._quantize_sigma(sigma, sig_step0)
            lvls = 2 ** self.bit / 2
            step = step0 * sigma
            thr = (lvls - 0.5) * step
            safe_step = jnp.where(step == 0, -1.0, step)
            xc = x - thr
            y = (jnp.round(xc / safe_step + 0.5) - 0.5) * safe_step
            y = y * (safe_step > 0)
            return y + thr

        def sym_branch(x):
            mu = jax.lax.stop_gradient(jnp.mean(x, axis=(1, 2), keepdims=True))
            sigma = jax.lax.stop_gradient(jnp.std(x, axis=(1, 2), keepdims=True))
            if self.qq_bit != 32:
                sigma = self._quantize_sigma(sigma, sig_step0)
            lvls = 2 ** self.bit / 2
            step = step0 * sigma
            thr = (lvls - 0.5) * step
            y = _round_sym(x - mu, step, thr)
            return y + mu

        q = jax.lax.cond(post_relu, relu_branch, sym_branch, x)
        return _ste(x, q)


class Conv2dQ(nn.Module):
    """Weight-quantized conv (quantize.py:122-167 Conv2d_Q)."""

    features: int
    kernel_size: int = 3
    w_bit: int = 32
    finetune: bool = False
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", torch_conv_kernel_init, (k, k, in_ch, self.features)
        )
        wq = quantize_weights(kernel, self.w_bit, self.finetune)
        y = jax.lax.conv_general_dilated(
            x, wq.astype(x.dtype), (1, 1),
            [(k // 2, k // 2), (k // 2, k // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", lambda key, s: jnp.zeros(s), (self.features,)
            )
            y = y + bias
        return y


class ResBlockDAQ(nn.Module):
    """DAQ residual block (common.py:273-305)."""

    n_feats: int
    kernel_size: int = 3
    a_bit: int = 32
    w_bit: int = 32
    qq_bit: int = 32
    finetune: bool = False
    res_scale: float = 1.0
    act: any = nn.relu

    @nn.compact
    def __call__(self, x):
        out = x
        if self.a_bit != 32:
            out = Quantization(self.a_bit, self.qq_bit, self.finetune,
                               name="quant1")(out)
        conv = Conv2dQ if self.w_bit != 32 else Conv2d
        kw = (dict(w_bit=self.w_bit, finetune=self.finetune)
              if self.w_bit != 32 else {})
        out = conv(self.n_feats, self.kernel_size, name="conv1", **kw)(out)
        out1 = self.act(out)
        if self.a_bit != 32:
            out1 = Quantization(self.a_bit, self.qq_bit, self.finetune,
                                name="quant2")(out1)
        res = conv(self.n_feats, self.kernel_size, name="conv2", **kw)(out1)
        return res * self.res_scale + x


class SSBDAQ(nn.Module):
    """Quantized spatial-spectral block (AE.py:111-118 SSB_DAQ) — the
    commented-in alternative for SSPN (AE.py:127-132, the 'GAEDAQ'
    experiments)."""

    n_feats: int
    a_bit: int = 4
    w_bit: int = 4
    qq_bit: int = 32
    finetune: bool = False
    res_scale: float = 0.1
    act: any = nn.relu

    @nn.compact
    def __call__(self, x):
        x = ResBlockDAQ(
            self.n_feats, 3, self.a_bit, self.w_bit, self.qq_bit,
            self.finetune, self.res_scale, self.act, name="spa",
        )(x)
        return ResAttentionBlockDAQ(
            self.n_feats, 1, self.a_bit, self.w_bit, self.qq_bit,
            self.finetune, self.res_scale, self.act, name="spc",
        )(x)


class ResAttentionBlockDAQ(nn.Module):
    """DAQ residual attention block (common.py:308-342)."""

    n_feats: int
    kernel_size: int = 3
    a_bit: int = 32
    w_bit: int = 32
    qq_bit: int = 32
    finetune: bool = False
    res_scale: float = 1.0
    act: any = nn.relu

    @nn.compact
    def __call__(self, x):
        from .blocks import CALayer

        out = x
        if self.a_bit != 32:
            out = Quantization(self.a_bit, self.qq_bit, self.finetune,
                               name="quant1")(out)
        conv = Conv2dQ if self.w_bit != 32 else Conv2d
        kw = (dict(w_bit=self.w_bit, finetune=self.finetune)
              if self.w_bit != 32 else {})
        out = conv(self.n_feats, self.kernel_size, name="conv1", **kw)(out)
        out1 = self.act(out)
        if self.a_bit != 32:
            out1 = Quantization(self.a_bit, self.qq_bit, self.finetune,
                                name="quant2")(out1)
        res = conv(self.n_feats, self.kernel_size, name="conv2", **kw)(out1)
        res = CALayer(self.n_feats, reduction=3, name="attn")(res)
        return res * self.res_scale + x
