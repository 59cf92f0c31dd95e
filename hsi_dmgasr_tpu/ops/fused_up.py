"""Exact fusion of nearest-x2 upsample + 3x3 SAME conv (the SR3 UNet
up-path boundary, reference model/sr3_modules/unet.py:146-152).

``conv3x3(nearest_up2(x))`` never needs the upsampled tensor: because
nearest-x2 repeats each source pixel 2x2, every output pixel's 3x3
window covers only a 2x2 block of SOURCE pixels, with tap weights that
are sums of the original 3x3 taps. Per output phase (p, q) in {0,1}^2:

  rows: p=0 reads source rows (i-1, i) weighted (K[0], K[1]+K[2])
        p=1 reads source rows (i, i+1) weighted (K[0]+K[1], K[2])
  (columns identical with the kernel's second axis)

So the whole op is ONE VALID 2x2 conv over the once-padded source with
the four phase kernels stacked on the output channels, then a phase
interleave (pixel-shuffle reshape). vs the unfused path this cuts conv
FLOPs 9/4x and reads the source at 1x instead of writing+reading the
4x nearest-upsampled intermediate — the up-path boundary at 512^2 is
one of the last HBM-bound unfused ops in the sampler.

Exact math (not an approximation): parity-tested against
resize+conv in tests/test_fused_conv.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _compose_up2(kernel):
    """(3, 3, C, Cout) -> (4, 4, C, Cout): conv3x3 composed with
    nearest-x2 as a stride-2 transposed-conv kernel.

    nearest-x2 upsampling IS a transposed conv with a 2x2 kernel of
    ones; composing it with the 3x3 conv gives, along each spatial
    axis, the tap map [K0, K1, K2] -> [K0, K0+K1, K1+K2, K2].
    """

    def expand(k, axis):
        k0 = jax.lax.index_in_dim(k, 0, axis, keepdims=True)
        k1 = jax.lax.index_in_dim(k, 1, axis, keepdims=True)
        k2 = jax.lax.index_in_dim(k, 2, axis, keepdims=True)
        return jnp.concatenate([k0, k0 + k1, k1 + k2, k2], axis)

    return expand(expand(kernel, 0), 1)


def up2_conv3x3(x, kernel, bias=None):
    """nearest-x2 upsample then 3x3 SAME conv, as one dilated conv.

    x: (B, H, W, C); kernel: (3, 3, C, Cout) HWIO (the ORIGINAL conv3x3
    params); bias: (Cout,). Returns (B, 2H, 2W, Cout), the same math as
    ``conv3x3(jax.image.resize(x, nearest))`` up to float summation
    order.

    Lowering: one ``lhs_dilation=2`` convolution with the composed 4x4
    kernel — exactly the backward-data conv of a stride-2 conv, which
    XLA:TPU lowers to phase convolutions with the interleave fused into
    the output write. (A literal 4-phase conv + slice/stack/transpose
    assembly was measured 2-5x slower: the interleave relayout
    dominated.)
    """
    k4 = _compose_up2(kernel).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x, k4, (1, 1), ((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
