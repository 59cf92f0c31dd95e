"""Fused GroupNorm -> Swish -> 3x3 Conv Pallas kernel (the UNet Block).

Why: the sampler is HBM-bound and XLA's spatial convolution at the
flagship's hot shapes (512^2 @ 64ch bf16) runs ~5x slower than a
same-footprint copy (tools/microbench_tpu.py). This kernel computes the
reference Block -- GroupNorm(32) -> swish -> conv3x3 (+bias, optional
per-batch time-embedding bias, optional residual add; reference
model/sr3_modules/unet.py:80-111) -- in two HBM passes over the
activation instead of XLA's five:

  1. group stats (mean/rstd) via one XLA reduction read, folded into
     per-(batch, channel) scale/shift vectors;
  2. one Pallas pass per row-slab: the slab plus two 1-row halo blocks
     (clamped index maps; out-of-image halos masked to zero) are
     norm+swish'ed in f32, assembled along the row axis, dx-shifted via
     pltpu.roll with edge-column masks (the conv's SAME zero padding --
     applied AFTER the activation, as in the unfused path), and fed to
     9 MXU matmuls (one per kernel tap) accumulating in f32; the
     epilogue adds bias / time-bias / residual and writes bf16.

Layout notes: Mosaic cannot concat or reshape sublane-misaligned
slices and rotates only 32-bit data, hence the f32 roll + mask
formulation; halos come in as separate 1-row grid blocks because
overlapping windows are not expressible in a BlockSpec and manual HBM
DMA requires 128-aligned minor dims (C is 64 here).

Numerics: prologue in f32, matmul bf16 x bf16 -> f32 accumulate -- the
same precision story as the unfused bf16 path (tests/test_fused_conv.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad128(c):
    return ((c + 127) // 128) * 128


def _pick_rows(h, w, c, cout, vmem_budget=13 * 1024 * 1024):
    """Largest divisor-of-H row-slab whose (lane-padded) VMEM working
    set fits the budget."""
    per_row = (
        w * _pad128(c) * 4              # full f32 slab
        + w * _pad128(c) * 4            # rolled-tap f32 temp
        + 3 * w * _pad128(c) * 2        # bf16 taps
        + w * _pad128(3 * c) * 2        # im2col slice (bf16)
        + w * _pad128(cout) * 4         # f32 accumulator
        + 2 * w * _pad128(c) * 2        # double-buffered input block
        + 2 * w * _pad128(cout) * 2     # double-buffered out block
    )
    limit = min(max(1, vmem_budget // max(per_row, 1)), h, 64)
    rows = 1
    for d in range(1, limit + 1):
        if h % d == 0:
            rows = d
    return rows


def _kernel(xc_ref, xp_ref, xn_ref, scale_ref, shift_ref, kmat_ref,
            bias_ref, tb_ref, res_ref, o_ref, *, rows, H, W, C, Cout,
            has_tb, has_res):
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)

    sc = scale_ref[b][None, None, :]
    sh = shift_ref[b][None, None, :]

    def actf(v):
        a = v.astype(jnp.float32) * sc + sh
        return a * jax.nn.sigmoid(a)

    cur = actf(xc_ref[...])                     # (rows, W, C)
    prev = actf(xp_ref[...])                    # (1, W, C) halo above
    nxt = actf(xn_ref[...])                     # (1, W, C) halo below
    # clamped halo index maps re-read an in-image row at the edges;
    # zero them so the conv sees SAME zero padding
    prev = jnp.where(i > 0, prev, 0.0)
    nxt = jnp.where(i < nb - 1, nxt, 0.0)
    full = jnp.concatenate([prev, cur, nxt], axis=0)  # (rows+2, W, C)

    # dx = -1 / +1 taps: rotate so every operand starts at column 0,
    # masking the wrapped-around edge column (rotate is f32-only)
    col = jax.lax.broadcasted_iota(jnp.int32, full.shape, 1)
    left = jnp.where(col == 0, 0.0, pltpu.roll(full, 1, axis=1))
    right = jnp.where(col == W - 1, 0.0, pltpu.roll(full, W - 1, axis=1))
    taps = [left, full, right]                  # tap dx reads col w+dx-1

    # one matmul per dx with K = 3C: the dy taps are row-shifted slices
    # (major-dim offsets — concat-safe) stacked along the channel axis
    acc = jnp.zeros((rows * W, Cout), jnp.float32)
    for dx in range(3):
        t = taps[dx].astype(jnp.bfloat16)
        cols = jnp.concatenate(
            [t[0:rows], t[1:rows + 1], t[2:rows + 2]], axis=-1
        ).reshape(rows * W, 3 * C)
        acc += jnp.dot(cols, kmat_ref[dx],
                       preferred_element_type=jnp.float32)

    acc += bias_ref[0][None, :]
    if has_tb:
        # tb is f32: dynamic per-batch row loads on packed bf16 sublanes
        # are not supported by Mosaic
        acc += tb_ref[b][None, :]
    out = acc.reshape(rows, W, Cout)
    if has_res:
        out = out + res_ref[...].astype(jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "eps", "interpret", "rows"),
)
def gn_swish_conv3x3(x, gn_scale, gn_bias, kernel, bias, time_bias=None,
                     residual=None, num_groups=32, eps=1e-5,
                     interpret=False, rows=None):
    """Fused GroupNorm(num_groups) -> swish -> conv3x3(SAME) [+ extras].

    x: (B, H, W, C); gn_scale, gn_bias: (C,); kernel: (3, 3, C, Cout)
    HWIO; bias: (Cout,); time_bias: optional (B, Cout) added to the conv
    output (the SR3 FeatureWiseAffine shift, sr3_modules/unet.py:34-50);
    residual: optional (B, H, W, Cout) added before the write.
    Returns (B, H, W, Cout) in x.dtype.
    """
    B, H, W, C = x.shape
    Cout = kernel.shape[-1]
    G = num_groups

    # ---- pass 1: group stats -> per-(b, c) scale/shift (one XLA read)
    xg = x.reshape(B, H * W, G, C // G).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(1, 3))                        # (B, G)
    var = jnp.mean(jnp.square(xg), axis=(1, 3)) - mean ** 2
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(mean, C // G, axis=1)               # (B, C)
    rstd_c = jnp.repeat(rstd, C // G, axis=1)
    scale = rstd_c * gn_scale[None, :].astype(jnp.float32)
    shift = gn_bias[None, :].astype(jnp.float32) - mean_c * scale

    # (3, 3, C, Cout) -> (dx, dy*C + c, Cout): matches the kernel's
    # concat-over-dy im2col ordering
    kmat = jnp.transpose(kernel, (1, 0, 2, 3)).astype(
        jnp.bfloat16
    ).reshape(3, 3 * C, Cout)
    bias_f = bias.astype(jnp.float32).reshape(1, Cout)

    has_tb = time_bias is not None
    has_res = residual is not None
    tb = (time_bias.astype(jnp.float32) if has_tb
          else jnp.zeros((B, 1), jnp.float32))
    res = (residual.astype(jnp.bfloat16) if has_res
           else jnp.zeros((B, 1, 1, 1), jnp.bfloat16))

    if rows is None:
        rows = _pick_rows(H, W, C, Cout)
    nb = H // rows
    xb = x.astype(jnp.bfloat16)

    # halo rows as their own 1-row blocks with clamped index maps
    # (overlapping windows are not expressible in one BlockSpec)
    def prev_map(b, i):
        return (b, jnp.maximum(i * rows - 1, 0), 0, 0)

    def next_map(b, i):
        return (b, jnp.minimum(i * rows + rows, H - 1), 0, 0)

    out = pl.pallas_call(
        functools.partial(
            _kernel, rows=rows, H=H, W=W, C=C, Cout=Cout,
            has_tb=has_tb, has_res=has_res,
        ),
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((None, rows, W, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, W, C), prev_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, W, C), next_map,
                         memory_space=pltpu.VMEM),
            # tiny per-batch vectors live whole in VMEM (per-batch
            # (None, C) blocks would violate the (8, 128) tiling rule)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            (pl.BlockSpec((None, rows, W, Cout),
                          lambda b, i: (b, i, 0, 0),
                          memory_space=pltpu.VMEM) if has_res else
             pl.BlockSpec((None, 1, 1, 1), lambda b, i: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)),
        ],
        out_specs=pl.BlockSpec((None, rows, W, Cout),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
        interpret=interpret,
    )(xb, xb, xb, scale, shift, kmat, bias_f, tb, res)
    return out
