"""Manual H-axis spatial parallelism primitives (shard_map side).

Round-2's spatial inference let XLA auto-partition the UNFUSED UNet over
a ('data', 'space') mesh — correct, but Pallas calls are opaque to
GSPMD, so the fused kernels (the entire round-2 speedup) were forfeited
on the latency path (pipeline.py r2:174). The TPU-native fix is
shard_map with explicit halo exchange: every rank holds an H-shard, and
the 3x3 convs / fused blocks receive their neighbors' boundary rows over
ICI ppermutes while GroupNorm moments ride tiny all_gathers of per-row
partial sums (bitwise-reproducible vs single-device — see
kernels.fused_conv._reduce_row_stats; a psum would reassociate at f32
level, which GroupNorm's variance subtraction amplifies ~(mean/std)^2
per block into 1e-3-scale divergence).

These helpers implement that contract for every spatial op the SR3 UNet
contains (capability target: exceeds the reference's batch-only
DataParallel, model/networks.py:113-115):

  * ``exchange_halo``       — 1-row boundary exchange (both directions).
  * ``conv3x3_spatial``     — stride-1/2 3x3 conv on an H-shard, halo
                              fed, zero-padded at the true image edges.
  * ``up2_conv3x3_spatial`` — the fused nearest-x2+conv3x3 boundary
                              (ops/fused_up.py) on an H-shard.

All functions must run inside shard_map with ``axis_name`` bound to the
'space' mesh axis, with H divided evenly across it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ring(axis_name, shift):
    n = jax.lax.psum(1, axis_name)
    return [(i, (i + shift) % n) for i in range(n)]


def exchange_halo(x, axis_name):
    """(prev_row, next_row) for an H-sharded (B, H_loc, W, C) tensor.

    prev_row = the LAST row of the previous rank's shard; next_row = the
    FIRST row of the next rank's shard (both (B, 1, W, C)). At the true
    image edges the returned rows wrap around the ring — callers mask
    them (see ``edge_mask``); keeping the permutation a full ring keeps
    it a single ICI hop on a torus.
    """
    prev_row = jax.lax.ppermute(x[:, -1:], axis_name, _ring(axis_name, 1))
    next_row = jax.lax.ppermute(x[:, :1], axis_name, _ring(axis_name, -1))
    return prev_row, next_row


def edge_flags(axis_name):
    """(is_first, is_last) boolean scalars for this rank."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.psum(1, axis_name)
    return idx == 0, idx == n - 1


def edge_mask(prev_row, next_row, axis_name):
    """Zero the halo rows at the true image edges (SAME conv padding)."""
    is_first, is_last = edge_flags(axis_name)
    prev_row = jnp.where(is_first, jnp.zeros_like(prev_row), prev_row)
    next_row = jnp.where(is_last, jnp.zeros_like(next_row), next_row)
    return prev_row, next_row


def conv3x3_spatial(x, kernel, bias, axis_name, stride=1):
    """3x3 conv (torch padding=1) of an H-sharded tensor.

    Matches ``Conv2d(features, 3, stride)`` on the full image: the halo
    rows complete each rank's receptive field, H padding becomes VALID
    over the extended shard, W keeps SAME padding. For stride=2 the
    even H_loc keeps every rank's window phase aligned with the global
    conv (window starts at global rows 2o-1).
    """
    prev_row, next_row = edge_mask(*exchange_halo(x, axis_name), axis_name)
    xe = jnp.concatenate([prev_row, x, next_row], axis=1)
    y = jax.lax.conv_general_dilated(
        xe, kernel.astype(x.dtype), (stride, stride),
        padding=((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def up2_conv3x3_spatial(x, kernel, bias, axis_name):
    """nearest-x2 + conv3x3 (one lhs_dilation=2 conv, ops/fused_up.py)
    on an H-shard: 1 halo row each side, H padding folded into the
    extension (out rows = 2*H_loc, aligned with the global op)."""
    from ..ops.fused_up import _compose_up2

    prev_row, next_row = edge_mask(*exchange_halo(x, axis_name), axis_name)
    xe = jnp.concatenate([prev_row, x, next_row], axis=1)
    k4 = _compose_up2(kernel).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        xe, k4, (1, 1), ((0, 0), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
