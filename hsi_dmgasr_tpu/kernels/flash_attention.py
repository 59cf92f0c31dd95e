"""Flash-attention Pallas kernel for TPU.

Streaming-softmax attention over K/V blocks: the (S, S) score matrix is
never materialized in HBM (the reference's einsum pair writes a
(B, heads, H, W, H, W) tensor, sr3_modules/unet.py:133-138). Each grid
step holds one Q tile and walks K/V tiles in VMEM, maintaining the
online (max, sum) rescaling.

Layout: q, k, v (B, S, H, D) -> out (B, S, H, D). D should be a
multiple of 8 (f32 sublane); S is padded to the K tile internally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, seq_len):
    # q_ref: (BQ, D); k_ref/v_ref: (S_pad, D); o_ref: (BQ, D)
    bq, d = q_ref.shape
    s_pad = k_ref.shape[0]
    num_kb = s_pad // block_k

    q = q_ref[:] * scale

    def body(j, carry):
        o_acc, m_prev, l_prev = carry
        k = k_ref[pl.ds(j * block_k, block_k), :]
        v = v_ref[pl.ds(j * block_k, block_k), :]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (BQ, BK)
        # mask padded keys
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        valid = (j * block_k + col) < seq_len
        s = jnp.where(valid, s, _NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        o_new = o_acc * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )
        return o_new, m_new, l_new

    o_acc = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    o_acc, _, l_fin = jax.lax.fori_loop(0, num_kb, body, (o_acc, m0, l0))
    o_ref[:] = (o_acc / l_fin).astype(o_ref.dtype)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_attention(q, k, v, scale, block_q=256, block_k=256):
    """(B, S, H, D) fused attention; returns (B, S, H, D)."""
    b, s, h, d = q.shape
    block_q = min(block_q, _round_up(s, 128))
    block_k = min(block_k, _round_up(s, 128))
    s_pad = _round_up(s, max(block_q, block_k))

    def prep(x):
        x = jnp.moveaxis(x, 2, 1).reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))

    qf, kf, vf = prep(q), prep(k), prep(v)

    kernel = functools.partial(
        _flash_kernel, scale=scale, block_k=block_k, seq_len=s
    )
    out = pl.pallas_call(
        kernel,
        grid=(b * h, s_pad // block_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, s_pad, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, s_pad, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d), q.dtype),
    )(qf, kf, vf)

    out = out[:, :s, :].reshape(b, h, s, d)
    return jnp.moveaxis(out, 1, 2)
