"""Flash-attention Pallas kernel for TPU.

Streaming-softmax attention over K/V blocks: the (S, S) score matrix is
never materialized (the reference's einsum pair writes a
(B, heads, H, W, H, W) tensor, sr3_modules/unet.py:133-138), and K/V stay
in HBM — each (block_k, D) tile is DMA'd into a double-buffered VMEM
scratch while the previous tile is being consumed, so VMEM usage is
O(block * D) regardless of sequence length.

Layout: q, k, v (B, S, H, D) -> out (B, S, H, D). D should be a multiple
of 128 lanes for peak efficiency; S is padded to the tile internally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_hbm, v_hbm, o_ref, *, scale, block_k, seq_len):
    # q_ref: (BQ, D) VMEM tile; k_hbm/v_hbm: FULL (BH, S_pad, D) refs in
    # HBM (ANY-space refs are not grid-partitioned — index batch here);
    # o_ref: (BQ, D) VMEM tile
    bq, d = q_ref.shape
    bi = pl.program_id(0)
    s_pad = k_hbm.shape[1]
    num_kb = s_pad // block_k

    q = q_ref[:] * scale

    def body(kv_scratch, sems):
        def dma(slot, j, which):
            src = k_hbm if which == 0 else v_hbm
            return pltpu.make_async_copy(
                src.at[bi, pl.ds(j * block_k, block_k), :],
                kv_scratch.at[which, slot],
                sems.at[which, slot],
            )

        # warm up: prefetch K/V tile 0 into slot 0
        dma(0, 0, 0).start()
        dma(0, 0, 1).start()

        def step(j, carry):
            o_acc, m_prev, l_prev = carry
            slot = j % 2
            nxt = (j + 1) % 2

            @pl.when(j + 1 < num_kb)
            def _():
                dma(nxt, j + 1, 0).start()
                dma(nxt, j + 1, 1).start()

            dma(slot, j, 0).wait()
            dma(slot, j, 1).wait()
            k = kv_scratch[0, slot]
            v = kv_scratch[1, slot]

            s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
            valid = (j * block_k + col) < seq_len
            s = jnp.where(valid, s, _NEG_INF)

            m_cur = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            o_new = o_acc * alpha + jnp.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            return o_new, m_new, l_new

        o_acc = jnp.zeros((bq, d), jnp.float32)
        m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        o_acc, _, l_fin = jax.lax.fori_loop(
            0, num_kb, step, (o_acc, m0, l0)
        )
        o_ref[:] = (o_acc / l_fin).astype(o_ref.dtype)

    pl.run_scoped(
        body,
        kv_scratch=pltpu.VMEM((2, 2, block_k, q_ref.shape[1]), k_hbm.dtype),
        sems=pltpu.SemaphoreType.DMA((2, 2)),
    )


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k"))
def flash_attention(q, k, v, scale, block_q=256, block_k=512):
    """(B, S, H, D) fused attention; returns (B, S, H, D)."""
    import math

    b, s, h, d = q.shape
    block_q = min(block_q, _round_up(s, 128))
    block_k = min(block_k, _round_up(s, 128))
    # padded length must tile under BOTH the q grid and the k loop
    s_pad = _round_up(s, math.lcm(block_q, block_k))

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
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # K/V stay whole in HBM; the kernel streams tiles via DMA
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d), q.dtype),
    )(qf, kf, vf)

    out = out[:, :s, :].reshape(b, h, s, d)
    return jnp.moveaxis(out, 1, 2)
