"""Fused spatial self-attention.

Replaces the reference SelfAttention einsum pair
(sr3_modules/unet.py:133-140), which materializes a
(B, heads, H, W, H, W) attention tensor — O((HW)^2) HBM traffic. Here:

  * XLA path: softmax(QK^T * scale)V over flattened tokens; XLA fuses
    the softmax into the matmul epilogue, never writing the full
    attention matrix at f32 beyond one (S, S) tile per batch.
  * Pallas path (TPU, long sequences): flash-attention style streaming
    softmax over K/V blocks, numerically identical, O(S) memory.

Shapes: q, k, v are (B, S, H, D); returns (B, S, H*D).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Measured on a v5e chip (tools/microbench + BENCHMARKS.md "attention"):
# XLA's fused softmax(QK^T)V matches the Pallas kernel to ~4% up through
# S=4096 at D=512 (0.96-0.99x), Pallas wins 1.39x at S=8192/D=128, and
# XLA OOMs outright at S=16384 (the (B,S,S) f32 logits exceed HBM) where
# the streaming kernel keeps O(S) memory. Gate set from that data.
_PALLAS_MIN_TOKENS = 8192


def _xla_attention(q, k, v, scale):
    b, s, h, d = q.shape
    logits = jnp.einsum("bshd,bthd->bhst", q, k) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhst,bthd->bshd", probs, v)
    return out.reshape(b, s, h * d)


def spatial_attention(q, k, v, scale, force_pallas=False):
    """Fused attention dispatch (see module docstring)."""
    b, s, h, d = q.shape
    use_pallas = force_pallas or (
        s >= _PALLAS_MIN_TOKENS
        and jax.default_backend() == "tpu"
        and d % 128 == 0
    )
    if use_pallas:
        from .flash_attention import flash_attention

        out = flash_attention(q, k, v, scale)
        return out.reshape(b, s, h * d)
    return _xla_attention(q, k, v, scale)
