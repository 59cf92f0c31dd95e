"""Probe: is the fused Pallas kernel the right lowering for final_conv?

The UNet's final block (reference model/sr3_modules/unet.py:259-263:
Block(pre_channel, default(out_channel, in_channel)) — here GN+swish+
conv3x3 64->3 at 512^2) is the one hot shape whose Cout the fused
kernel must pad 3 -> 64: cycle_closure.py measures it at ~5 ms while
its REAL flops need 0.04 ms — 99% of the MXU work is padding. XLA, by
contrast, lowers Cout=3 convs without padding the output tile and is
purely HBM-bound at this shape.

Variants measured (B=9, 512^2, bf16, chained-scan timing, identity
baseline subtracted):
  fused          — shipped gn_swish_conv3x3 (pads Cout to 64)
  xla_own_stats  — GN (own moments) + swish + XLA conv
  xla_stats_in   — normalize from PROVIDED group moments (what the
                   in-network stats chain supplies) + swish + XLA conv

Run on an otherwise idle chip (SIGSTOP the training child first):
  nohup python tools/probe_final_block.py > /tmp/probe_final.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from profile_flagship import timed  # noqa: E402

B = 9
H = 512
C = 64
COUT = 3
GROUPS = 32


def main():
    from hsi_dmgasr_tpu.kernels.fused_conv import gn_swish_conv3x3

    print("device:", jax.devices()[0], flush=True)
    interp = jax.devices()[0].platform != "tpu"

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (B, H, H, C), jnp.bfloat16)
    gn_s = jnp.ones((C,), jnp.float32)
    gn_b = jnp.zeros((C,), jnp.float32)
    k = jax.random.normal(ks[1], (3, 3, C, COUT), jnp.float32) * 0.05
    bias = jnp.zeros((COUT,), jnp.float32)
    # per-group moments as the stats chain would hand them
    mean = jax.random.normal(ks[2], (B, GROUPS), jnp.float32) * 0.01
    var = jnp.abs(jax.random.normal(ks[3], (B, GROUPS), jnp.float32)) + 1.0

    base = timed(lambda xx: xx, (x,))
    print(json.dumps({"op": "baseline", "ms": round(base * 1e3, 3)}),
          flush=True)

    def rec(name, secs):
        print(json.dumps({"op": name, "ms": round((secs - base) * 1e3, 3)}),
              flush=True)

    def fused(xx, kk):
        out = gn_swish_conv3x3(xx, gn_s, gn_b, kk, bias,
                               num_groups=GROUPS, interpret=interp)
        return out[0] if isinstance(out, tuple) else out

    rec("fused[512^2 64->3]", timed(fused, (x, k)))

    def xla_conv(a, kk):
        return jax.lax.conv_general_dilated(
            a, kk.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    def xla_own(xx, kk):
        xf = xx.astype(jnp.float32).reshape(B, H, H, GROUPS, C // GROUPS)
        m = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
        v = jnp.mean(jnp.square(xf - m), axis=(1, 2, 4), keepdims=True)
        xn = ((xf - m) * jax.lax.rsqrt(v + 1e-5)).reshape(xx.shape)
        xn = xn * gn_s + gn_b
        a = (xn * jax.nn.sigmoid(xn)).astype(jnp.bfloat16)
        return (xla_conv(a, kk) + bias).astype(xx.dtype)

    rec("xla_own_stats[512^2 64->3]", timed(xla_own, (x, k)))

    def xla_stats_in(xx, kk, m, v):
        scale = (jax.lax.rsqrt(v + 1e-5))  # (B, GROUPS)
        scale = jnp.repeat(scale, C // GROUPS, axis=-1)  # (B, C)
        shift = jnp.repeat(m, C // GROUPS, axis=-1)
        xn = (xx.astype(jnp.float32) - shift[:, None, None, :]) \
            * scale[:, None, None, :]
        xn = xn * gn_s + gn_b
        a = (xn * jax.nn.sigmoid(xn)).astype(jnp.bfloat16)
        return (xla_conv(a, kk) + bias).astype(xx.dtype)

    rec("xla_stats_in[512^2 64->3]", timed(xla_stats_in, (x, k, mean, var)))


if __name__ == "__main__":
    main()
