"""MXU matmul-geometry probe for the C=64 3x3-conv kernel wall.

BENCHMARKS.md "Where the remaining 46%-of-attainable gap lives": at the
512^2 C=64/Cout=64 shapes the fused kernel either under-fills tiles
(unpaired: K=64->128 pad, N=192->256 pad => 56% tile fill) or executes
parity-zero MACs (W-pair: full tiles but 2x real work => 50%). A third
decomposition — folding the three dy taps into K (im2col over dy:
K=3C=192->256 pad, N=192->256 pad => 56% fill with NO doubled work,
plus roll/concat build cost) — was never measured. This probe times all
three (plus the block1 mixed-source variants) as chained XLA dots on
the real chip, normalized to REAL conv FLOPs accomplished:

  A  unpaired dx-pack   3 dots (M,64)@(64,192)      per complete conv
  B  W-pair             3 dots (M/2,128)@(128,384)  (2x real MACs)
  C  dy-folded          1 dot  (M,192)@(192,192)    (+roll/concat build)
  E1 block1 split       (M,128)@(128,192) + (M,64)@(64,192)   per dy
  E2 block1 folded      1 dot (M,576)@(576,192)     per complete conv

'real TF/s' divides the conv's logical 2*9*M*C*Cout FLOPs by wall time,
so candidates are directly comparable; the winner is what the fused
kernel's geometry should use. Run on an otherwise-idle chip:

  nohup python tools/microbench_geometry.py > /tmp/geom.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CHAIN = int(os.environ.get("GEOM_CHAIN", "600"))
C, COUT = 64, 64


def timed(run, n=3):
    float(run(jnp.float32(1.0)))  # compile + warm
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(run(jnp.float32(i + 2.0)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / CHAIN


def chain(body):
    """CHAIN dependent complete-convs; the carry keeps every iteration
    data-dependent so the axon executor cannot cache or overlap them."""

    def run(seed):
        x0 = jnp.full((M, C), seed, jnp.bfloat16)

        def step(a, _):
            return body(a), None

        out, _ = jax.lax.scan(step, x0, None, length=CHAIN)
        return jnp.sum(out.astype(jnp.float32))

    return jax.jit(run)


M = int(os.environ.get("GEOM_M", "4096"))


def main():
    print("device:", jax.devices()[0], "M:", M, "chain:", CHAIN, flush=True)
    key = jax.random.PRNGKey(0)
    bf = jnp.bfloat16

    wA = jax.random.normal(key, (3, C, 3 * COUT), bf)          # per-dy
    wB = jax.random.normal(key, (3, 2 * C, 3 * 2 * COUT), bf)  # pair
    wC = jax.random.normal(key, (3 * C, 3 * COUT), bf)         # dy-folded
    w1a = jax.random.normal(key, (3, 128, 3 * COUT), bf)       # block1 128-src
    wE2 = jax.random.normal(key, (3 * (128 + C), 3 * COUT), bf)

    def back(y):
        # fold any (M?, N) output back to the (M, C) bf16 carry
        y = y.astype(jnp.float32)
        if y.shape[0] != M:
            y = y.reshape(M, -1)
        return (y[:, :C] * 1e-3).astype(bf)

    def conv_A(a):
        y = sum(jnp.dot(a, wA[d], preferred_element_type=jnp.float32)
                for d in range(3))
        return back(y)

    def conv_B(a):
        p = a.reshape(M // 2, 2 * C)
        y = sum(jnp.dot(p, wB[d], preferred_element_type=jnp.float32)
                for d in range(3))
        return back(y)

    def conv_C(a):
        # im2col over dy: three row-shifted copies along K (the real
        # kernel would do this as a VMEM roll; jnp.roll is the analog)
        cols = jnp.concatenate(
            [jnp.roll(a, s, axis=0) for s in (-1, 0, 1)], axis=1)
        y = jnp.dot(cols, wC, preferred_element_type=jnp.float32)
        return back(y)

    def conv_E1(a):
        # block1 mixed source: C=128 part dense per dy + C=64 part
        a128 = jnp.concatenate([a, a], axis=1)
        y = sum(jnp.dot(a128, w1a[d], preferred_element_type=jnp.float32)
                + jnp.dot(a, wA[d], preferred_element_type=jnp.float32)
                for d in range(3))
        return back(y)

    def conv_E2(a):
        a128 = jnp.concatenate([a, a], axis=1)
        src = jnp.concatenate([a128, a], axis=1)  # (M, 192)
        cols = jnp.concatenate(
            [jnp.roll(src, s, axis=0) for s in (-1, 0, 1)], axis=1)
        y = jnp.dot(cols, wE2, preferred_element_type=jnp.float32)
        return back(y)

    real_flops = 2.0 * 9 * M * C * COUT
    real_flops_b1 = 2.0 * 9 * M * (128 + C) * COUT
    for name, fn, flops in (
        ("A_unpaired_dxpack_3x(M,64)@(64,192)", conv_A, real_flops),
        ("B_pair_3x(M/2,128)@(128,384)", conv_B, real_flops),
        ("C_dyfold_1x(M,192)@(192,192)", conv_C, real_flops),
        ("E1_block1_split_per_dy", conv_E1, real_flops_b1),
        ("E2_block1_dyfold_1x(M,576)@(576,192)", conv_E2, real_flops_b1),
    ):
        s = timed(chain(fn))
        print(json.dumps({
            "candidate": name,
            "us_per_conv": round(s * 1e6, 2),
            "real_tflops": round(flops / s / 1e12, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
