"""int8-MXU feasibility probe for the quantized inference path.

v5e MXU does int8 at 2x the bf16 MAC rate (394.7 TOPS vs 197 TFLOPS).
BENCHMARKS.md names int8 as the honest next lever for the 512^2 kernel
wall (N-tile underfill at Cout=64 is a *relative* waste — halving the
cycle cost halves the padded cost too). Before building a quantized
fused path, measure whether int8 dots actually reach ~2x on:

  1. XLA `lax.dot_general` with int8 operands, preferred int32
  2. a minimal Pallas kernel doing the same dot per grid block

at the flagship's hot matmul geometry (dx-packed rb_up block1:
K=3*192=576, N=3*64=192; plus a clean MXU-saturating square case).

Run on the real chip:  nohup python tools/microbench_int8.py > log 2>&1 &
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# Each dot is ~10-20us on-chip; the axon tunnel round-trip is ~30ms, so
# the chain must be long enough that compute dominates dispatch.
CHAIN = int(os.environ.get("INT8_CHAIN", "4000"))


def timed(run, xs, post=lambda y: jnp.sum(y.astype(jnp.float32))):
    """Median seconds for one run(x); value-fetch forces execution (axon)."""
    float(run(xs[0]))
    ts = []
    for x in xs[1:]:
        t0 = time.perf_counter()
        float(run(x))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain_dot(w, preferred, x):
    """CHAIN dependent dots: x @ w -> cast back to x dtype -> repeat."""

    def body(a, _):
        y = jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=preferred
        )
        # Fold the accumulator back to the operand dtype so the chain is
        # shape/dtype-stable. For int8 this models the requantize step.
        if a.dtype == jnp.int8:
            a2 = (y >> 7).astype(jnp.int8)
        else:
            a2 = y.astype(a.dtype)
        # keep N == K only in the square case; otherwise re-slice/pad
        if a2.shape[1] != a.shape[1]:
            k = a.shape[1]
            if a2.shape[1] >= k:
                a2 = a2[:, :k]
            else:
                a2 = jnp.pad(a2, ((0, 0), (0, k - a2.shape[1])))
        return a2, None

    out, _ = jax.lax.scan(body, x, None, length=CHAIN)
    return jnp.sum(out.astype(jnp.float32))


def pallas_dot(w, preferred, bm, bn, x):
    """Minimal blocked Pallas dot with the same chain-on-host-of-kernel."""
    from jax.experimental import pallas as pl

    M, K = x.shape
    N = w.shape[1]

    def kern(x_ref, w_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=preferred,
        )

    dot = pl.pallas_call(
        kern,
        grid=(M // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0)),
            pl.BlockSpec((K, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), preferred),
    )

    def body(a, _):
        y = dot(a, w)
        if a.dtype == jnp.int8:
            a2 = (y >> 7).astype(jnp.int8)
        else:
            a2 = y.astype(a.dtype)
        if a2.shape[1] != a.shape[1]:
            k = a.shape[1]
            a2 = a2[:, :k] if a2.shape[1] >= k else jnp.pad(
                a2, ((0, 0), (0, k - a2.shape[1])))
        return a2, None

    out, _ = jax.lax.scan(body, x, None, length=CHAIN)
    return jnp.sum(out.astype(jnp.float32))


def rand_int8(key, shape):
    return jax.random.randint(key, shape, -127, 128, jnp.int8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("device:", jax.devices()[0], flush=True)
    key = jax.random.PRNGKey(0)

    # (name, M, K, N, pallas block m, n)
    cases = [
        ("square_4096x512x512", 4096, 512, 512, 512, 512),
        ("rbup_block1_dxpack", 4096, 576, 256, 512, 256),  # N padded 192->256
        ("rb512_dxpack", 4096, 192, 256, 512, 256),        # C=64 level
    ]

    for name, M, K, N, bm, bn in cases:
        flops = 2 * M * K * N * CHAIN
        ks = jax.random.split(key, 5)
        for dt, preferred in (("bf16", jnp.float32), ("int8", jnp.int32)):
            if dt == "bf16":
                w = jax.random.normal(ks[0], (K, N), jnp.bfloat16)
                xs = [jax.random.normal(k, (M, K), jnp.bfloat16)
                      for k in ks[1:]]
            else:
                w = rand_int8(ks[0], (K, N))
                xs = [rand_int8(k, (M, K)) for k in ks[1:]]

            run = jax.jit(functools.partial(chain_dot, w, preferred))
            s = timed(run, xs)
            print(json.dumps({
                "case": name, "path": "xla", "dtype": dt,
                "us_per_dot": round(s / CHAIN * 1e6, 2),
                "achieved_TOPs": round(flops / s / 1e12, 1),
            }), flush=True)

            try:
                runp = jax.jit(
                    functools.partial(pallas_dot, w, preferred, bm, bn))
                s = timed(runp, xs)
                print(json.dumps({
                    "case": name, "path": "pallas", "dtype": dt,
                    "us_per_dot": round(s / CHAIN * 1e6, 2),
                    "achieved_TOPs": round(flops / s / 1e12, 1),
                }), flush=True)
            except Exception as e:  # pallas int8 support is the question
                print(json.dumps({
                    "case": name, "path": "pallas", "dtype": dt,
                    "error": repr(e)[:200],
                }), flush=True)


if __name__ == "__main__":
    main()
