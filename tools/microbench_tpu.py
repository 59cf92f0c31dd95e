"""TPU micro-roofline: where does the sampler lose 2x vs HBM roofline?

Times primitive ops at the flagship's hot shapes (512^2@64ch etc., batch 9
groups, bf16) and reports achieved HBM bandwidth. Each op is CHAINED
CHAIN times inside one jit (x -> op(x) -> op(...)) so per-call tunnel
overhead amortizes, and every timed call uses a distinct input (the axon
remote executor caches identical (executable, args) calls).

Run on the real chip:  nohup python tools/microbench_tpu.py > mb.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CHAIN = 50


def timed_chain(fn, params, xs, extra=None):
    """Median seconds for ONE application of fn, from CHAIN chained apps.

    fn(params, x, *extra) must return something x-shaped. xs: list of
    distinct inputs, one per timed repeat (defeats remote result cache).
    IMPORTANT: on the axon remote platform block_until_ready does NOT
    block — only a value fetch forces execution — so timing fetches a
    scalar reduction of the chain output.
    """

    def chained(v, x, *e):
        def body(x, _):
            return fn(v, x, *e), None

        y, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return jnp.sum(y.astype(jnp.float32))

    run = jax.jit(chained)
    e = extra or ()
    float(run(params, xs[0], *e))  # compile + first remote-queue hit
    ts = []
    for x in xs[1:]:
        t0 = time.perf_counter()
        float(run(params, x, *e))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / CHAIN


def report(name, secs, gbytes):
    print(json.dumps({
        "op": name, "ms": round(secs * 1e3, 3),
        "logical_GB": round(gbytes, 3),
        "achieved_GBps": round(gbytes / secs, 1),
    }), flush=True)


def distinct_inputs(key, shape, dtype, n=4):
    ks = jax.random.split(key, n)
    return [jax.random.normal(k, shape, dtype) for k in ks]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--b", type=int, default=9)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print("device:", jax.devices()[0], flush=True)

    from flax import linen as nn

    from hsi_dmgasr_tpu.models.unet import Block, ResnetBlock

    key = jax.random.PRNGKey(0)
    B = args.b

    for (H, C) in [(512, 64), (256, 128), (128, 256)]:
        xs = distinct_inputs(key, (B, H, H, C), jnp.bfloat16)
        nbytes = xs[0].size * 2 / 1e9
        tag = f"{H}x{H}x{C}"

        # ---- copy ceiling (r+w): scaled add, not foldable
        report(f"copy[{tag}]",
               timed_chain(lambda v, a: a * jnp.bfloat16(1.25)
                           + jnp.bfloat16(0.125), None, xs),
               2 * nbytes)

        # ---- GroupNorm+swish
        gn = nn.GroupNorm(num_groups=32, epsilon=1e-5)
        gnv = gn.init(key, xs[0])

        def gn_swish(v, a):
            y = gn.apply(v, a)
            return (y * jax.nn.sigmoid(y)).astype(a.dtype)

        report(f"gn_swish[{tag}]", timed_chain(gn_swish, gnv, xs), 3 * nbytes)

        # ---- conv3x3 (r+w)
        conv = nn.Conv(C, (3, 3), padding="SAME", dtype=jnp.bfloat16)
        cv = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          conv.init(key, xs[0]))
        report(f"conv3x3[{tag}]",
               timed_chain(lambda v, a: conv.apply(v, a), cv, xs), 2 * nbytes)

        # ---- UNet Block: GN -> swish -> conv   (XLA best: 3r2w)
        blk = Block(dim_out=C, norm_groups=32)
        bv = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          blk.init(key, xs[0]))
        report(f"block[{tag}]",
               timed_chain(lambda v, a: blk.apply(v, a).astype(a.dtype),
                           bv, xs), 5 * nbytes)

        # ---- full resblock (2 blocks + inject + residual; ~11 passes)
        rb = ResnetBlock(dim_out=C, norm_groups=32)
        emb = jax.random.normal(key, (B, 64), jnp.bfloat16)
        rv = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          rb.init(key, xs[0], emb))
        report(f"resblock[{tag}]",
               timed_chain(lambda v, a, e: rb.apply(v, a, e)[0].astype(a.dtype),
                           rv, xs, extra=(emb,)), 11 * nbytes)


if __name__ == "__main__":
    main()
