"""Probe WHY the fused Block runs ~6x off roofline at the 512^2 levels.

The round-2 per-op profile (tools/profile_flagship.py) puts the bare
fused Block at 512^2x64->64 B=9 at ~5.5 ms where the MXU roofline is
0.88 ms and the HBM roofline 0.74 ms; dx_pack and fuse_skip variants all
land within ~10% of each other, so the limiter is common to all of them.
Hypotheses this tool separates, on the real chip:

  * grid-overhead bound: time tracks the number of grid steps ->
    sweep ``rows`` (bigger slabs = fewer steps).
  * the fused kernel merely ties XLA: time the UNFUSED equivalent
    (GroupNorm+swish via jnp, conv via lax) at the same shapes; if XLA
    wins at a level, fusing should be gated off there (fuse_skip-style
    per-level decision).
  * W-tiling headroom: a 2-D (rows x cols) grid variant is only worth
    building if the rows sweep shows step-count sensitivity.

Run (pause any training child first — see CLAUDE.md):
  nohup python tools/bench_block_variants.py > /tmp/bench_blockvar.log 2>&1 &
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


def rec(name, secs, note=""):
    print(json.dumps({"op": name, "ms": round(secs * 1e3, 3),
                      **({"note": note} if note else {})}), flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    from hsi_dmgasr_tpu.kernels.fused_conv import gn_swish_conv3x3

    key = jax.random.PRNGKey(0)

    def mk(h, c, cout, c2=0):
        ks = jax.random.split(key, 8)
        x = jax.random.normal(ks[0], (B, h, h, c), jnp.bfloat16)
        gn_s = jnp.ones((c + c2,), jnp.float32)
        gn_b = jnp.zeros((c + c2,), jnp.float32)
        k = jax.random.normal(ks[1], (3, 3, c + c2, cout), jnp.float32) * 0.05
        bias = jnp.zeros((cout,), jnp.float32)
        tb = jax.random.normal(ks[2], (B, cout), jnp.float32)
        x2 = (jax.random.normal(ks[3], (B, h, h, c2), jnp.bfloat16)
              if c2 else None)
        return x, gn_s, gn_b, k, bias, tb, x2

    # ---- baseline contamination per shape
    base = {}
    for h, c in [(512, 64), (512, 128), (256, 128), (256, 256)]:
        xb = jax.random.normal(key, (B, h, h, c), jnp.bfloat16)
        base[(h, c)] = timed(lambda x: x, (xb,))
        rec(f"baseline[{h}^2x{c}]", base[(h, c)])

    # ---- 1. rows sweep on the bare fused Block 512^2 64->64
    x, gn_s, gn_b, k, bias, tb, _ = mk(512, 64, 64)
    for rows in [None, 4, 8, 16, 32, 64, 128]:
        try:
            f = lambda x, k: gn_swish_conv3x3(  # noqa: E731
                x, gn_s, gn_b, k, bias, time_bias=tb, num_groups=32,
                rows=rows)
            t = timed(f, (x, k)) - base[(512, 64)]
            rec(f"block[512^2x64 rows={rows}]", t)
        except Exception as e:  # VMEM overflow etc.
            rec(f"block[512^2x64 rows={rows}]", float("nan"), str(e)[:80])

    # dx_pack off at the best rows for reference
    f = lambda x, k: gn_swish_conv3x3(  # noqa: E731
        x, gn_s, gn_b, k, bias, time_bias=tb, num_groups=32, dx_pack=False)
    rec("block[512^2x64 nopack]", timed(f, (x, k)) - base[(512, 64)])

    # ---- 2. unfused XLA equivalent at the same shapes
    def unfused(x, k, gn_s, gn_b, bias, tb, groups=32):
        B_, H_, W_, C_ = x.shape
        xf = x.astype(jnp.float32).reshape(B_, H_, W_, groups, C_ // groups)
        mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
        xn = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(x.shape)
        xn = xn * gn_s + gn_b
        a = (xn * jax.nn.sigmoid(xn)).astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            a, k.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = y + bias + tb[:, None, None, :]
        return y.astype(x.dtype)

    rec("unfused_block[512^2x64]",
        timed(lambda x, k: unfused(x, k, gn_s, gn_b, bias, tb), (x, k))
        - base[(512, 64)])

    # conv alone (no norm/activation) — XLA's floor for the matmul part
    rec("xla_conv[512^2 64->64]",
        timed(lambda a, k: jax.lax.conv_general_dilated(
            a, k.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16),
            (x, k)) - base[(512, 64)])

    # ---- 3. same at 512^2x128 concat shape (the up-path block1)
    x, gn_s, gn_b, k, bias, tb, x2 = mk(512, 128, 64, c2=64)
    for rows in [None, 8, 16, 32]:
        try:
            f = lambda x, k, x2: gn_swish_conv3x3(  # noqa: E731
                x, gn_s, gn_b, k, bias, time_bias=tb, x2=x2,
                num_groups=32, rows=rows)
            t = timed(f, (x, k, x2)) - base[(512, 128)]
            rec(f"block_x2[512^2 128+64->64 rows={rows}]", t)
        except Exception as e:
            rec(f"block_x2[512^2 128+64->64 rows={rows}]", float("nan"),
                str(e)[:80])

    xc = jnp.concatenate([x, x2], axis=-1)
    rec("unfused_block[512^2 192->64]",
        timed(lambda xc, k: unfused(xc, k, gn_s, gn_b, bias, tb), (xc, k))
        - base[(512, 128)])

    # ---- 4. 256^2x128 level
    x, gn_s, gn_b, k, bias, tb, _ = mk(256, 128, 128)
    for rows in [None, 16, 32, 64]:
        try:
            f = lambda x, k: gn_swish_conv3x3(  # noqa: E731
                x, gn_s, gn_b, k, bias, time_bias=tb, num_groups=32,
                rows=rows)
            t = timed(f, (x, k)) - base[(256, 128)]
            rec(f"block[256^2x128 rows={rows}]", t)
        except Exception as e:
            rec(f"block[256^2x128 rows={rows}]", float("nan"), str(e)[:80])
    rec("unfused_block[256^2x128]",
        timed(lambda x, k: unfused(x, k, gn_s, gn_b, bias, tb), (x, k))
        - base[(256, 128)])


def pair_sweep():
    """Round-3 sweep: with W-pair packing live at the C=64 levels, the
    auto row pick drops to 4-8 slabs -> 576-1152 grid steps per conv and
    (1 + 2/rows)x redundant halo input reads. Separates, on the chip:

      * rows x dx_pack at the two hot pair shapes (dx_pack triples the
        f32 epilogue accumulator at pair Cout=128 where N-packing no
        longer buys MXU tiles — 3 full tiles either way);
      * FUSED_PAIR=0 reference at the same rows (env, so run twice).

    Run each env variant (pause training first — CLAUDE.md):
      nohup python tools/bench_block_variants.py --pair > /tmp/bv_pair.log &
      FUSED_PAIR=0 nohup python tools/bench_block_variants.py --pair ...
    """
    print("device:", jax.devices()[0], flush=True)
    print("FUSED_PAIR:", os.environ.get("FUSED_PAIR", "1"), flush=True)
    from hsi_dmgasr_tpu.kernels.fused_conv import gn_swish_conv3x3

    key = jax.random.PRNGKey(0)

    def mk(h, c, cout, c2=0):
        ks = jax.random.split(key, 8)
        x = jax.random.normal(ks[0], (B, h, h, c), jnp.bfloat16)
        gn_s = jnp.ones((c + c2,), jnp.float32)
        gn_b = jnp.zeros((c + c2,), jnp.float32)
        k = jax.random.normal(ks[1], (3, 3, c + c2, cout), jnp.float32) * 0.05
        bias = jnp.zeros((cout,), jnp.float32)
        tb = jax.random.normal(ks[2], (B, cout), jnp.float32)
        x2 = (jax.random.normal(ks[3], (B, h, h, c2), jnp.bfloat16)
              if c2 else None)
        return x, gn_s, gn_b, k, bias, tb, x2

    base = {}
    for h, c in [(512, 64)]:
        xb = jax.random.normal(key, (B, h, h, c), jnp.bfloat16)
        base[(h, c)] = timed(lambda x: x, (xb,))
        rec(f"baseline[{h}^2x{c}]", base[(h, c)])

    # variant axis: (dx_pack, inc_epilogue) — 'inc' places per-dx
    # partials into ONE f32 accumulator (lowest VMEM -> biggest rows)
    VAR = [("pack", dict(dx_pack=True)),
           ("nopack", dict(dx_pack=False)),
           ("inc", dict(inc_epilogue=True))]

    # bare block 512^2 64->64 (down path; pair C=128, Cout=128)
    x, gn_s, gn_b, k, bias, tb, _ = mk(512, 64, 64)
    for rows in [None, 8, 16, 32]:
        for name, kw in VAR:
            try:
                f = lambda x, k: gn_swish_conv3x3(  # noqa: E731
                    x, gn_s, gn_b, k, bias, time_bias=tb, num_groups=32,
                    rows=rows, **kw)
                t = timed(f, (x, k)) - base[(512, 64)]
                rec(f"pair_block[512^2x64 rows={rows} {name}]", t)
            except Exception as e:
                rec(f"pair_block[512^2x64 rows={rows} {name}]",
                    float("nan"), str(e)[:80])

    # up-path block1 with skip + folded res_conv + stats (the flagship's
    # exact hot call: 64+64 concat -> 64, emit_stats + res projection)
    x, gn_s, gn_b, k, bias, tb, x2 = mk(512, 64, 64, c2=64)
    rk = jax.random.normal(key, (1, 1, 128, 64), jnp.float32) * 0.1
    for rows in [None, 4, 8, 16]:
        for name, kw in VAR:
            try:
                f = lambda x, k, x2: gn_swish_conv3x3(  # noqa: E731
                    x, gn_s, gn_b, k, bias, time_bias=tb, x2=x2,
                    num_groups=32, rows=rows,
                    emit_stats=True, res_kernel=rk, **kw)[0]
                t = timed(f, (x, k, x2)) - base[(512, 64)]
                rec(f"pair_rbup1[512^2 64+64->64 rows={rows} {name}]", t)
            except Exception as e:
                rec(f"pair_rbup1[512^2 64+64->64 rows={rows} {name}]",
                    float("nan"), str(e)[:80])

    # the 256^2 levels at their real shapes (Cout >= 128: dx_pack is
    # auto-off there, so 'inc' vs 'nopack' is the live comparison)
    x, gn_s, gn_b, k, bias, tb, x2 = mk(256, 128, 128, c2=128)
    rk = jax.random.normal(key, (1, 1, 256, 128), jnp.float32) * 0.1
    for rows in [None, 8, 16, 32]:
        for name, kw in VAR[1:]:
            try:
                f = lambda x, k, x2: gn_swish_conv3x3(  # noqa: E731
                    x, gn_s, gn_b, k, bias, time_bias=tb, x2=x2,
                    num_groups=32, rows=rows,
                    emit_stats=True, res_kernel=rk, **kw)[0]
                t = timed(f, (x, k, x2)) - base.setdefault(
                    (256, 128), timed(lambda a: a, (x,)))
                rec(f"rbup1[256^2 128+128->128 rows={rows} {name}]", t)
            except Exception as e:
                rec(f"rbup1[256^2 128+128->128 rows={rows} {name}]",
                    float("nan"), str(e)[:80])


if __name__ == "__main__":
    if "--pair" in sys.argv:
        pair_sweep()
    else:
        main()
