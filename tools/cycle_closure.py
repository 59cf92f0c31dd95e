"""Padded-MXU cycle-accounting closure for the four hot fused blocks.

Round-3 closed block1's gap with a one-off hand computation (~8.6 ms
padded bound vs 12.3 ms measured => ~70% of the PADDED bound). This
tool publishes the same accounting for all four hot shapes, measured
side by side on the chip, so "46% of attainable" has a documented
hardware-honest decomposition: the roofline counts UNPADDED conv
FLOPs; the kernel's actual matmul geometry (fused_conv.py pair /
dx_pack branches) executes PADDED tiles, and the remainder is grid /
epilogue / stats overhead.

Per-shape executed-tile accounting (2 * M * Kpad * Npad per dot, dots
enumerated from the kernel's decomposition; Kpad/Npad round K,N up to
128 lanes):

  rb512   C=64->64, pair ON:    3 dy dots (HW/2,128)@(128,384)
  block1  C=128+64->64, no pair: 3 dy x [(HW,128)@(128,256p) +
                                          (HW,128p of 64)@(128,256p)]
  rb_up256 C=256+128->128, plain: 9 (dy,dx) x [(HW,256)@(256,128) +
                                               (HW,128)@(128,128)]
  final   C=64->3 (padded 64), pair ON: as rb512

Run on an OTHERWISE IDLE chip (SIGSTOP any training child first):
  nohup python tools/cycle_closure.py > /tmp/closure.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from profile_flagship import timed  # noqa: E402

B = 9


def pad128(n):
    return int(-(-n // 128) * 128)


def block(name, h, c, cout, c2=0):
    key = jax.random.PRNGKey(0)
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


def executed_padded_flops(h, c, cout, c2):
    """Tile-level flops the kernel's decomposition actually executes
    per image (mirrors fused_conv.py's pair/dx_pack branch logic)."""
    hw = h * h
    cl = c + c2
    pair = (c == 64 and c2 in (0, 64) and cout % 64 == 0 and cout <= 128)
    dx_pack = pair or (cout < 128 and cout % 64 == 0)
    if pair:
        # all sources relabel (W,64)->(W/2,128); N = 3*2*cout
        m = hw // 2
        n_srcs = 1 + (1 if c2 else 0)
        per_dy = n_srcs * m * 128 * pad128(3 * 2 * cout)
        return 2.0 * 3 * per_dy
    if dx_pack:
        # per dy: one dot per 128-wide K segment of each source
        n = pad128(3 * cout)
        segs = [128] * (c // 128) + ([pad128(c % 128)] if c % 128 else [])
        segs += [128] * (c2 // 128) + ([pad128(c2 % 128)] if c2 % 128
                                       else [])
        return 2.0 * 3 * sum(hw * s * n for s in segs)
    # plain: 9 (dy,dx) dots, K = source channels (padded), N = cout
    n = pad128(cout)
    return 2.0 * 9 * hw * (pad128(c) + (pad128(c2) if c2 else 0)) * n


def main():
    import argparse

    from hsi_dmgasr_tpu.kernels.fused_conv import gn_swish_conv3x3
    from hsi_dmgasr_tpu.utils.roofline import device_peaks

    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes + interpret mode (CPU wiring check)")
    args = ap.parse_args()

    dk = getattr(jax.devices()[0], "device_kind", "TPU v5 lite")
    peak_tf, _ = device_peaks(dk)
    print(f"device: {jax.devices()[0]} peak {peak_tf} TF/s", flush=True)
    interp = args.smoke or jax.devices()[0].platform != "tpu"
    div = 8 if args.smoke else 1

    shapes = [
        ("rb512_64to64", 512 // div, 64, 64, 0),
        ("block1_up512_128+64to64", 512 // div, 128, 64, 64),
        ("rb_up256_256+128to128", 256 // div, 256, 128, 128),
        ("final_512_64to3", 512 // div, 64, 3, 0),
    ]
    for name, h, c, cout, c2 in shapes:
        x, gn_s, gn_b, k, bias, tb, x2 = block(name, h, c, cout, c2)

        # x/x2 ride as jit ARGUMENTS — closing over the 300MB skip
        # tensor bakes it into the HLO and the remote-compile POST
        # fails with HTTP 413 (see CLAUDE.md)
        def op(xx, *a):
            out = gn_swish_conv3x3(xx, gn_s, gn_b, k, bias, time_bias=tb,
                                   x2=(a[0] if a else None),
                                   interpret=interp)
            return out[0] if isinstance(out, tuple) else out

        raw = timed(op, (x, x2) if x2 is not None else (x,))
        # timed()'s chain harness rescales args[0] and sums the output
        # every link — ~1 ms of pure-HBM contamination at these shapes.
        # Its docstring says to subtract the identity baseline; do so.
        base = timed(lambda xx, *a: xx, (x, x2) if x2 is not None else (x,))
        secs = raw - base
        if secs <= 0.05 * raw:  # baseline swamps the op (tiny smoke shapes)
            secs = None
        # final_conv pads Cout 3 -> 64 internally; account at 64
        cout_exec = 64 if cout < 64 else cout
        real = 2.0 * 9 * B * h * h * (c + c2) * cout
        padded = B * executed_padded_flops(h, c, cout_exec, c2)
        row = {
            "block": name,
            "measured_ms": round(secs * 1e3, 2) if secs else None,
            "raw_ms": round(raw * 1e3, 2),
            "harness_baseline_ms": round(base * 1e3, 2),
            "real_tflop": round(real / 1e12, 3),
            "executed_padded_tflop": round(padded / 1e12, 3),
            "unpadded_bound_ms": round(real / peak_tf / 1e9, 2),
            "padded_bound_ms": round(padded / peak_tf / 1e9, 2),
            "pct_of_padded_bound": round(
                100.0 * (padded / peak_tf / 1e12) / secs, 1) if secs
            else None,
            "pct_of_unpadded_bound": round(
                100.0 * (real / peak_tf / 1e12) / secs, 1) if secs
            else None,
        }
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
