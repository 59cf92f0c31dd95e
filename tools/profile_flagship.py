"""Per-component timing of the flagship sampler step (512^2 Pavia, B=9).

Enumerates every op the fused UNet runs in one denoise step (down path,
mid, up path with skip concats, boundary convs, final block, posterior
math) at its exact shape, times each on the real TPU via chained
lax.scan with a scalar carry (the axon executor caches identical calls
and block_until_ready does not block — see tools/microbench_tpu.py),
and prints a sorted table plus the sum vs the whole-UNet measurement.

Run: nohup python tools/profile_flagship.py > /tmp/profile_flagship.log 2>&1 &
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

CHAIN = 30
REPS = 4


def timed(op, args_base, nchain=CHAIN):
    """Median seconds per op application.

    Chains via a scalar carry: each link rescales the first input by
    (1 + s*1e-6) so links are sequentially dependent and inputs are
    distinct across repeats. Baseline ``timed(identity)`` at the same
    shape measures the rescale+reduce contamination (subtract it).
    """

    def chained(s0, *args):
        def body(s, _):
            x = args[0] * (1 + s * 1e-6).astype(args[0].dtype)
            y = op(x, *args[1:])
            return jnp.sum(y.astype(jnp.float32)) * 1e-12 + s, None

        out, _ = jax.lax.scan(body, s0, None, length=nchain)
        return out

    run = jax.jit(chained)
    s0 = jnp.float32(0.0)
    float(run(s0, *args_base))  # compile
    ts = []
    for r in range(REPS):
        t0 = time.perf_counter()
        float(run(jnp.float32(r * 1e-3), *args_base))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / nchain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--b", type=int, default=9)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--fuse-skip", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    interp = dev.platform == "cpu"

    from hsi_dmgasr_tpu.models.unet import Block, ResnetBlock, SelfAttention
    from hsi_dmgasr_tpu.ops.blocks import Conv2d
    from hsi_dmgasr_tpu.ops.fused_up import up2_conv3x3

    key = jax.random.PRNGKey(0)
    B, S = args.b, args.size
    dt = jnp.bfloat16
    emb = jax.random.normal(key, (B, 64), jnp.float32)

    results = []

    def rec(name, secs):
        results.append((name, secs))
        print(json.dumps({"op": name, "ms": round(secs * 1e3, 3)}),
              flush=True)

    def x_of(h, c):
        return jax.random.normal(key, (B, h, h, c), dt)

    # ---- identity baselines (rescale+reduce contamination) per shape
    base_ms = {}
    for h, c in [(S, 64), (S // 2, 128), (S // 4, 256), (S // 8, 512),
                 (S // 16, 512)]:
        t = timed(lambda x: x, (x_of(h, c),))
        base_ms[(h, c)] = t
        rec(f"baseline[{h}^2x{c}]", t)

    def rb(h, cin, cout, c2=0, tag=""):
        """Fused resblock at (h, cin [, +c2 skip]) -> cout."""
        m = ResnetBlock(dim_out=cout, norm_groups=32, fuse=True,
                        fuse_skip=bool(c2) and args.fuse_skip,
                        fuse_stats=True)
        x = x_of(h, cin)
        x2 = x_of(h, c2) if c2 else None

        def apply(x, v, *rest):
            x2l = rest[0] if c2 else None
            out, _ = m.apply(v, x, emb, False, x2=x2l)
            return out

        v = m.init(key, x, emb, False, x2=x2)
        a = (x, v, x2) if c2 else (x, v)
        t = timed(apply, a) - base_ms.get((h, cin), 0.0)
        rec(f"rb{tag}[{h}^2 {cin}{'+%d' % c2 if c2 else ''}->{cout}]", t)
        return t

    def conv(h, cin, cout, stride=1, tag="conv"):
        m = Conv2d(cout, 3, stride=stride)
        x = x_of(h, cin)
        v = jax.tree.map(lambda a: a.astype(dt), m.init(key, x))
        t = timed(lambda x, v: m.apply(v, x), (x, v))
        t -= base_ms.get((h, cin), 0.0)
        rec(f"{tag}[{h}^2 {cin}->{cout} s{stride}]", t)
        return t

    # ---------- down path
    total = 0.0
    total += conv(S, 6, 64, tag="downs_0")
    total += 2 * rb(S, 64, 64)
    total += conv(S, 64, 64, stride=2, tag="ds")
    total += rb(S // 2, 64, 128) + rb(S // 2, 128, 128)
    total += conv(S // 2, 128, 128, stride=2, tag="ds")
    total += rb(S // 4, 128, 256) + rb(S // 4, 256, 256)
    total += conv(S // 4, 256, 256, stride=2, tag="ds")
    total += rb(S // 8, 256, 512) + rb(S // 8, 512, 512)
    total += conv(S // 8, 512, 512, stride=2, tag="ds")
    total += 2 * rb(S // 16, 512, 512)

    # ---------- mid (attention at S/16)
    total += 2 * rb(S // 16, 512, 512)
    attn = SelfAttention(512, norm_groups=32)
    xat = x_of(S // 16, 512)
    va = attn.init(key, xat)
    t = timed(lambda x, v: attn.apply(v, x), (xat, va))
    t -= base_ms[(S // 16, 512)]
    rec(f"attn[{S // 16}^2x512]", t)
    total += t

    # ---------- up path (x2 = popped skip)
    total += 3 * rb(S // 16, 512, 512, c2=512, tag="_up")
    # boundary: fused nearest-up2+conv
    for h, c in [(S // 16, 512), (S // 8, 512), (S // 4, 256), (S // 2, 128)]:
        m = Conv2d(c, 3)
        x = x_of(h, c)
        v = jax.tree.map(lambda a: a.astype(dt), m.init(key, x))
        k, bias = v["params"]["kernel"], v["params"]["bias"]
        t = timed(lambda x, k, b: up2_conv3x3(x, k, b), (x, k, bias))
        t -= base_ms.get((h, c), 0.0)
        rec(f"up2conv[{h}^2x{c}]", t)
        total += t
    total += (2 * rb(S // 8, 512, 512, c2=512, tag="_up")
              + rb(S // 8, 512, 512, c2=256, tag="_up"))
    total += (rb(S // 4, 512, 256, c2=256, tag="_up")
              + rb(S // 4, 256, 256, c2=256, tag="_up")
              + rb(S // 4, 256, 256, c2=128, tag="_up"))
    total += (rb(S // 2, 256, 128, c2=128, tag="_up")
              + rb(S // 2, 128, 128, c2=128, tag="_up")
              + rb(S // 2, 128, 128, c2=64, tag="_up"))
    total += 3 * rb(S, 128, 64, c2=64, tag="_up")

    # ---------- final fused block 64->3
    m = Block(3, norm_groups=32, fuse=True)
    x = x_of(S, 64)
    v = m.init(key, x)
    t = timed(lambda x, v: m.apply(v, x), (x, v)) - base_ms[(S, 64)]
    rec(f"final_block[{S}^2 64->3]", t)
    total += t

    print(json.dumps({"sum_components_ms": round(total * 1e3, 2)}),
          flush=True)

    # ---------- the whole fused UNet, one apply
    from hsi_dmgasr_tpu.models.unet import UNet

    net = UNet(in_channel=6, out_channel=3, inner_channel=64,
               norm_groups=32, channel_mults=(1, 2, 4, 8, 8),
               attn_res=(16,), res_blocks=2, image_size=S,
               fuse_blocks=True, fuse_skip=args.fuse_skip)
    xin = x_of(S, 6).astype(jnp.float32)
    tt = jnp.full((B, 1), 0.5, jnp.float32)
    vu = net.init(key, xin, tt)
    t = timed(lambda x, v, tt: net.apply(v, x, tt), (xin, vu, tt),
              nchain=10)
    rec(f"UNET_TOTAL[{S}^2]", t)

    results.sort(key=lambda kv: -kv[1])
    print("\n---- sorted ----")
    for name, secs in results:
        print(f"{secs * 1e3:9.3f} ms  {name}")


if __name__ == "__main__":
    main()
