"""Variant shoot-out for the fused kernels at the flagship hot shapes.

Measures, on the real chip (B=9, bf16):
  * up2_conv3x3 (lhs_dilation lowering) vs resize+conv at the 4 up
    boundaries
  * the 512^2 up resblock (128+64->64) under fuse_skip x dx_pack
  * the 512^2 down resblock (64->64) and bare Block under dx_pack
Used to set kernels.fused_conv.DX_PACK_DEFAULT and UNet.fuse_skip.

Run: nohup python tools/bench_kernels.py > /tmp/bench_kernels.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from profile_flagship import timed  # noqa: E402


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    from hsi_dmgasr_tpu.kernels import fused_conv
    from hsi_dmgasr_tpu.models.unet import Block, ResnetBlock
    from hsi_dmgasr_tpu.ops.blocks import Conv2d
    from hsi_dmgasr_tpu.ops.fused_up import up2_conv3x3

    key = jax.random.PRNGKey(0)
    B = 9
    dt = jnp.bfloat16
    emb = jax.random.normal(key, (B, 64), jnp.float32)

    def rec(name, secs):
        print(json.dumps({"op": name, "ms": round(secs * 1e3, 3)}),
              flush=True)

    def x_of(h, c):
        return jax.random.normal(key, (B, h, h, c), dt)

    base = {}
    for h, c in [(32, 512), (64, 512), (128, 256), (256, 128), (512, 64),
                 (512, 128)]:
        base[(h, c)] = timed(lambda x: x, (x_of(h, c),))

    # ---- up boundary: new lowering vs unfused resize+conv
    for h, c in [(32, 512), (64, 512), (128, 256), (256, 128)]:
        m = Conv2d(c, 3)
        x = x_of(h, c)
        v = jax.tree.map(lambda a: a.astype(dt), m.init(key, x))
        k, bias = v["params"]["kernel"], v["params"]["bias"]
        t = timed(lambda x, k, b: up2_conv3x3(x, k, b), (x, k, bias))
        rec(f"up2conv_dilated[{h}^2x{c}]", t - base[(h, c)])

        def unfused(x, v):
            b_, hh, ww, cc = x.shape
            u = jax.image.resize(x, (b_, hh * 2, ww * 2, cc),
                                 method="nearest")
            return m.apply(v, u)

        t = timed(unfused, (x, v))
        rec(f"resize+conv[{h}^2x{c}]", t - base[(h, c)])

    # ---- dx_pack on the bare Block and down resblock at 512^2x64
    for pack in (True, False):
        fused_conv.DX_PACK_DEFAULT = pack
        blk = Block(64, norm_groups=32, fuse=True)
        x = x_of(512, 64)
        v = blk.init(key, x)
        t = timed(lambda x, v: blk.apply(v, x), (x, v))
        rec(f"block[512^2x64 pack={pack}]", t - base[(512, 64)])

        rbm = ResnetBlock(dim_out=64, norm_groups=32, fuse=True)
        vr = rbm.init(key, x, emb, False)
        t = timed(lambda x, v, e: rbm.apply(v, x, e, False)[0],
                  (x, vr, emb))
        rec(f"rb[512^2 64->64 pack={pack}]", t - base[(512, 64)])

        # ---- the hot up resblock under fuse_skip
        for fskip in (False, True):
            m2 = ResnetBlock(dim_out=64, norm_groups=32, fuse=True,
                             fuse_skip=fskip)
            xh = x_of(512, 128)
            x2 = x_of(512, 64)
            v2 = m2.init(key, xh, emb, False, x2=x2)
            t = timed(
                lambda x, v, e, x2: m2.apply(v, x, e, False, x2=x2)[0],
                (xh, v2, emb, x2))
            rec(f"rb_up[512^2 128+64->64 pack={pack} fskip={fskip}]",
                t - base[(512, 128)])
    fused_conv.DX_PACK_DEFAULT = True


if __name__ == "__main__" and "--up-levels" not in sys.argv:
    main()


def up_levels():
    """fuse_skip crossover at every up-level shape of the flagship."""
    import jax
    import jax.numpy as jnp

    from hsi_dmgasr_tpu.models.unet import ResnetBlock

    key = jax.random.PRNGKey(0)
    B, dt = 9, jnp.bfloat16
    emb = jax.random.normal(key, (B, 64), jnp.float32)

    def x_of(h, c):
        return jax.random.normal(key, (B, h, h, c), dt)

    shapes = [
        (512, 128, 64, 64), (512, 64, 64, 64),
        (256, 256, 128, 128), (256, 128, 128, 128), (256, 128, 64, 128),
        (128, 512, 256, 256), (128, 256, 256, 256), (128, 256, 128, 256),
        (64, 512, 512, 512), (64, 512, 256, 512),
    ]
    for h, cin, c2, cout in shapes:
        b = timed(lambda x: x, (x_of(h, cin),))
        row = {"shape": f"{h}^2 {cin}+{c2}->{cout}"}
        for fskip in (False, True):
            m = ResnetBlock(dim_out=cout, norm_groups=32, fuse=True,
                            fuse_skip=fskip)
            xh, x2 = x_of(h, cin), x_of(h, c2)
            v = m.init(key, xh, emb, False, x2=x2)
            t = timed(lambda x, v, e, x2: m.apply(v, x, e, False, x2=x2)[0],
                      (xh, v, emb, x2))
            row["fskip" if fskip else "concat"] = round((t - b) * 1e3, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__" and "--up-levels" in sys.argv:
    up_levels()
