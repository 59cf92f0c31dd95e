"""Fused GN+swish+conv3x3 Pallas kernel vs the unfused flax Block."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from hsi_dmgasr_tpu.kernels.fused_conv import gn_swish_conv3x3


def _unfused(x, gn_scale, gn_bias, kernel, bias, time_bias=None,
             residual=None, num_groups=8):
    gn = nn.GroupNorm(num_groups=num_groups, epsilon=1e-5)
    y = gn.apply({"params": {"scale": gn_scale, "bias": gn_bias}},
                 x.astype(jnp.float32))
    y = y * jax.nn.sigmoid(y)
    y = jax.lax.conv_general_dilated(
        y.astype(jnp.float32), kernel.astype(jnp.float32),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    if time_bias is not None:
        y = y + time_bias[:, None, None, :]
    if residual is not None:
        y = y + residual
    return y


@pytest.mark.parametrize("shape,cout,extras", [
    ((2, 16, 16, 16), 16, "none"),       # square, C==Cout
    ((1, 24, 16, 16), 32, "tb"),         # rectangular, channel change
    ((2, 8, 8, 16), 16, "tb+res"),       # H == rows edge case
    ((1, 40, 24, 32), 16, "res"),        # odd slab division
    ((1, 8, 8, 128), 16, "tb"),          # C%128==0: dy-split matmul path
    # dx_pack gate (Cout < 128 and Cout % 64 == 0): the flagship's hot
    # shape class — packed (M,3C)x(3C,3*Cout) matmul + lane-slice +
    # output-roll (ADVICE r2: this branch previously ran untested)
    ((1, 16, 8, 32), 64, "tb"),          # dx_pack via im2col branch
    ((1, 8, 8, 128), 64, "res"),         # dx_pack via dy-split branch
    ((1, 16, 8, 64), 64, "tb+res"),      # C==64 dy-split: the flagship
                                         # 512^2-level hot shape
    ((1, 8, 8, 64), 16, "none"),         # C==64 dy-split, no dx_pack
])
def test_fused_matches_unfused(shape, cout, extras):
    rng = np.random.RandomState(0)
    b, h, w, c = shape
    x = rng.randn(*shape).astype(np.float32)
    gn_scale = rng.rand(c).astype(np.float32) + 0.5
    gn_bias = rng.randn(c).astype(np.float32) * 0.1
    kernel = (rng.randn(3, 3, c, cout).astype(np.float32)
              / np.sqrt(9 * c))
    bias = rng.randn(cout).astype(np.float32) * 0.1
    tb = (rng.randn(b, cout).astype(np.float32)
          if "tb" in extras else None)
    res = (rng.randn(b, h, w, cout).astype(np.float32)
           if "res" in extras else None)

    want = _unfused(x, gn_scale, gn_bias, kernel, bias, tb, res)
    got = gn_swish_conv3x3(
        x, gn_scale, gn_bias, kernel, bias, time_bias=tb, residual=res,
        num_groups=8, interpret=True,
    )
    assert got.shape == want.shape
    # kernel computes in bf16 between prologue and matmul
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.05, rtol=0.05
    )


def test_fused_two_source_concat():
    """x2 fusion == Block on the materialized concat (up-path skips)."""
    rng = np.random.RandomState(3)
    b, h, w, c1, c2, cout = 2, 16, 16, 16, 8, 16
    x = rng.randn(b, h, w, c1).astype(np.float32)
    x2 = rng.randn(b, h, w, c2).astype(np.float32)
    c = c1 + c2
    gn_scale = rng.rand(c).astype(np.float32) + 0.5
    gn_bias = rng.randn(c).astype(np.float32) * 0.1
    kernel = rng.randn(3, 3, c, cout).astype(np.float32) / np.sqrt(9 * c)
    bias = rng.randn(cout).astype(np.float32) * 0.1
    want = _unfused(np.concatenate([x, x2], -1), gn_scale, gn_bias,
                    kernel, bias)
    got = gn_swish_conv3x3(x, gn_scale, gn_bias, kernel, bias, x2=x2,
                           num_groups=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=0.05, rtol=0.05)


def test_fused_stats_chaining():
    """emit_stats yields exact per-ROW [sum, sumsq] of the output, and
    feeding them back via stats_in reproduces the stats-read path."""
    rng = np.random.RandomState(4)
    b, h, w, c = 2, 16, 16, 16
    x = rng.randn(b, h, w, c).astype(np.float32)
    gn_scale = np.ones(c, np.float32)
    gn_bias = np.zeros(c, np.float32)
    kernel = rng.randn(3, 3, c, c).astype(np.float32) / np.sqrt(9 * c)
    bias = np.zeros(c, np.float32)
    out, stats = gn_swish_conv3x3(x, gn_scale, gn_bias, kernel, bias,
                                  num_groups=8, interpret=True,
                                  emit_stats=True)
    of = np.asarray(out, np.float32)
    assert stats.shape == (b, h, 2, c)
    np.testing.assert_allclose(np.asarray(stats[:, :, 0]),
                               of.sum(2), rtol=2e-2, atol=1e-2)
    np.testing.assert_allclose(np.asarray(stats[:, :, 1]),
                               (of ** 2).sum(2), rtol=2e-2, atol=1e-2)
    # chained second block == second block with its own stats read
    want = gn_swish_conv3x3(of, gn_scale, gn_bias, kernel, bias,
                            num_groups=8, interpret=True)
    got = gn_swish_conv3x3(of, gn_scale, gn_bias, kernel, bias,
                           stats_in=stats, num_groups=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.05, rtol=0.05)


def test_fused_unet_matches_unfused():
    """Whole-UNet equality: fuse_blocks=True must match the unfused
    forward (same params) to bf16 tolerance, incl. time-bias and
    residual fusion inside every resblock."""
    from hsi_dmgasr_tpu.models.unet import UNet

    kw = dict(in_channel=6, out_channel=3, inner_channel=16,
              norm_groups=8, channel_mults=(1, 2), attn_res=(8,),
              res_blocks=1, dropout=0.1, image_size=16)
    rng = np.random.RandomState(2)
    x = rng.rand(2, 16, 16, 6).astype(np.float32)
    t = np.array([[0.4], [0.8]], np.float32)

    base = UNet(**kw)
    variables = base.init(jax.random.PRNGKey(0), x, t)
    want = base.apply(variables, x, t)
    got = UNet(**kw, fuse_blocks=True).apply(variables, x, t)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=0.02, rtol=0.05
    )


def test_fused_bf16_roundtrip_quality():
    """End-to-end agreement in dB at a flagship-like (scaled) shape."""
    rng = np.random.RandomState(1)
    b, h, w, c = 2, 32, 32, 32
    x = rng.randn(b, h, w, c).astype(np.float32)
    gn_scale = np.ones(c, np.float32)
    gn_bias = np.zeros(c, np.float32)
    kernel = rng.randn(3, 3, c, c).astype(np.float32) / np.sqrt(9 * c)
    bias = np.zeros(c, np.float32)
    want = np.asarray(_unfused(x, gn_scale, gn_bias, kernel, bias))
    got = np.asarray(gn_swish_conv3x3(
        x, gn_scale, gn_bias, kernel, bias, num_groups=8, interpret=True,
    ), np.float32)
    err = np.sqrt(np.mean((got - want) ** 2))
    sig = np.sqrt(np.mean(want ** 2))
    snr_db = 20 * np.log10(sig / (err + 1e-12))
    assert snr_db > 35, f"fused kernel SNR too low: {snr_db:.1f} dB"


def test_up2_conv3x3_matches_resize_then_conv():
    """ops/fused_up.up2_conv3x3 == conv3x3(nearest_x2(x)) exactly
    (same math, float-order tolerance)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from hsi_dmgasr_tpu.ops.fused_up import up2_conv3x3

    rng = np.random.RandomState(0)
    for (h, w, c, cout) in [(8, 8, 16, 16), (5, 7, 8, 4), (16, 16, 32, 32)]:
        x = jnp.asarray(rng.randn(2, h, w, c), jnp.float32)
        k = jnp.asarray(rng.randn(3, 3, c, cout) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)

        up = jax.image.resize(x, (2, h * 2, w * 2, c), method="nearest")
        ref = jax.lax.conv_general_dilated(
            up, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        got = up2_conv3x3(x, k, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_unet_fused_up_path_matches_unfused():
    """UNet with fuse_blocks (which now also fuses the up-boundary)
    must match the unfused UNet on the same params."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from hsi_dmgasr_tpu.models.unet import UNet

    kw = dict(in_channel=6, out_channel=3, inner_channel=8, norm_groups=4,
              channel_mults=(1, 2), attn_res=(4,), res_blocks=1,
              image_size=16)
    net = UNet(**kw)
    net_f = UNet(**kw, fuse_blocks=True)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 6), jnp.float32)
    t = jnp.full((2, 1), 0.5, jnp.float32)
    v = net.init(jax.random.PRNGKey(0), x, t)
    ref = net.apply(v, x, t)
    got = net_f.apply(v, x, t)
    # tolerance is set by the fused resblocks' bf16 matmuls (the
    # up-boundary fusion itself is exact, see the test above)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


def test_fused_res_conv_folding_matches_unfused():
    """Resblocks with channel changes fold the 1x1 res_conv into the
    fused kernel; output must match the unfused resblock."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from hsi_dmgasr_tpu.models.unet import ResnetBlock

    rng = np.random.RandomState(3)
    emb = jnp.asarray(rng.randn(2, 16), jnp.float32)
    for (cin, c2, cout) in [(8, 0, 16), (8, 8, 4), (16, 4, 8), (8, 0, 8)]:
        x = jnp.asarray(rng.rand(2, 12, 12, cin), jnp.float32)
        x2 = (jnp.asarray(rng.rand(2, 12, 12, c2), jnp.float32)
              if c2 else None)
        ref_m = ResnetBlock(dim_out=cout, norm_groups=4)
        fus_m = ResnetBlock(dim_out=cout, norm_groups=4, fuse=True,
                            fuse_skip=bool(c2))
        v = ref_m.init(jax.random.PRNGKey(0), x, emb, False, x2=x2)
        ref, _ = ref_m.apply(v, x, emb, False, x2=x2)
        got, _ = fus_m.apply(v, x, emb, False, x2=x2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)


def test_fused_x2_stats_chaining():
    """stats_in2 (skip-tensor moments riding the UNet skip stack) must
    reproduce the x2 stats-read path."""
    rng = np.random.RandomState(7)
    b, h, w, c1, c2, cout = 2, 16, 16, 16, 8, 16
    x = rng.randn(b, h, w, c1).astype(np.float32)
    x2 = rng.randn(b, h, w, c2).astype(np.float32)
    c = c1 + c2
    gn_scale = rng.rand(c).astype(np.float32) + 0.5
    gn_bias = rng.randn(c).astype(np.float32) * 0.1
    kernel = rng.randn(3, 3, c, cout).astype(np.float32) / np.sqrt(9 * c)
    bias = rng.randn(cout).astype(np.float32) * 0.1
    want = gn_swish_conv3x3(x, gn_scale, gn_bias, kernel, bias, x2=x2,
                            num_groups=8, interpret=True)
    s2 = np.stack([x2.sum(2), (x2.astype(np.float64) ** 2)
                   .sum(2).astype(np.float32)], axis=2)
    got = gn_swish_conv3x3(x, gn_scale, gn_bias, kernel, bias, x2=x2,
                           stats_in2=jnp.asarray(s2), num_groups=8,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.02, rtol=0.02)


def test_fused_pair_x2_res_stats():
    """W-pair-packed geometry (C == 64 sources ride (W/2, 128) lanes)
    with every extra at once: two 64-channel sources, folded 1x1 res
    projection, emitted per-row stats chained into a second pair block.
    This is the flagship 512^2-level up-resblock structure."""
    rng = np.random.RandomState(11)
    b, h, w, c, cout = 1, 8, 16, 64, 64
    x = rng.randn(b, h, w, c).astype(np.float32)
    x2 = rng.randn(b, h, w, c).astype(np.float32)
    ct = 2 * c
    gn_scale = rng.rand(ct).astype(np.float32) + 0.5
    gn_bias = rng.randn(ct).astype(np.float32) * 0.1
    kernel = rng.randn(3, 3, ct, cout).astype(np.float32) / np.sqrt(9 * ct)
    bias = rng.randn(cout).astype(np.float32) * 0.1
    tb = rng.randn(b, cout).astype(np.float32)
    rk = rng.randn(1, 1, ct, cout).astype(np.float32) * 0.2
    rb = rng.randn(cout).astype(np.float32) * 0.1

    xc = np.concatenate([x, x2], -1)
    want = _unfused(xc, gn_scale, gn_bias, kernel, bias, tb)
    want_res = (
        xc.reshape(-1, ct) @ rk.reshape(ct, cout) + rb
    ).reshape(b, h, w, cout)

    got, stats, got_res = gn_swish_conv3x3(
        x, gn_scale, gn_bias, kernel, bias, time_bias=tb, x2=x2,
        num_groups=8, interpret=True, emit_stats=True,
        res_kernel=rk, res_bias=rb,
    )
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=0.05, rtol=0.05)
    np.testing.assert_allclose(np.asarray(got_res, np.float32), want_res,
                               atol=0.05, rtol=0.05)
    # pair stats fold back to logical per-row [sum, sumsq]
    of = np.asarray(got, np.float32)
    assert stats.shape == (b, h, 2, cout)
    np.testing.assert_allclose(np.asarray(stats[:, :, 0]), of.sum(2),
                               rtol=2e-2, atol=2e-2)
    # chained second pair block == the same block with its own stats read
    gs2 = rng.rand(cout).astype(np.float32) + 0.5
    gb2 = rng.randn(cout).astype(np.float32) * 0.1
    k2 = rng.randn(3, 3, cout, cout).astype(np.float32) / np.sqrt(9 * cout)
    b2 = rng.randn(cout).astype(np.float32) * 0.1
    chained = gn_swish_conv3x3(of, gs2, gb2, k2, b2, stats_in=stats,
                               num_groups=8, interpret=True)
    fresh = gn_swish_conv3x3(of, gs2, gb2, k2, b2, num_groups=8,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(chained, np.float32),
                               np.asarray(fresh, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_fused_pair_cout128():
    """Pair geometry with a channel change (the 256^2 64->128 block1)."""
    rng = np.random.RandomState(12)
    b, h, w, c, cout = 2, 8, 8, 64, 128
    x = rng.randn(b, h, w, c).astype(np.float32)
    gn_scale = rng.rand(c).astype(np.float32) + 0.5
    gn_bias = rng.randn(c).astype(np.float32) * 0.1
    kernel = rng.randn(3, 3, c, cout).astype(np.float32) / np.sqrt(9 * c)
    bias = rng.randn(cout).astype(np.float32) * 0.1
    want = _unfused(x, gn_scale, gn_bias, kernel, bias)
    got = gn_swish_conv3x3(x, gn_scale, gn_bias, kernel, bias,
                           num_groups=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), atol=0.05, rtol=0.05)


@pytest.mark.parametrize("c,c2,cout", [
    (64, 0, 64),    # pair dy-split
    (64, 64, 64),   # pair + skip (the flagship 512^2 up-resblock)
    (32, 0, 16),    # im2col branch
    (128, 0, 128),  # dy-split, Cout fills the N tile
    (64, 0, 3),     # final conv (Cout padded to 64)
])
def test_inc_epilogue_matches_default(c, c2, cout):
    """inc_epilogue (per-dx partials placed straight into one f32
    accumulator — the low-VMEM variant that allows bigger row slabs)
    is bitwise-equal on outputs to the default epilogue."""
    rng = np.random.RandomState(13)
    b, h, w = 2, 8, 16
    x = rng.randn(b, h, w, c).astype(np.float32)
    x2 = rng.randn(b, h, w, c2).astype(np.float32) if c2 else None
    ct = c + c2
    gn_scale = rng.rand(ct).astype(np.float32) + 0.5
    gn_bias = rng.randn(ct).astype(np.float32) * 0.1
    kernel = rng.randn(3, 3, ct, cout).astype(np.float32) / np.sqrt(9 * ct)
    bias = rng.randn(cout).astype(np.float32) * 0.1
    tb = rng.randn(b, cout).astype(np.float32)
    rk = rng.randn(1, 1, ct, cout).astype(np.float32) * 0.2

    outs = {}
    for inc in (False, True):
        o = gn_swish_conv3x3(
            x, gn_scale, gn_bias, kernel, bias, time_bias=tb, x2=x2,
            num_groups=8, interpret=True, emit_stats=True, res_kernel=rk,
            inc_epilogue=inc,
        )
        outs[inc] = [np.asarray(v, np.float32) for v in o]
    # the two (distinct) kernels accumulate in different f32 orders —
    # with a second source the reassociation can flip the bf16 rounding
    # of outputs by one ulp (~0.8% relative); single-source cases come
    # out bitwise-equal in practice
    np.testing.assert_allclose(outs[False][0], outs[True][0],
                               rtol=1e-2, atol=1e-6)
    np.testing.assert_allclose(outs[False][2], outs[True][2],
                               rtol=1e-2, atol=1e-6)
    np.testing.assert_allclose(outs[False][1], outs[True][1],
                               rtol=1e-4, atol=1e-4)


def test_pick_rows_vmem_calibration():
    """The row picker's VMEM calibration (measured on v5e, see
    _pick_rows docstring): resident kernel weights come out of the inc
    budget, and the auto policy demotes inc when it cannot buy a bigger
    slab than the default epilogue's pick."""
    from hsi_dmgasr_tpu.kernels.fused_conv import _pick_rows

    # 64^2 C_total=1024 Cout=512 up-block: kmat+rk ~ 10 MB resident;
    # blind 16-row inc slabs OOM'ed the scoped-vmem compile (17.5 MB vs
    # the 16 MB limit). The weight-charged pick must stay below the
    # default epilogue's 4 rows so the auto policy demotes to default.
    fx = 18 * 1024 * 512 + 1024 * 512 * 2
    r_inc = _pick_rows(64, 64, 1024, 512, inc=True, fixed_bytes=fx,
                       emit_res=True)
    r_def = _pick_rows(64, 64, 1024, 512)
    assert r_inc <= r_def == 4, (r_inc, r_def)

    # 512^2 pair-relabeled block (W=256, C=128, Cout=128): inc exists to
    # buy bigger slabs here (measured 1.4x at the Cout>=128 shapes)
    fx = 18 * 128 * 128
    r_inc = _pick_rows(512, 256, 128, 128, inc=True, fixed_bytes=fx)
    r_def = _pick_rows(512, 256, 128, 128)
    assert r_inc > r_def, (r_inc, r_def)
    assert r_inc <= 16  # rows=32 fails to compile on v5e

    # divisor-of-H contract
    for h in (64, 192, 512):
        r = _pick_rows(h, 256, 128, 128, inc=True, fixed_bytes=fx)
        assert h % r == 0


def test_thin_output_lowering_matches_unfused():
    """gn_swish_conv3x3_thin (the XLA final_conv lowering, Cout=3)
    matches the unfused Block, with and without chained stats_in."""
    from hsi_dmgasr_tpu.kernels.fused_conv import (
        _row_moments,
        gn_swish_conv3x3_thin,
    )

    rng = np.random.RandomState(7)
    b, h, w, c, cout = 2, 16, 12, 16, 3
    x = rng.randn(b, h, w, c).astype(np.float32)
    gn_scale = rng.rand(c).astype(np.float32) + 0.5
    gn_bias = rng.randn(c).astype(np.float32) * 0.1
    kernel = rng.randn(3, 3, c, cout).astype(np.float32) / np.sqrt(9 * c)
    bias = rng.randn(cout).astype(np.float32) * 0.1

    want = _unfused(x, gn_scale, gn_bias, kernel, bias, num_groups=8)
    got = gn_swish_conv3x3_thin(x, gn_scale, gn_bias, kernel, bias,
                                num_groups=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    stats = jnp.asarray(_row_moments(jnp.asarray(x)))
    got2 = gn_swish_conv3x3_thin(x, gn_scale, gn_bias, kernel, bias,
                                 stats_in=stats, num_groups=8)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_thin_output_lowering_spatial_matches_single():
    """The thin lowering under H-sharding (halo rows + global stats)
    equals its single-device output."""
    import functools

    from jax.experimental.shard_map import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from hsi_dmgasr_tpu.kernels.fused_conv import gn_swish_conv3x3_thin

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = Mesh(np.array(jax.devices()[:4]), ("space",))

    rng = np.random.RandomState(9)
    b, h, w, c, cout = 2, 16, 12, 16, 3
    x = rng.randn(b, h, w, c).astype(np.float32)
    gn_scale = rng.rand(c).astype(np.float32) + 0.5
    gn_bias = rng.randn(c).astype(np.float32) * 0.1
    kernel = rng.randn(3, 3, c, cout).astype(np.float32) / np.sqrt(9 * c)
    bias = rng.randn(cout).astype(np.float32) * 0.1

    want = gn_swish_conv3x3_thin(x, gn_scale, gn_bias, kernel, bias,
                                 num_groups=8)
    fn = jax.jit(shard_map(
        functools.partial(gn_swish_conv3x3_thin, num_groups=8,
                          axis_name="space"),
        mesh=mesh,
        in_specs=(P(None, "space"), P(), P(), P(), P()),
        out_specs=P(None, "space"), check_rep=False))
    got = fn(x, gn_scale, gn_bias, kernel, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
