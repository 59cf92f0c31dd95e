"""Spatially-sharded fused kernels: shard_map + halo exchange must
reproduce the single-device fused path exactly (VERDICT r2 item 2 —
round 2's spatial inference forfeited the Pallas kernels because GSPMD
cannot partition pallas_call; the manual halo contract fixes that)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from hsi_dmgasr_tpu.kernels.fused_conv import gn_swish_conv3x3
from hsi_dmgasr_tpu.parallel.spatial import (
    conv3x3_spatial,
    exchange_halo,
    up2_conv3x3_spatial,
)

N_SPACE = 4


@pytest.fixture(scope="module")
def space_mesh():
    devs = np.array(jax.devices()[:N_SPACE])
    return Mesh(devs, ("space",))


def _shmap(mesh, fn, in_specs, out_specs):
    return jax.jit(shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=False))


def test_conv3x3_spatial_matches_full(space_mesh):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16, 12, 8).astype(np.float32)
    k = rng.randn(3, 3, 8, 6).astype(np.float32) * 0.1
    b = rng.randn(6).astype(np.float32)

    want = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    fn = _shmap(
        space_mesh,
        functools.partial(conv3x3_spatial, axis_name="space"),
        (P(None, "space"), P(), P()), P(None, "space"),
    )
    got = fn(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_conv3x3_spatial_stride2_matches_full(space_mesh):
    rng = np.random.RandomState(1)
    x = rng.randn(1, 16, 12, 8).astype(np.float32)
    k = rng.randn(3, 3, 8, 8).astype(np.float32) * 0.1

    want = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    fn = _shmap(
        space_mesh,
        functools.partial(conv3x3_spatial, bias=None, axis_name="space",
                          stride=2),
        (P(None, "space"), P()), P(None, "space"),
    )
    got = fn(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_up2_conv3x3_spatial_matches_full(space_mesh):
    from hsi_dmgasr_tpu.ops.fused_up import up2_conv3x3

    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    k = rng.randn(3, 3, 4, 4).astype(np.float32) * 0.2
    b = rng.randn(4).astype(np.float32)

    want = up2_conv3x3(x, k, b)
    fn = _shmap(
        space_mesh,
        functools.partial(up2_conv3x3_spatial, axis_name="space"),
        (P(None, "space"), P(), P()), P(None, "space"),
    )
    got = fn(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cout,extras", [
    (16, "tb"),        # im2col branch + time bias
    (32, "res"),       # channel change + residual
])
def test_fused_kernel_sharded_matches_single(space_mesh, cout, extras):
    """gn_swish_conv3x3 under shard_map (halo rows + gathered per-row
    stats) == the same kernel on the full image."""
    rng = np.random.RandomState(3)
    b, h, w, c = 2, 16, 8, 16
    x = rng.randn(b, h, w, c).astype(np.float32)
    gn_scale = rng.rand(c).astype(np.float32) + 0.5
    gn_bias = rng.randn(c).astype(np.float32) * 0.1
    kernel = rng.randn(3, 3, c, cout).astype(np.float32) / np.sqrt(9 * c)
    bias = rng.randn(cout).astype(np.float32) * 0.1
    tb = (rng.randn(b, cout).astype(np.float32) if "tb" in extras else None)
    res = (rng.randn(b, h, w, cout).astype(np.float32)
           if "res" in extras else None)

    want = gn_swish_conv3x3(x, gn_scale, gn_bias, kernel, bias,
                            time_bias=tb, residual=res, num_groups=8,
                            interpret=True)

    def sharded(x, gn_scale, gn_bias, kernel, bias, tb, res):
        halo = exchange_halo(x, "space")
        return gn_swish_conv3x3(
            x, gn_scale, gn_bias, kernel, bias, time_bias=tb,
            residual=res, num_groups=8, interpret=True,
            axis_name="space", halo=halo,
        )

    fn = _shmap(
        space_mesh, sharded,
        (P(None, "space"), P(), P(), P(), P(), P(),
         P(None, "space") if res is not None else P()),
        P(None, "space"),
    )
    got = fn(x, gn_scale, gn_bias, kernel, bias, tb, res)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-4, atol=1e-4)


def test_fused_kernel_sharded_with_x2_and_stats(space_mesh):
    """Skip riding (x2) + stats chaining under sharding: emitted stats
    are local per-row partial sums; feeding them back through stats_in
    with axis_name must reproduce the unsharded chain."""
    rng = np.random.RandomState(4)
    b, h, w, c, c2, cout = 1, 16, 8, 16, 16, 16
    x = rng.randn(b, h, w, c).astype(np.float32)
    x2 = rng.randn(b, h, w, c2).astype(np.float32)
    gn_scale = rng.rand(c + c2).astype(np.float32) + 0.5
    gn_bias = rng.randn(c + c2).astype(np.float32) * 0.1
    kernel = (rng.randn(3, 3, c + c2, cout).astype(np.float32)
              / np.sqrt(9 * (c + c2)))
    bias = rng.randn(cout).astype(np.float32) * 0.1
    k2 = rng.randn(3, 3, cout, cout).astype(np.float32) / np.sqrt(9 * cout)
    b2 = rng.randn(cout).astype(np.float32) * 0.1
    gs2 = rng.rand(cout).astype(np.float32) + 0.5
    gb2 = rng.randn(cout).astype(np.float32) * 0.1

    def chain(x, x2, axis_name):
        halo = exchange_halo(x, axis_name) if axis_name else None
        halo2 = exchange_halo(x2, axis_name) if axis_name else None
        y, stats = gn_swish_conv3x3(
            x, gn_scale, gn_bias, kernel, bias, x2=x2, num_groups=8,
            interpret=True, emit_stats=True, axis_name=axis_name,
            halo=halo, halo2=halo2,
        )
        halo_y = exchange_halo(y, axis_name) if axis_name else None
        return gn_swish_conv3x3(
            y, gs2, gb2, k2, b2, stats_in=stats, num_groups=8,
            interpret=True, axis_name=axis_name, halo=halo_y,
        )

    want = chain(x, x2, None)
    fn = _shmap(
        space_mesh,
        functools.partial(chain, axis_name="space"),
        (P(None, "space"), P(None, "space")), P(None, "space"),
    )
    got = fn(x, x2)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-4, atol=1e-4)


def test_unet_spatial_sharded_matches_single(space_mesh):
    """The full fused SR3 UNet under shard_map spatial sharding (halo'd
    convs + bitwise gathered-row-stats GroupNorm + replicated attention
    + halo'd fused upsample) == the single-device fused UNet."""
    from hsi_dmgasr_tpu.models.unet import UNet

    kw = dict(
        in_channel=6, out_channel=3, inner_channel=8, norm_groups=4,
        channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0.0,
        image_size=16, fuse_blocks=True,
    )
    unet = UNet(**kw)
    unet_sp = UNet(**kw, spatial_axis="space")

    rng = np.random.RandomState(5)
    x = rng.randn(2, 16, 16, 6).astype(np.float32)
    t = rng.rand(2, 1).astype(np.float32)
    variables = unet.init(jax.random.PRNGKey(0), x, t)

    want = unet.apply(variables, x, t, train=False)

    def fwd(v, x, t):
        return unet_sp.apply(v, x, t, train=False)

    fn = _shmap(space_mesh, fwd,
                (P(), P(None, "space"), P()), P(None, "space"))
    got = fn(variables, x, t)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-4, atol=1e-4)


def test_fused_kernel_sharded_pair_geometry(space_mesh):
    """C == 64 sources take the W-pair-packed path (kernels/fused_conv
    pair geometry); halo rows are pair-reshaped inside the kernel
    wrapper, so the sharded pair forward must still match the full-image
    pair forward."""
    rng = np.random.RandomState(6)
    b, h, w, c, cout = 1, 16, 8, 64, 64
    x = rng.randn(b, h, w, c).astype(np.float32)
    gn_scale = rng.rand(c).astype(np.float32) + 0.5
    gn_bias = rng.randn(c).astype(np.float32) * 0.1
    kernel = rng.randn(3, 3, c, cout).astype(np.float32) / np.sqrt(9 * c)
    bias = rng.randn(cout).astype(np.float32) * 0.1
    tb = rng.randn(b, cout).astype(np.float32)

    want = gn_swish_conv3x3(x, gn_scale, gn_bias, kernel, bias,
                            time_bias=tb, num_groups=8, interpret=True)

    def sharded(x, gn_scale, gn_bias, kernel, bias, tb):
        halo = exchange_halo(x, "space")
        return gn_swish_conv3x3(
            x, gn_scale, gn_bias, kernel, bias, time_bias=tb,
            num_groups=8, interpret=True, axis_name="space", halo=halo,
        )

    fn = _shmap(
        space_mesh, sharded,
        (P(None, "space"), P(), P(), P(), P(), P()), P(None, "space"),
    )
    got = fn(x, gn_scale, gn_bias, kernel, bias, tb)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-4, atol=1e-4)
