"""SR3/DDPM denoising UNet (Flax, NHWC).

One module covers both reference variants, selected by flags
(model/networks.py:85-88 picks per config ``which_model_G``):

  * ``time_embedding='continuous'`` — SR3: a WaveGrad-style positional
    encoding of the continuous noise level γ (sr3_modules/unet.py:18-31),
    injected per-resblock by FeatureWiseAffine (34-50).
  * ``time_embedding='discrete'`` — DDPM: sinusoidal embedding of the
    integer timestep (ddpm_modules/unet.py:19-34), injected additively
    after a Swish+Linear head (85-95).
  * ``norm='group'|'batch'`` — sr3 uses GroupNorm(32); the ddpm variant
    swaps in BatchNorm (ddpm_modules/unet.py:64-77).

Architecture parity (sr3_modules/unet.py:162-263): the skip stack
receives the output of EVERY down layer (initial conv, each resblock,
each downsample); each up level consumes res_blocks+1 skips.

Self-attention (sr3_modules/unet.py:114-143) is computed over flattened
H*W tokens with a fused softmax(QK^T/sqrt(C))V — no materialized
(H,W,H,W) tensor — and dispatches to the Pallas flash kernel for large
token counts (kernels/attention.py).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import Conv2d, Dense


def swish(x):
    return x * jax.nn.sigmoid(x)


def continuous_noise_encoding(noise_level, dim):
    """WaveGrad positional encoding of γ (sr3_modules/unet.py:18-31).

    noise_level: (B, 1) -> (B, dim) as [sin(γ·e^-k), cos(γ·e^-k)].
    """
    count = dim // 2
    step = jnp.arange(count, dtype=noise_level.dtype) / count
    enc = noise_level * jnp.exp(-math.log(1e4) * step)[None, :]
    return jnp.concatenate([jnp.sin(enc), jnp.cos(enc)], axis=-1)


def discrete_time_encoding(t, dim):
    """Sinusoidal embedding of integer t (ddpm_modules/unet.py:19-34)."""
    inv_freq = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim)
    )
    sin_in = t.reshape(-1).astype(jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.concatenate([jnp.sin(sin_in), jnp.cos(sin_in)], axis=-1)


class GN(nn.Module):
    """GroupNorm with nn.GroupNorm-compatible params (scale/bias) that
    can hand its raw params to the fused Pallas kernel."""

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, params_only=False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if params_only:
            return scale, bias
        g = self.num_groups
        xf = x.astype(jnp.float32).reshape(*x.shape[:-1], g, c // g)
        mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4),
                       keepdims=True)
        xn = ((xf - mean) * jax.lax.rsqrt(var + self.epsilon)).reshape(x.shape)
        return (xn * scale + bias).astype(x.dtype)


class Norm(nn.Module):
    """GroupNorm(32) or BatchNorm switch, torch-compatible params."""

    channels: int
    norm: str = "group"
    norm_groups: int = 32

    @nn.compact
    def __call__(self, x, train=False, params_only=False):
        if self.norm == "group":
            return GN(
                num_groups=self.norm_groups, epsilon=1e-5, name="gn"
            )(x, params_only=params_only)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)


class Block(nn.Module):
    """norm -> swish -> dropout -> 3x3 conv (sr3_modules/unet.py:80-91).

    With ``fuse=True`` (inference, GroupNorm, no dropout) the whole
    chain — plus an optional per-batch ``time_bias`` and ``residual``
    add — runs as ONE Pallas kernel (kernels/fused_conv.py), cutting
    the HBM passes that make the sampler memory-bound. Param tree is
    identical to the unfused path.
    """

    dim_out: int
    norm_groups: int = 32
    dropout: float = 0.0
    norm: str = "group"
    fuse: bool = False
    # shard_map spatial axis: H is sharded over this mesh axis; the
    # fused kernel gets neighbor halo rows + pmean'ed GroupNorm stats
    spatial_axis: str | None = None

    @nn.compact
    def __call__(self, x, train=False, time_bias=None, residual=None,
                 x2=None, stats_in=None, emit_stats=False,
                 res_kernel=None, res_bias=None, stats_in2=None):
        """x2: second source channel-concatenated with x (the up-path
        skip) — the fused kernel reads it in place, the unfused path
        concatenates. stats_in / emit_stats: per-channel [sum, sumsq]
        chaining between consecutive fused Blocks. res_kernel/res_bias:
        fold the resblock's 1x1 res_conv of the RAW input into the same
        pass; the projection is appended to the returned tuple."""
        c_total = x.shape[-1] + (x2.shape[-1] if x2 is not None else 0)
        fuse = (self.fuse and not train and self.norm == "group"
                and c_total % self.norm_groups == 0
                and not self.is_initializing())
        if self.spatial_axis and not self.is_initializing() and not fuse:
            raise NotImplementedError(
                "spatial_axis requires the fused inference path "
                "(fuse=True, GroupNorm, channels % norm_groups == 0)"
            )
        if fuse:
            from ..kernels.fused_conv import gn_swish_conv3x3

            gn_scale, gn_bias = Norm(
                c_total, self.norm, self.norm_groups, name="norm"
            )(jnp.zeros((1, 1, 1, c_total), x.dtype), train,
              params_only=True)
            kernel, cbias = Conv2d(self.dim_out, 3, name="conv")(
                jnp.zeros((1, 1, 1, c_total), x.dtype), params_only=True
            )
            halo = halo2 = None
            if self.spatial_axis:
                from ..parallel.spatial import exchange_halo

                halo = exchange_halo(x, self.spatial_axis)
                if x2 is not None:
                    halo2 = exchange_halo(x2, self.spatial_axis)
            import os as _os
            if (self.dim_out * 2 <= 64 and stats_in is not None
                    and x2 is None and residual is None
                    and time_bias is None and res_kernel is None
                    and not emit_stats
                    and _os.environ.get("HSI_THIN_FINAL")):
                # thin-output blocks (final_conv 64->3): the Pallas
                # kernel pads Cout to 64 and wastes 43x the MACs, and
                # the ISOLATED probe showed the XLA lowering 1.5x
                # faster (tools/probe_final_block.py). But composed
                # into the full sampler graph it REGRESSED the 512^2
                # T=20 chain 2.627->2.755 s (measured round 5 — the
                # lowering breaks XLA's fusion around the step
                # boundary), so it is opt-in via HSI_THIN_FINAL=1.
                # Composed measurement beats isolated probes.
                from ..kernels.fused_conv import gn_swish_conv3x3_thin

                return gn_swish_conv3x3_thin(
                    x, gn_scale, gn_bias, kernel, cbias,
                    stats_in=stats_in, num_groups=self.norm_groups,
                    axis_name=self.spatial_axis, halo=halo,
                )
            interpret = jax.devices()[0].platform == "cpu"
            result = gn_swish_conv3x3(
                x, gn_scale, gn_bias, kernel, cbias,
                time_bias=time_bias, residual=residual, x2=x2,
                stats_in=stats_in, num_groups=self.norm_groups,
                interpret=interpret, emit_stats=emit_stats,
                res_kernel=res_kernel, res_bias=res_bias,
                stats_in2=stats_in2, axis_name=self.spatial_axis,
                halo=halo, halo2=halo2,
            )
            if isinstance(result, (list, tuple)):
                return tuple(result)
            return result
        res_out = None
        if res_kernel is not None:
            # unfused fallback for the folded res projection
            xin = (jnp.concatenate([x, x2], axis=-1)
                   if x2 is not None else x)
            res_out = jax.lax.conv_general_dilated(
                xin, res_kernel.astype(xin.dtype), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if res_bias is not None:
                res_out = res_out + res_bias.astype(res_out.dtype)
        if x2 is not None:
            x = jnp.concatenate([x, x2], axis=-1)
        x = Norm(x.shape[-1], self.norm, self.norm_groups, name="norm")(x, train)
        x = swish(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        y = Conv2d(self.dim_out, 3, name="conv")(x)
        if time_bias is not None:
            y = y + time_bias[:, None, None, :]
        if residual is not None:
            y = y + residual
        out = [y]
        if emit_stats:
            yf = y.astype(jnp.float32)
            out.append(jnp.stack(
                [jnp.sum(yf, axis=(1, 2)),
                 jnp.sum(jnp.square(yf), axis=(1, 2))], axis=1
            ))
        if res_out is not None:
            out.append(res_out)
        return out[0] if len(out) == 1 else tuple(out)


class NoiseInjection(nn.Module):
    """Time/noise-level conditioning of a resblock.

    continuous (SR3 FeatureWiseAffine, sr3_modules/unet.py:34-50):
      x + Linear(emb)  (or affine (1+γ)x+β with use_affine_level)
    discrete (ddpm ResnetBlock.mlp, ddpm_modules/unet.py:82-95):
      x + Linear(swish(emb))
    """

    dim_out: int
    use_affine_level: bool = False
    discrete: bool = False

    @nn.compact
    def __call__(self, x, emb, bias_only=False):
        if self.discrete:
            h = Dense(self.dim_out, name="func")(swish(emb))
            return h if bias_only else x + h[:, None, None, :]
        if self.use_affine_level:
            assert not bias_only, "affine conditioning is not a pure bias"
            h = Dense(self.dim_out * 2, name="func")(emb)
            gamma, beta = jnp.split(h[:, None, None, :], 2, axis=-1)
            return (1 + gamma) * x + beta
        h = Dense(self.dim_out, name="func")(emb)
        return h if bias_only else x + h[:, None, None, :]


class ResnetBlock(nn.Module):
    """block1 -> noise injection -> block2 -> +res_conv(x)
    (sr3_modules/unet.py:94-111)."""

    dim_out: int
    norm_groups: int = 32
    dropout: float = 0.0
    use_affine_level: bool = False
    norm: str = "group"
    discrete: bool = False
    fuse: bool = False
    # x2 rides the kernel vs materialized concat; 'auto' = only when
    # dim_out under-fills the 128-lane N tile (measured: wins 20.3 vs
    # 25.1 ms at 512^2 128+64->64, loses at the >=128-channel levels)
    fuse_skip: object = "auto"
    fuse_stats: bool = True  # chain GroupNorm moments between blocks
    spatial_axis: str | None = None

    @nn.compact
    def __call__(self, x, emb, train=False, x2=None, stats_in=None,
                 emit_stats=False, x2_stats=None):
        """x2: up-path skip tensor, logically concatenated with x
        (unet.py:257-261); the fused path never materializes the concat.
        stats_in: per-channel [sum, sumsq] of x from the previous fused
        block; emit_stats: also return this resblock's output moments
        (cross-resblock chaining — every chained GroupNorm saves one
        full HBM stats read)."""
        fuse = (self.fuse and not train and self.norm == "group"
                and not self.use_affine_level
                and not self.is_initializing())
        if self.spatial_axis and not fuse and not self.is_initializing():
            raise NotImplementedError(
                "spatial_axis requires the fused inference path"
            )
        fuse_skip = (self.dim_out < 128 if self.fuse_skip == "auto"
                     else bool(self.fuse_skip))
        if fuse and x2 is not None and not fuse_skip:
            x = jnp.concatenate([x, x2], axis=-1)
            x2 = None
            # the concat's channel moments are the concatenation of the
            # two sources' moments — keep the chain alive when both are
            # known (saves the stats read over the widest tensors)
            if stats_in is not None and x2_stats is not None:
                stats_in = jnp.concatenate([stats_in, x2_stats], axis=-1)
            else:
                stats_in = None
            x2_stats = None
        if not self.fuse_stats:
            stats_in, emit_stats = None, False
        c_in = x.shape[-1] + (x2.shape[-1] if x2 is not None else 0)
        if fuse:
            # the time conditioning is a pure per-(b, c) bias and the
            # residual a plain add — both ride the fused Block's
            # epilogue; block1 also emits its output's channel moments
            # (block2's GroupNorm needs no extra HBM stats read) and,
            # when channels change, the 1x1 res_conv projection of the
            # RAW input (no separate read pass over [x, x2])
            tb = (NoiseInjection(
                self.dim_out, self.use_affine_level, self.discrete,
                name="noise_func")(None, emb, bias_only=True)
                if emb is not None else None)
            res_k = res_b = None
            if c_in != self.dim_out:
                res_k, res_b = Conv2d(self.dim_out, 1, name="res_conv")(
                    jnp.zeros((1, 1, 1, c_in), x.dtype), params_only=True
                )
            b1 = Block(self.dim_out, self.norm_groups, norm=self.norm,
                       fuse=True, spatial_axis=self.spatial_axis,
                       name="block1")(
                x, train, time_bias=tb, x2=x2,
                emit_stats=self.fuse_stats, stats_in=stats_in,
                res_kernel=res_k, res_bias=res_b,
                stats_in2=x2_stats if self.fuse_stats else None)
            parts = list(b1) if isinstance(b1, (list, tuple)) else [b1]
            h = parts.pop(0)
            s1 = parts.pop(0) if self.fuse_stats else None
            if res_k is not None:
                res = parts.pop(0)
            else:
                res = (jnp.concatenate([x, x2], axis=-1)
                       if x2 is not None else x)
            out = Block(self.dim_out, self.norm_groups, self.dropout,
                        self.norm, fuse=True,
                        spatial_axis=self.spatial_axis, name="block2")(
                h, train, residual=res, stats_in=s1,
                emit_stats=emit_stats)
            return out if emit_stats else (out, None)
        if c_in != self.dim_out:
            xin = (jnp.concatenate([x, x2], axis=-1)
                   if x2 is not None else x)
            res = Conv2d(self.dim_out, 1, name="res_conv")(xin)
        else:
            res = (jnp.concatenate([x, x2], axis=-1)
                   if x2 is not None else x)
        if x2 is not None:
            x = jnp.concatenate([x, x2], axis=-1)
        h = Block(self.dim_out, self.norm_groups, norm=self.norm, name="block1")(x, train)
        if emb is not None:
            h = NoiseInjection(
                self.dim_out, self.use_affine_level, self.discrete, name="noise_func"
            )(h, emb)
        h = Block(
            self.dim_out, self.norm_groups, self.dropout, self.norm, name="block2"
        )(h, train)
        return h + res, None


class SelfAttention(nn.Module):
    """Full-spatial single/multi-head attention (sr3_modules/unet.py:114-143).

    The reference materializes a (B, heads, H, W, H, W) tensor; here QK^T
    runs over flattened tokens with softmax fused by XLA (or the Pallas
    flash kernel via kernels.attention for long sequences). Scale is
    1/sqrt(C) over the FULL channel count, as in the reference.
    """

    channels: int
    n_head: int = 1
    norm_groups: int = 32
    norm: str = "group"
    spatial_axis: str | None = None

    @nn.compact
    def __call__(self, x, train=False):
        sharded = bool(self.spatial_axis) and not self.is_initializing()
        h_loc = x.shape[1]
        if sharded:
            # H-sharded: all_gather the input (exact data movement) and
            # run the ENTIRE attention block as the single-device
            # program, then slice the local rows back out. Attention
            # only runs at the UNet's smallest resolutions (attn_res +
            # mid), so the replicated compute is negligible — and it is
            # the only formulation that keeps the sharded output BITWISE
            # equal to single-device: attention is global anyway, and
            # any f32-level difference (a distributed softmax/norm
            # reassociates its reductions) gets amplified ~(mean/std)^2
            # per downstream GroupNorm into 1e-3-scale divergence.
            x = jax.lax.all_gather(x, self.spatial_axis, axis=1,
                                   tiled=True)
        b, h, w, c = x.shape
        head_dim = c // self.n_head
        y = Norm(c, self.norm, self.norm_groups, name="norm")(x, train)
        qkv = Conv2d(c * 3, 1, use_bias=False, name="qkv")(y)
        qkv = qkv.reshape(b, h * w, self.n_head, 3 * head_dim)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        from ..kernels.attention import spatial_attention

        out = spatial_attention(q, k, v, scale=1.0 / math.sqrt(c))
        out = out.reshape(b, h, w, c)
        out = Conv2d(c, 1, name="out")(out)
        out = out + x
        if sharded:
            idx = jax.lax.axis_index(self.spatial_axis)
            out = jax.lax.dynamic_slice_in_dim(out, idx * h_loc, h_loc,
                                               axis=1)
        return out


class ResnetBlocWithAttn(nn.Module):
    dim_out: int
    norm_groups: int = 32
    dropout: float = 0.0
    with_attn: bool = False
    norm: str = "group"
    discrete: bool = False
    fuse: bool = False
    fuse_skip: object = "auto"
    fuse_stats: bool = True
    spatial_axis: str | None = None

    @nn.compact
    def __call__(self, x, emb, train=False, x2=None, stats_in=None,
                 x2_stats=None):
        """Returns (out, stats): stats are the resblock output's
        per-channel [sum, sumsq] for chaining into the next block's
        GroupNorm, or None when attention (which changes the tensor)
        sits in between / the fused path is off."""
        x, stats = ResnetBlock(
            self.dim_out, self.norm_groups, self.dropout,
            norm=self.norm, discrete=self.discrete, fuse=self.fuse,
            fuse_skip=self.fuse_skip, fuse_stats=self.fuse_stats,
            spatial_axis=self.spatial_axis, name="res_block",
        )(x, emb, train, x2=x2, stats_in=stats_in, x2_stats=x2_stats,
          emit_stats=not self.with_attn and self.fuse_stats)
        if self.with_attn:
            x = SelfAttention(
                self.dim_out, norm_groups=self.norm_groups, norm=self.norm,
                spatial_axis=self.spatial_axis, name="attn",
            )(x, train)
            stats = None
        return x, stats


class UNet(nn.Module):
    """The SR3/DDPM UNet (sr3_modules/unet.py:162-263 topology)."""

    in_channel: int = 6
    out_channel: int = 3
    inner_channel: int = 32
    norm_groups: int = 32
    channel_mults: Sequence[int] = (1, 2, 4, 8, 8)
    attn_res: Sequence[int] = (8,)
    res_blocks: int = 3
    dropout: float = 0.0
    with_noise_level_emb: bool = True
    image_size: int = 128
    time_embedding: str = "continuous"  # 'continuous' (sr3) | 'discrete' (ddpm)
    norm: str = "group"  # 'group' (sr3) | 'batch' (ddpm)
    remat: bool = False  # rematerialize resblocks (train big crops in HBM)
    fuse_blocks: bool = False  # Pallas fused GN+swish+conv at inference
    # skip-concat fusion (x2): 'auto' fuses only blocks whose dim_out
    # under-fills the 128-lane N tile — measured the only regime where
    # riding x2 through the kernel beats the materialized concat
    # (bench_kernels.py: 20.3 vs 25.1 ms at 512^2 128+64->64; slower
    # at every >=128-channel level)
    fuse_skip: object = "auto"
    fuse_stats: bool = True    # GroupNorm stats chaining in fused blocks
    # shard_map spatial parallelism: when set (inference only), every
    # tensor is an H-shard over this mesh axis; convs exchange 1-row
    # halos over ICI, GroupNorm moments ride all_gathered per-row
    # partials (bitwise-equal to single-device), attention gathers its
    # (tiny) input and runs replicated — the fused Pallas kernels stay
    # in play, which GSPMD auto-partitioning could not do (pallas_call
    # is opaque to it), and the sharded forward is BIT-exact vs the
    # single-device fused forward (tests/test_spatial_fused.py)
    spatial_axis: str | None = None

    def _block(self, *args, name, **kwargs):
        cls = ResnetBlocWithAttn
        if self.remat:
            cls = nn.remat(cls, static_argnums=(3,))
        return cls(*args, **kwargs, fuse=self.fuse_blocks,
                   fuse_skip=self.fuse_skip, fuse_stats=self.fuse_stats,
                   spatial_axis=self.spatial_axis, name=name)

    def _boundary_conv(self, x, features, name, stride=1):
        """3x3 boundary conv (initial / downsample): halo-exchanged
        under spatial sharding, plain Conv2d otherwise."""
        if self.spatial_axis and not self.is_initializing():
            from ..parallel.spatial import conv3x3_spatial

            kernel, bias = Conv2d(features, 3, stride=stride, name=name)(
                jnp.zeros((1, 1, 1, x.shape[-1]), x.dtype),
                params_only=True,
            )
            return conv3x3_spatial(x, kernel, bias, self.spatial_axis,
                                   stride=stride)
        return Conv2d(features, 3, stride=stride, name=name)(x)

    @nn.compact
    def __call__(self, x, time, train=False):
        discrete = self.time_embedding == "discrete"
        if self.with_noise_level_emb:
            if discrete:
                emb = discrete_time_encoding(time, self.inner_channel)
            else:
                emb = continuous_noise_encoding(time, self.inner_channel)
            emb = Dense(self.inner_channel * 4, name="noise_mlp_lin0")(emb)
            emb = swish(emb)
            emb = Dense(self.inner_channel, name="noise_mlp_lin1")(emb)
        else:
            emb = None

        num_mults = len(self.channel_mults)
        now_res = self.image_size
        feats = []

        # --- down path: initial conv + res blocks + downsamples, every
        # layer output pushed onto the skip stack (unet.py:196-211).
        # h_stats threads each fused block's output moments into the
        # next GroupNorm (saves one HBM stats read per chained block);
        # boundary convs/attention reset the chain.
        # the skip stack stores (tensor, stats): fused resblocks emit
        # their output's channel moments, so the up-path GroupNorm over
        # a skip needs no extra HBM stats read (boundary convs push None)
        h = self._boundary_conv(x, self.inner_channel, "downs_0")
        feats.append((h, None))
        h_stats = None
        li = 1
        for ind in range(num_mults):
            is_last = ind == num_mults - 1
            use_attn = now_res in self.attn_res
            ch = self.inner_channel * self.channel_mults[ind]
            for _ in range(self.res_blocks):
                h, h_stats = self._block(
                    ch, self.norm_groups, self.dropout, use_attn,
                    self.norm, discrete, name=f"downs_{li}",
                )(h, emb, train, stats_in=h_stats)
                feats.append((h, h_stats))
                li += 1
            if not is_last:
                h = self._boundary_conv(h, h.shape[-1], f"downs_{li}_conv",
                                        stride=2)
                feats.append((h, None))
                h_stats = None
                li += 1
                now_res //= 2

        # --- mid (unet.py:213-218)
        h, h_stats = self._block(
            h.shape[-1], self.norm_groups, self.dropout, True,
            self.norm, discrete, name="mid_0",
        )(h, emb, train, stats_in=h_stats)
        h, h_stats = self._block(
            h.shape[-1], self.norm_groups, self.dropout, False,
            self.norm, discrete, name="mid_1",
        )(h, emb, train, stats_in=h_stats)

        # --- up path with skip concat (unet.py:220-234, 257-261)
        li = 0
        for ind in reversed(range(num_mults)):
            is_last = ind < 1
            use_attn = now_res in self.attn_res
            ch = self.inner_channel * self.channel_mults[ind]
            for _ in range(self.res_blocks + 1):
                # skip rides as a second source (x2): the fused kernel
                # reads it without materializing the concat, and its
                # stored moments skip the x2 stats read
                x2, x2_stats = feats.pop()
                h, h_stats = self._block(
                    ch, self.norm_groups, self.dropout, use_attn,
                    self.norm, discrete, name=f"ups_{li}",
                )(h, emb, train, x2=x2, stats_in=h_stats,
                  x2_stats=x2_stats)
                li += 1
            if not is_last:
                b, hh, ww, cc = h.shape
                if (self.fuse_blocks and not train
                        and not self.is_initializing()):
                    # exact dilated conv: never materializes the
                    # nearest-upsampled intermediate (ops/fused_up.py)
                    kernel, cbias = Conv2d(cc, 3, name=f"ups_{li}_conv")(
                        jnp.zeros((1, 1, 1, cc), h.dtype), params_only=True
                    )
                    if self.spatial_axis:
                        from ..parallel.spatial import up2_conv3x3_spatial

                        h = up2_conv3x3_spatial(h, kernel, cbias,
                                                self.spatial_axis)
                    else:
                        from ..ops.fused_up import up2_conv3x3

                        h = up2_conv3x3(h, kernel, cbias)
                else:
                    h = jax.image.resize(
                        h, (b, hh * 2, ww * 2, cc), method="nearest"
                    )
                    h = Conv2d(cc, 3, name=f"ups_{li}_conv")(h)
                h_stats = None
                li += 1
                now_res *= 2

        return Block(
            self.out_channel, self.norm_groups, norm=self.norm,
            fuse=self.fuse_blocks, spatial_axis=self.spatial_axis,
            name="final_conv"
        )(h, train, stats_in=h_stats)
