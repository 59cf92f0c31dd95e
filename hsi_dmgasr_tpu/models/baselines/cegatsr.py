"""CEGATSR baseline (reference GAE/CEGATSR.py).

GCN/CNN dual-branch grouped SR net: each band group is strided-conv
embedded to a token grid, a kNN graph over token features feeds a
multi-head GAT, a transposed conv restores resolution; the CNN branch is
a depthwise-separable stack (unused by the reference's forward, which
takes the GCN result only — CEGATSR.py:366 ``y = GCN_result`` — we keep
both and follow that choice).

TPU redesign of the graph build: the reference calls scipy ``cdist`` on
CPU inside forward per batch element (CEGATSR.py:243-252) — a host
round-trip per step. Here pairwise distances + the k-threshold run on
device (one matmul + top_k), inside jit. The reference keeps the 7
nearest INCLUDING self via an argsort-rank test; jax.lax.top_k on
negative distances reproduces that set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.blocks import Conv2d, SSPN, Upsampler
from ...ops.extra import Deconv2d
from ..gae import group_indices


def knn_adjacency(tokens, k=7):
    """(B, N, C) -> (B, N, N) 0/1 adjacency of the k nearest neighbors
    (euclidean, self included). Matches the argsort-rank<=6 test of
    CEGATSR.py:247."""
    d2 = (
        jnp.sum(tokens ** 2, -1, keepdims=True)
        - 2.0 * jnp.einsum("bnc,bmc->bnm", tokens, tokens)
        + jnp.sum(tokens ** 2, -1)[:, None, :]
    )
    n = tokens.shape[1]
    _, idx = jax.lax.top_k(-d2, k)
    adj = jax.nn.one_hot(idx, n, dtype=tokens.dtype).sum(axis=2)
    return jnp.clip(adj, 0.0, 1.0)


class GraphAttentionLayer(nn.Module):
    """Dense GAT layer (CEGATSR.py:71-120), xavier-uniform init."""

    out_features: int
    alpha: float = 0.2
    concat: bool = True

    @nn.compact
    def __call__(self, x, adj):
        b, n, c = x.shape
        W = self.param(
            "W", nn.initializers.xavier_uniform(), (c, self.out_features)
        )
        a = self.param(
            "a", nn.initializers.xavier_uniform(), (2 * self.out_features, 1)
        )
        h = x @ W  # (B, N, F)
        # e_ij = leaky_relu(a^T [h_i || h_j]) decomposes into a_1^T h_i + a_2^T h_j
        a1, a2 = a[: self.out_features, 0], a[self.out_features:, 0]
        e = jax.nn.leaky_relu(
            (h @ a1)[:, :, None] + (h @ a2)[:, None, :], self.alpha
        )
        e = jnp.where(adj > 0, e, -1e12)
        attn = jax.nn.softmax(e, axis=2)
        h_prime = jnp.einsum("bnm,bmf->bnf", attn, h)
        return nn.relu(h_prime) if self.concat else h_prime


class GAT(nn.Module):
    """Multi-head GAT with concat + output head (CEGATSR.py:124-146)."""

    out_features: int
    n_heads: int = 2
    alpha: float = 0.2
    dropout: float = 0.6

    @nn.compact
    def __call__(self, x, adj, train=False):
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        heads = [
            GraphAttentionLayer(self.out_features, self.alpha, True,
                                name=f"attention_{i}")(x, adj)
            for i in range(self.n_heads)
        ]
        x = jnp.concatenate(heads, axis=2)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.elu(
            GraphAttentionLayer(self.out_features, self.alpha, False,
                                name="out_att")(x, adj)
        )
        return jax.nn.log_softmax(x, axis=2)


class GCNUnit(nn.Module):
    """strided conv -> kNN graph -> GAT -> transposed conv
    (CEGATSR.py:269-303)."""

    out_feats: int

    @nn.compact
    def __call__(self, x, train=False):
        y = Conv2d(self.out_feats, 3, stride=2, name="head")(x)
        b, h, w, c = y.shape
        tokens = y.reshape(b, h * w, c)
        adj = knn_adjacency(jax.lax.stop_gradient(tokens))
        t = GAT(self.out_feats, name="body")(tokens, adj, train)
        t = t.reshape(b, h, w, self.out_feats)
        # reference transpose_conv uses padding=1, output_padding=1
        # (CEGATSR.py:62-63) -> exact 2x upsample
        return Deconv2d(self.out_feats, 3, 2, 1, output_padding=1,
                        name="last")(t)


class CNNUnit(nn.Module):
    """Depthwise-separable double stack (CEGATSR.py:306-341); the two
    passes SHARE the point/depth convs as in the reference."""

    out_feats: int

    @nn.compact
    def __call__(self, x):
        point = Conv2d(self.out_feats, 1, use_bias=False, name="point_conv")
        dkernel = self.param(
            "depth_kernel", nn.initializers.lecun_normal(),
            (3, 3, 1, self.out_feats),
        )
        dbias = self.param(
            "depth_bias", nn.initializers.zeros, (self.out_feats,)
        )

        def dconv(z):
            return jax.lax.conv_general_dilated(
                z, dkernel.astype(z.dtype), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.out_feats,
            ) + dbias

        y = jax.nn.leaky_relu(point(x), 0.01)
        y = jax.nn.leaky_relu(dconv(y), 0.01)
        y = jax.nn.leaky_relu(point(y), 0.01)
        y = jax.nn.leaky_relu(dconv(y), 0.01)
        return y


class GCNCNNUnit(nn.Module):
    """Shared per-group branch (CEGATSR.py:344-375)."""

    n_subs: int
    out_feats: int
    up_scale: int
    use_tail: bool = True

    @nn.compact
    def __call__(self, x, train=False):
        y = Conv2d(self.out_feats, 3, name="pre")(x)
        gcn = GCNUnit(self.out_feats, name="head")(y, train)
        _ = CNNUnit(self.out_feats, name="body")(y)  # computed, unused (ref :366)
        y = Conv2d(self.out_feats, 3, name="last")(gcn)
        y = Upsampler(self.up_scale, self.out_feats, name="upsample")(y)
        if self.use_tail:
            y = Conv2d(self.n_subs, 3, name="tail")(y)
        return y


class CEGATSR(nn.Module):
    """Grouped GCN/CNN SR model (CEGATSR.py:429-511)."""

    n_subs: int = 8
    n_ovls: int = 2
    in_feats: int = 31  # = n_colors
    n_blocks: int = 3
    out_feats: int = 64
    n_scale: int = 4
    res_scale: float = 0.1

    def setup(self):
        self.idx = group_indices(self.in_feats, self.n_subs, self.n_ovls)
        self.G = self.idx.shape[0]
        counts = np.zeros(self.in_feats, dtype=np.float32)
        np.add.at(counts, self.idx.reshape(-1), 1.0)
        self.counts = counts
        self.sca = self.n_scale // 2
        self.branch = GCNCNNUnit(
            self.n_subs, self.out_feats, up_scale=self.sca, name="branch"
        )
        self.trunk_head = Conv2d(self.out_feats, 3, name="trunk_head")
        # CEGATSR's own attention block uses CALayer reduction 16
        # (CEGATSR.py:199), unlike the SSPSR family's 3
        self.trunk_body = SSPN(
            self.out_feats, self.n_blocks, nn.relu, self.res_scale,
            ca_reduction=16, name="trunk_body",
        )
        self.trunk_up = Upsampler(2, self.out_feats, name="trunk_up")
        self.skip_conv = Conv2d(self.out_feats, 3, name="skip_conv")
        self.final = Conv2d(self.in_feats, 3, name="final")

    def __call__(self, x, lms, train=False):
        b, h, w, c = x.shape
        idx_flat = jnp.asarray(self.idx.reshape(-1))
        xg = jnp.take(x, idx_flat, axis=-1).reshape(b, h, w, self.G, self.n_subs)
        xg = jnp.moveaxis(xg, 3, 1).reshape(b * self.G, h, w, self.n_subs)
        yg = self.branch(xg, train)
        hh, ww = self.sca * h, self.sca * w
        yg = yg.reshape(b, self.G, hh, ww, self.n_subs)
        yg = jnp.moveaxis(yg, 1, 3).reshape(b, hh, ww, self.G * self.n_subs)
        y = jnp.zeros((b, hh, ww, self.in_feats), yg.dtype)
        y = y.at[..., idx_flat].add(yg)
        y = y / jnp.asarray(self.counts, yg.dtype)

        y = self.trunk_up(self.trunk_body(self.trunk_head(y)))
        y = y + self.skip_conv(lms)
        return self.final(y)
