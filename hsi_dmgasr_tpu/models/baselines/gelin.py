"""GELIN baseline (reference GELIN.py:100-276).

Group-wise SSELM encoder (SCconv self-calibrated conv + channel
attention), NGIM neighbor-group interaction upsampling (transposed-conv
trunk + multi-group error correction), per-group recon conv,
overlap-average, plus the bicubic-upsampled global skip (y + lms).

TPU redesign: the shared SSELM runs once over (B*G) folded groups; the
neighbor features xl/xn of NGIM (GELIN.py:254-266, circular) are
jnp.roll over the group axis.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.blocks import Conv2d
from ...ops.extra import Deconv2d, PReLU, avg_pool, resize_nearest
from ..gae import group_indices


class CA(nn.Module):
    """conv-relu-conv + squeeze-excite gate, residual (GELIN.py:69-96)."""

    n_feats: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = Conv2d(self.n_feats, 3, name="conv0")(x)
        y = nn.relu(y)
        y = Conv2d(self.n_feats, 3, name="conv1")(y)
        g = jnp.mean(y, axis=(1, 2), keepdims=True)
        g = Conv2d(self.n_feats // self.reduction, 1, name="du0")(g)
        g = nn.relu(g)
        g = Conv2d(self.n_feats, 1, name="du1")(g)
        g = nn.sigmoid(g)
        return y * g + x


class SCconv(nn.Module):
    """Self-calibrated conv (GELIN.py:100-125): the first half of the
    channels is gated by a pooled-and-upsampled calibration branch."""

    n_feats: int
    pooling_r: int = 4

    @nn.compact
    def __call__(self, x):
        half = self.n_feats // 2
        x1, x2 = x[..., :half], x[..., half:]
        cal = avg_pool(x1, self.pooling_r)
        cal = Conv2d(half, 3, name="f2")(cal)
        cal = resize_nearest(cal, (x1.shape[1], x1.shape[2]))
        gate = nn.sigmoid(x1 + cal)
        out1 = Conv2d(half, 3, name="f3")(x1) * gate
        out1 = nn.relu(Conv2d(half, 3, name="f4")(out1))
        out2 = nn.relu(Conv2d(half, 3, name="f1")(x2))
        return jnp.concatenate([out1, out2], axis=-1)


class SSELB(nn.Module):
    n_feats: int
    pooling_r: int = 4

    @nn.compact
    def __call__(self, x):
        res = SCconv(self.n_feats, self.pooling_r, name="sc")(x)
        res = CA(self.n_feats, name="ca")(res)
        return res + x


class SSELM(nn.Module):
    """head conv + n SSELBs with long skip (GELIN.py:186-199)."""

    n_colors: int
    n_feats: int
    n_blocks: int
    pooling_r: int = 4

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.n_feats, 3, name="head")(x)
        y = x
        for i in range(self.n_blocks):
            y = SSELB(self.n_feats, self.pooling_r, name=f"body_{i}")(y)
        return y + x


class NGIM(nn.Module):
    """Neighbor-group interaction upsample (GELIN.py:142-179)."""

    n_feats: int
    scale: int

    @nn.compact
    def __call__(self, xl, xi, xn):
        if self.scale == 4:
            k, s, p = 8, 4, 2
        elif self.scale == 8:
            k, s, p = 12, 8, 2
        elif self.scale == 2:
            k, s, p = 4, 2, 1  # GAE/GELIN.py:182-205 x2 variant
        else:
            raise NotImplementedError(f"NGIM scale {self.scale}")
        h1 = Deconv2d(self.n_feats, k, s, p, name="trunk_up")(xi)
        h1 = PReLU(self.n_feats, name="trunk_act")(h1)
        h2 = jnp.concatenate([xl, xi, xn], axis=-1)
        h2 = Conv2d(self.n_feats // 2, 3, name="multi0")(h2)
        h2 = Conv2d(self.n_feats, 3, name="multi1")(h2)
        h2 = Deconv2d(self.n_feats, k, s, p, name="multi_up")(h2)
        h2 = PReLU(self.n_feats, name="multi_act")(h2)
        e = Conv2d(self.n_feats, 3, name="error")(h2 - h1)
        return h1 + e


class GELIN(nn.Module):
    n_feats: int = 64
    n_colors: int = 102
    pooling_r: int = 4
    n_subs: int = 16
    n_ovls: int = 4
    blocks: int = 4
    scale: int = 4

    def setup(self):
        self.idx = group_indices(self.n_colors, self.n_subs, self.n_ovls)
        self.G = self.idx.shape[0]
        counts = np.zeros(self.n_colors, dtype=np.float32)
        np.add.at(counts, self.idx.reshape(-1), 1.0)
        self.counts = counts
        self.branch = SSELM(
            self.n_subs, self.n_feats, self.blocks, self.pooling_r,
            name="branch",
        )
        self.branch_up = NGIM(self.n_feats, self.scale, name="branch_up")
        self.branch_recon = Conv2d(self.n_subs, 3, name="branch_recon")

    def __call__(self, x, lms):
        """x: (B, h, w, C) LR; lms: (B, h*scale, w*scale, C) bicubic-up."""
        b, h, w, c = x.shape
        idx_flat = jnp.asarray(self.idx.reshape(-1))
        xg = jnp.take(x, idx_flat, axis=-1).reshape(b, h, w, self.G, self.n_subs)
        xg = jnp.moveaxis(xg, 3, 1).reshape(b * self.G, h, w, self.n_subs)
        m = self.branch(xg).reshape(b, self.G, h, w, self.n_feats)

        # circular neighbor groups (GELIN.py:254-266)
        xl = jnp.roll(m, 1, axis=1)
        xn = jnp.roll(m, -1, axis=1)

        def fold(t):
            return t.reshape(b * self.G, h, w, self.n_feats)

        up = self.branch_up(fold(xl), fold(m), fold(xn))
        rec = self.branch_recon(up)  # (B*G, H, W, n_subs)
        hh, ww = h * self.scale, w * self.scale
        rec = rec.reshape(b, self.G, hh, ww, self.n_subs)
        rec = jnp.moveaxis(rec, 1, 3).reshape(b, hh, ww, self.G * self.n_subs)
        y = jnp.zeros((b, hh, ww, self.n_colors), rec.dtype)
        y = y.at[..., idx_flat].add(rec)
        y = y / jnp.asarray(self.counts, rec.dtype)
        return y + lms
