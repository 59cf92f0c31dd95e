"""SSPSR baseline (reference SSPSR.py:64-138).

Grouped spatial-spectral prior network: a SHARED BranchUnit upsamples
each band group by n_scale//2, groups are overlap-averaged, a trunk
upsamples the rest (x2), and a bicubic global skip (align_corners=True,
SSPSR.py:124-130) is added through a skip conv.

TPU redesign: groups fold into the batch axis (one shared-branch pass),
overlap-average is a scatter-add — same pattern as models/gae.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.blocks import BranchUnit, Conv2d
from ...ops.extra import make_torch_bicubic_jax
from ..gae import group_indices


class SSPSR(nn.Module):
    n_subs: int
    n_ovls: int
    n_colors: int
    n_blocks: int = 3
    n_feats: int = 256
    n_scale: int = 4
    res_scale: float = 0.1
    use_share: bool = True

    def setup(self):
        self.idx = group_indices(self.n_colors, self.n_subs, self.n_ovls)
        self.G = self.idx.shape[0]
        counts = np.zeros(self.n_colors, dtype=np.float32)
        np.add.at(counts, self.idx.reshape(-1), 1.0)
        self.counts = counts
        self.sca = self.n_scale // 2
        act = nn.relu
        if self.use_share:
            self.branch = BranchUnit(
                self.n_subs, self.n_feats, self.n_blocks, act,
                self.res_scale, up_scale=self.sca, name="branch",
            )
        else:
            self.branches = [
                BranchUnit(
                    self.n_subs, self.n_feats, self.n_blocks, act,
                    self.res_scale, up_scale=2, name=f"branch_{g}",
                )
                for g in range(self.G)
            ]
        self.trunk = BranchUnit(
            self.n_colors, self.n_feats, self.n_blocks, act, self.res_scale,
            up_scale=2, use_tail=False, name="trunk",
        )
        self.skip_conv = Conv2d(self.n_feats, 3, name="skip_conv")
        self.final = Conv2d(self.n_colors, 3, name="final")

    def __call__(self, x, lms):
        """x: (B, h, w, C) LR cube; lms: (B, h, w, C) (bicubic-upsampled
        inside, SSPSR.py:124-130 upsamples lms by n_scale with
        align_corners=True)."""
        b, h, w, c = x.shape
        idx_flat = jnp.asarray(self.idx.reshape(-1))
        if self.use_share:
            xg = jnp.take(x, idx_flat, axis=-1)
            xg = xg.reshape(b, h, w, self.G, self.n_subs)
            xg = jnp.moveaxis(xg, 3, 1).reshape(b * self.G, h, w, self.n_subs)
            yg = self.branch(xg)  # (B*G, sca*h, sca*w, n_subs)
        else:
            outs = []
            for g in range(self.G):
                xi = x[..., self.idx[g][0]:self.idx[g][0] + self.n_subs]
                outs.append(self.branches[g](xi))
            yg = jnp.stack(outs, 1).reshape(
                b * self.G, self.sca * h, self.sca * w, self.n_subs
            )
        hh, ww = self.sca * h, self.sca * w
        yg = yg.reshape(b, self.G, hh, ww, self.n_subs)
        yg = jnp.moveaxis(yg, 1, 3).reshape(b, hh, ww, self.G * self.n_subs)
        y = jnp.zeros((b, hh, ww, self.n_colors), yg.dtype)
        y = y.at[..., idx_flat].add(yg)
        y = y / jnp.asarray(self.counts, yg.dtype)

        y = self.trunk(y)
        up = make_torch_bicubic_jax(
            (lms.shape[1], lms.shape[2]),
            (lms.shape[1] * self.n_scale, lms.shape[2] * self.n_scale),
            align_corners=True,
        )(lms)
        y = y + self.skip_conv(up)
        return self.final(y)
