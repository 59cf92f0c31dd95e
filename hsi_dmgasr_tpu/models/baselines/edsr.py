"""EDSR baseline on HSI channels (reference GAE/EDSR.py:54-104).

Standard head/body/tail EDSR with x2 pixel-shuffle tail (the reference
pins scale=2 internally)."""

from __future__ import annotations

from flax import linen as nn

from ...ops.blocks import Conv2d, ResBlock, Upsampler


class EDSR(nn.Module):
    n_resblocks: int = 16
    n_feats: int = 64
    n_colors: int = 102
    res_scale: float = 1.0
    scale: int = 2

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.n_feats, 3, name="head")(x)
        res = x
        for i in range(self.n_resblocks):
            res = ResBlock(
                self.n_feats, 3, nn.relu, self.res_scale, name=f"body_{i}"
            )(res)
        res = Conv2d(self.n_feats, 3, name="body_tail")(res)
        res = res + x
        y = Upsampler(self.scale, self.n_feats, name="upsample")(res)
        return Conv2d(self.n_colors, 3, name="tail")(y)
