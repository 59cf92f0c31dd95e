"""Group AutoEncoder (GAE) — stage 1 of DMGASR.

TPU-native redesign of the reference GAE (AE.py:256-361):

  * The reference loops over the G band groups in Python, running the
    shared Encoder/Decoder G times per batch (AE.py:316-324). Here the
    groups are *folded into the batch axis*: a static (G, n_subs) band
    gather produces a (B*G, H, W, n_subs) tensor and the shared encoder
    runs ONCE — G times larger matmuls for the MXU instead of G small
    kernel launches.
  * Overlap-averaging of decoded groups (AE.py:288-295) is a single
    scatter-add over the channel axis with a precomputed per-band count.
  * Latents are carried as (B, G, H, W, 3) arrays (the reference's
    z_list of G NCHW tensors corresponds to transposing axes 0/1).

Group math (AE.py:264-280): G = ceil((C - n_ovls) / (n_subs - n_ovls));
group g covers [g*(n_subs-n_ovls), +n_subs), clamped so the final group
ends exactly at C (start shifts back, increasing overlap).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.blocks import BranchUnit, Conv2d, leaky_relu


def group_indices(n_colors, n_subs, n_ovls):
    """Static (G, n_subs) band-index table (AE.py:273-280)."""
    G = math.ceil((n_colors - n_ovls) / (n_subs - n_ovls))
    idx = np.zeros((G, n_subs), dtype=np.int32)
    for g in range(G):
        sta = (n_subs - n_ovls) * g
        end = sta + n_subs
        if end > n_colors:
            end = n_colors
            sta = n_colors - n_subs
        idx[g] = np.arange(sta, end)
    return idx


class GAEEncoder(nn.Module):
    """Shared group encoder: BranchUnit(n_subs -> n_feats) + 3x3 conv to
    latent_channels (AE.py:168-199)."""

    n_subs: int
    latent_channels: int = 3
    n_feats: int = 128

    @nn.compact
    def __call__(self, x):
        x = BranchUnit(
            self.n_subs, self.n_feats, n_blocks=3, act=leaky_relu,
            res_scale=0.1, up_scale=1, use_tail=False, name="branch",
        )(x)
        return Conv2d(self.latent_channels, 3, name="final")(x)


class GAEDecoder(nn.Module):
    """Shared group decoder: mirror of the encoder (AE.py:202-242)."""

    n_subs: int
    latent_channels: int = 3
    n_feats: int = 128

    @nn.compact
    def __call__(self, z):
        z = BranchUnit(
            self.latent_channels, self.n_feats, n_blocks=3, act=leaky_relu,
            res_scale=0.1, up_scale=1, use_tail=False, name="branch",
        )(z)
        return Conv2d(self.n_subs, 3, name="final")(z)


class GAE(nn.Module):
    """Grouped autoencoder with overlap-average + residual trunk
    (AE.py:256-361). ``use_trunk=False`` gives the symmetric AE_duichen
    variant (AE.py:433-513).

    Shapes: x (B, H, W, C); latents (B, G, H, W, latent_channels).
    """

    n_subs: int = 8
    n_ovls: int = 2
    n_colors: int = 31
    n_feats: int = 128
    latent_channels: int = 3
    use_trunk: bool = True

    def setup(self):
        self.idx = group_indices(self.n_colors, self.n_subs, self.n_ovls)
        self.G = self.idx.shape[0]
        counts = np.zeros(self.n_colors, dtype=np.float32)
        np.add.at(counts, self.idx.reshape(-1), 1.0)
        self.counts = counts
        self.encoder = GAEEncoder(
            self.n_subs, self.latent_channels, self.n_feats, name="encoder"
        )
        self.decoder = GAEDecoder(
            self.n_subs, self.latent_channels, self.n_feats, name="decoder"
        )
        if self.use_trunk:
            self.trunk = BranchUnit(
                self.n_colors, n_feats=32, n_blocks=2, act=leaky_relu,
                res_scale=0.1, up_scale=1, use_tail=False, name="trunk",
            )
            self.final = Conv2d(self.n_colors, 3, name="final")

    def encode(self, x):
        """(B, H, W, C) -> (B, G, H, W, latent). One batched encoder pass
        replaces the reference's per-group loop (AE.py:310-324)."""
        b, h, w, c = x.shape
        if c != self.n_colors:
            raise ValueError(
                f"GAE configured for {self.n_colors} bands, got cube with {c}"
                " (channels-last expected)"
            )
        # gather band groups: (B, H, W, G, n_subs)
        xg = jnp.take(x, jnp.asarray(self.idx.reshape(-1)), axis=-1)
        xg = xg.reshape(b, h, w, self.G, self.n_subs)
        xg = jnp.moveaxis(xg, 3, 1).reshape(b * self.G, h, w, self.n_subs)
        z = self.encoder(xg)
        return z.reshape(b, self.G, h, w, self.latent_channels)

    def _merge_groups(self, dec, b, h, w):
        """Scatter-add decoded groups into the C-band cube and average
        by per-band coverage (AE.py:288-295)."""
        dec = dec.reshape(b, self.G, h, w, self.n_subs)
        dec = jnp.moveaxis(dec, 1, 3).reshape(b, h, w, self.G * self.n_subs)
        y = jnp.zeros((b, h, w, self.n_colors), dtype=dec.dtype)
        y = y.at[..., jnp.asarray(self.idx.reshape(-1))].add(dec)
        return y / jnp.asarray(self.counts, dtype=dec.dtype)

    def _refine(self, y):
        """Residual refinement trunk (AE.py:302-308)."""
        if not self.use_trunk:
            return y
        y1 = self.trunk(y)
        y1 = self.final(y1)
        return y1 + y

    def decode(self, z):
        """(B, G, H, W, latent) -> (B, H, W, C) (AE.py:283-308)."""
        b, g, h, w, lc = z.shape
        dec = self.decoder(z.reshape(b * g, h, w, lc))
        y = self._merge_groups(dec, b, h, w)
        return self._refine(y)

    def __call__(self, x):
        """Full round-trip; returns (recon, latents) (AE.py:326-361)."""
        z = self.encode(x)
        return self.decode(z), z


class ToyAutoencoder(nn.Module):
    """The 33-channel conv/maxpool toy AE kept in the reference
    (AE.py:57-92): encoder downsamples x4 to a 3-channel latent, decoder
    transposed-convs back. Completeness item only."""

    in_channels: int = 33

    @nn.compact
    def __call__(self, x):
        from ..ops.extra import Deconv2d

        def pool(z):
            return jax.lax.reduce_window(
                z, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )

        y = nn.relu(Conv2d(16, 3, name="enc0")(x))
        y = pool(y)
        y = nn.relu(Conv2d(8, 3, name="enc1")(y))
        y = pool(y)
        z = nn.relu(Conv2d(3, 3, name="enc2")(y))
        y = nn.relu(Deconv2d(8, 3, 1, 1, name="dec0")(z))
        y = nn.relu(Deconv2d(16, 3, 2, 1, output_padding=1, name="dec1")(y))
        y = nn.relu(
            Deconv2d(self.in_channels, 3, 2, 1, output_padding=1, name="dec2")(y)
        )
        return y, z


def random_mask(key, data, p=0.2):
    """Zero a random fraction p of entries (AE.py:95-99) — the masking
    used by the DDP stage-1 trainer (GAE/AEddp.py:196-247)."""
    mask = jax.random.uniform(key, data.shape) > p
    return data * mask.astype(data.dtype)


class PostGAE(nn.Module):
    """Standalone post-refinement net (AE.py:244-252): BranchUnit(256
    feats, 3 blocks) + 3x3 conv, applied to a decoded cube."""

    n_colors: int

    @nn.compact
    def __call__(self, x):
        y = BranchUnit(
            self.n_colors, n_feats=256, n_blocks=3, act=leaky_relu,
            res_scale=0.1, up_scale=1, use_tail=False, name="trunk",
        )(x)
        return Conv2d(self.n_colors, 3, name="final")(y)


class SREncoder(nn.Module):
    """Encoder-only grouped model (AE.py:365-401)."""

    n_subs: int = 8
    n_ovls: int = 2
    n_colors: int = 31
    n_feats: int = 128
    latent_channels: int = 3

    def setup(self):
        self.idx = group_indices(self.n_colors, self.n_subs, self.n_ovls)
        self.G = self.idx.shape[0]
        self.encoder = GAEEncoder(
            self.n_subs, self.latent_channels, self.n_feats, name="encoder"
        )

    def __call__(self, x):
        b, h, w, _ = x.shape
        xg = jnp.take(x, jnp.asarray(self.idx.reshape(-1)), axis=-1)
        xg = xg.reshape(b, h, w, self.G, self.n_subs)
        xg = jnp.moveaxis(xg, 3, 1).reshape(b * self.G, h, w, self.n_subs)
        z = self.encoder(xg)
        return z.reshape(b, self.G, h, w, self.latent_channels)


class AE(nn.Module):
    """Ungrouped autoencoder variant with refinement trunk (AE.py:404-430)."""

    in_channels: int = 102
    n_feats: int = 128
    latent_channels: int = 3

    def setup(self):
        self.encoder = GAEEncoder(
            self.in_channels, self.latent_channels, self.n_feats, name="encoder"
        )
        self.decoder = GAEDecoder(
            self.in_channels, self.latent_channels, self.n_feats, name="decoder"
        )
        self.trunk = BranchUnit(
            self.in_channels, n_feats=32, n_blocks=2, act=leaky_relu,
            res_scale=0.1, up_scale=1, use_tail=False, name="trunk",
        )
        self.final = Conv2d(self.in_channels, 3, name="final")

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        y = self.decoder(z)
        y1 = self.final(self.trunk(y))
        return y1 + y

    def __call__(self, x):
        z = self.encode(x)
        return self.decode(z), z
