"""Optional post-processing / finetune networks.

  * AttentionNet — residual-attention refiner (GAE/finetune_net.py:20-77).
  * post_unet    — the small no-time-embedding BatchNorm UNet used as an
                   optional GAE post-processor (top-level unet.py:150-246,
                   imported at sr_gae.py:25/AE.py:16): our UNet module
                   with with_noise_level_emb=False, norm='batch'.
  * VQ Codebook  — the unused vector-quantization module kept in the
                   reference GAE (AE.py:27-54), for completeness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import Conv2d
from .unet import UNet


def post_unet(in_channel, out_channel, inner_channel=8, image_size=128):
    """The reference's optional GAE post-processing UNet (unet.py:150-246)."""
    return UNet(
        in_channel=in_channel, out_channel=out_channel,
        inner_channel=inner_channel, norm_groups=32,
        channel_mults=(1, 2, 4, 8, 8), attn_res=(8,), res_blocks=2,
        dropout=0.0, with_noise_level_emb=False, image_size=image_size,
        time_embedding="discrete", norm="batch",
    )


class ConvBN(nn.Module):
    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, train=False):
        x = Conv2d(self.features, self.kernel_size, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        return nn.relu(x)


class ResidualAttentionBlock(nn.Module):
    """conv-conv + 1-channel sigmoid spatial attention + 1x1 residual
    (GAE/finetune_net.py:44-60)."""

    features: int

    @nn.compact
    def __call__(self, x, train=False):
        residual = Conv2d(self.features, 1, name="residual")(x)
        y = ConvBN(self.features, name="conv1")(x, train)
        y = ConvBN(self.features, name="conv2")(y, train)
        a = Conv2d(1, 1, name="attn_conv")(y)
        a = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="attn_bn")(a)
        a = nn.sigmoid(a)
        return nn.relu(y * a + residual)


class AttentionNet(nn.Module):
    """Residual-attention refiner (GAE/finetune_net.py:62-76)."""

    n_colors: int = 31
    n_feats: int = 64

    @nn.compact
    def __call__(self, x, train=False):
        x = ConvBN(self.n_feats, name="conv1")(x, train)
        x = ResidualAttentionBlock(self.n_feats, name="rab1")(x, train)
        x = ResidualAttentionBlock(self.n_feats, name="rab2")(x, train)
        x = Conv2d(self.n_colors, 3, name="conv2")(x)
        # finetune_net.py:75 adds a bilinear x2 self-upsample of the output
        # to itself — a shape mismatch that crashes in torch (dead code in
        # the reference); the refiner output is returned directly here.
        return x


class Codebook(nn.Module):
    """VQ codebook (AE.py:27-54): nearest-neighbor lookup with commitment
    loss and straight-through gradient. Unused by the shipped pipeline
    but kept for capability parity."""

    num_codebook_vectors: int = 4096
    latent_dim: int = 512
    beta: float = 0.25

    @nn.compact
    def __call__(self, z):
        emb = self.param(
            "embedding",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32,
                -1.0 / self.num_codebook_vectors,
                1.0 / self.num_codebook_vectors,
            ),
            (self.num_codebook_vectors, self.latent_dim),
        )
        flat = z.reshape(-1, self.latent_dim)
        d = (
            jnp.sum(flat ** 2, axis=1, keepdims=True)
            + jnp.sum(emb ** 2, axis=1)[None, :]
            - 2.0 * flat @ emb.T
        )
        idx = jnp.argmin(d, axis=1)
        z_q = emb[idx].reshape(z.shape)
        loss = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + \
            self.beta * jnp.mean((z_q - jax.lax.stop_gradient(z)) ** 2)
        z_q = z + jax.lax.stop_gradient(z_q - z)
        return z_q, idx, loss
