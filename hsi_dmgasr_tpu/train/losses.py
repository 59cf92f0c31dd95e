"""HSI training losses (NHWC, jax).

  * ``h_loss`` — GELIN HLoss (GELIN.py:453-469): L1 + λ1·SAM + λ2·L1 on
    3-D gradients. This is the stage-1 GAE training loss (AE.py:613-614
    with λ1=0.3, λ2=0.1).
  * ``hybrid_loss`` — SSPSR HybridLoss (SSPSR.py:141-160): L1 + 1e-3
    spatial TV + 1e-3 spectral TV (squared-diff TV).
  * ``spe_loss`` — GDRRN myloss_spe (GAE/models_GDRRN.py:204-238):
    MSE/(2N) + λ·SAM-sum.

Channel axis is LAST here; the reference's dim=1 ops map to axis=-1.
"""

from __future__ import annotations

import jax.numpy as jnp


def cal_sam(y, gt, eps=1e-6):
    """Mean spectral angle / π (GELIN.py:427-451)."""
    inner = jnp.sum(y * gt, axis=-1, keepdims=True)
    len1 = jnp.linalg.norm(y, axis=-1, keepdims=True)
    len2 = jnp.linalg.norm(gt, axis=-1, keepdims=True)
    divisor = len1 * len2
    divisor = divisor + (divisor == 0) * eps
    cos = jnp.clip(
        jnp.sum(inner / divisor, axis=-1), -1 + eps, 1 - eps
    )
    return jnp.mean(jnp.arccos(cos)) / jnp.pi


def cal_gradient(x, eps=1e-6):
    """3-D gradient magnitude on the (1:,1:,1:) corner (GELIN.py:405-425).

    x: (B, H, W, C). The reference trims one voxel off every axis before
    differencing so gx/gy/gc share a shape.
    """
    gc = (x[:, 1:, 1:, 1:] - x[:, 1:, 1:, :-1])
    gx = (x[:, 1:, 1:, 1:] - x[:, :-1, 1:, 1:])
    gy = (x[:, 1:, 1:, 1:] - x[:, 1:, :-1, 1:])
    return jnp.sqrt(gx ** 2 + gy ** 2 + gc ** 2 + eps)


def h_loss(y, gt, la1=0.3, la2=0.1, sam=True, gra=True):
    """GELIN HLoss (GELIN.py:453-469)."""
    loss = jnp.mean(jnp.abs(y - gt))
    if sam:
        loss = loss + la1 * cal_sam(y, gt)
    if gra:
        loss = loss + la2 * jnp.mean(jnp.abs(cal_gradient(y) - cal_gradient(gt)))
    return loss


def _tv_spatial(x, weight=1e-3):
    """Squared-diff spatial TV (SSPSR.py:165-183); x NHWC."""
    b = x.shape[0]
    count_h = x[:, 1:].size // b
    count_w = x[:, :, 1:].size // b
    h_tv = jnp.sum((x[:, 1:, :, :] - x[:, :-1, :, :]) ** 2)
    w_tv = jnp.sum((x[:, :, 1:, :] - x[:, :, :-1, :]) ** 2)
    return weight * (h_tv / count_h + w_tv / count_w) / b


def _tv_spectral(x, weight=1e-3):
    """Squared-diff spectral TV (GELIN.py:389-402); x NHWC."""
    b = x.shape[0]
    count_c = x[..., 1:].size // b
    c_tv = jnp.sum((x[..., 1:] - x[..., :-1]) ** 2)
    return weight * 2 * (c_tv / count_c) / b


def hybrid_loss(y, gt, spatial_tv=True, spectral_tv=True):
    """SSPSR HybridLoss (SSPSR.py:141-160)."""
    loss = jnp.mean(jnp.abs(y - gt))
    if spatial_tv:
        loss = loss + _tv_spatial(y)
    if spectral_tv:
        loss = loss + _tv_spectral(y)
    return loss


def spe_loss(y, gt, n, lamd=1e-1, mse_lamd=1.0, eps=1e-12):
    """GDRRN myloss_spe (GAE/models_GDRRN.py:204-238); n = batch size."""
    mse = jnp.sum((y - gt) ** 2) / (n * 2)
    h, w = gt.shape[1], gt.shape[2]
    nom = jnp.sum(y * gt, axis=-1)
    den = (
        jnp.maximum(jnp.linalg.norm(gt, axis=-1), eps)
        * jnp.maximum(jnp.linalg.norm(y, axis=-1), eps)
    )
    sam = jnp.arccos(jnp.clip(nom / den, -1.0, 1.0))
    sam = jnp.nan_to_num(sam)
    sam_sum = jnp.sum(sam) / (n * h * w)
    return mse_lamd * mse + lamd * sam_sum
