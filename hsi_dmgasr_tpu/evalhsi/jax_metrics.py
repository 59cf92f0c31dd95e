"""On-device HSI metrics (JAX), jit-compatible.

Vectorized rewrites of the numpy suite (evalhsi/metrics.py, which itself
mirrors the reference eval_hsi.py): everything runs as a single fused XLA
program over the whole (H, W, C) cube, so a full eval costs one device
round-trip instead of C per-band host loops.

SAM caveat: the host path skips pixels with zero spectral norm; on device
we mask them, which is numerically identical for real HSI cubes
(norms are never exactly zero after normalization).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _uniform_filter_2d(x, size=7):
    """Reflect-padded uniform filter matching scipy.ndimage.uniform_filter.

    scipy splits an even-ish window as [size//2 left, (size-1)//2 right];
    for odd sizes it is centered. Implemented as two separable matmul-free
    cumulative convolutions (cheap on VPU).
    """
    pad = size // 2
    xp = jnp.pad(x, ((pad, pad), (pad, pad)), mode="reflect")
    k = jnp.ones((size,), dtype=x.dtype) / size
    xp = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(xp)
    xp = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"), in_axes=1, out_axes=1)(xp)
    return xp


def ssim_band(im1, im2, data_range, win_size=7):
    """skimage-default SSIM of one band (see evalhsi/metrics.py ssim)."""
    im1 = im1.astype(jnp.float32)
    im2 = im2.astype(jnp.float32)
    NP = win_size ** 2
    cov_norm = NP / (NP - 1.0)
    f = partial(_uniform_filter_2d, size=win_size)
    ux, uy = f(im1), f(im2)
    uxx, uyy, uxy = f(im1 * im1), f(im2 * im2), f(im1 * im2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    R = data_range
    C1, C2 = (0.01 * R) ** 2, (0.03 * R) ** 2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux ** 2 + uy ** 2 + C1) * (vx + vy + C2))
    pad = (win_size - 1) // 2
    return jnp.mean(S[pad:-pad, pad:-pad])


@partial(jax.jit, static_argnames=("data_range", "ratio"))
def quality_assessment_jax(x_true, x_pred, data_range=1.0, ratio=4):
    """Full metric dict on device; input cubes are (H, W, C)."""
    xt = x_true.astype(jnp.float32)
    xp = x_pred.astype(jnp.float32)

    # MPSNR: mean over per-band PSNR
    mse_b = jnp.mean((xt - xp) ** 2, axis=(0, 1))
    mpsnr = jnp.mean(10.0 * jnp.log10((data_range ** 2) / mse_b))

    # MSSIM: vmap per-band SSIM
    mssim = jnp.mean(
        jax.vmap(lambda a, b: ssim_band(a, b, data_range))(
            jnp.moveaxis(xt, -1, 0), jnp.moveaxis(xp, -1, 0)
        )
    )

    # SAM (degrees, masked zero-norm pixels)
    nt = jnp.linalg.norm(xt, axis=2)
    npred = jnp.linalg.norm(xp, axis=2)
    valid = (nt != 0) & (npred != 0)
    cos = jnp.sum(xt * xp, axis=2) / jnp.where(valid, nt * npred, 1.0)
    ang = jnp.where(valid, jnp.arccos(jnp.clip(cos, -1.0, 1.0)), 0.0)
    sam = jnp.sum(ang) / jnp.maximum(jnp.sum(valid), 1) * 180.0 / jnp.pi

    # ERGAS
    mean_b = jnp.mean(xt, axis=(0, 1))
    ergas = (100.0 / ratio) * jnp.sqrt(jnp.mean(mse_b / (mean_b ** 2)))

    # CrossCorrelation
    xtc = xt - jnp.mean(xt, axis=(0, 1))
    xpc = xp - jnp.mean(xp, axis=(0, 1))
    num = jnp.sum(xtc * xpc, axis=(0, 1))
    den = jnp.sqrt(jnp.sum(xtc ** 2, axis=(0, 1)) * jnp.sum(xpc ** 2, axis=(0, 1)))
    cc = jnp.mean(num / den)

    # RMSE
    rmse = jnp.sqrt(jnp.mean((xt - xp) ** 2))

    return {
        "MPSNR": mpsnr,
        "MSSIM": mssim,
        "ERGAS": ergas,
        "SAM": sam,
        "CrossCorrelation": cc,
        "RMSE": rmse,
    }


@jax.jit
def color_correction_jax(lr_input, hr_output):
    """Per-band mean/std matching on device (eval_hsi.py:259-274)."""
    hr_mean = jnp.mean(hr_output, axis=(0, 1))
    hr_std = jnp.std(hr_output, axis=(0, 1))
    lr_mean = jnp.mean(lr_input, axis=(0, 1))
    lr_std = jnp.std(lr_input, axis=(0, 1))
    out = (hr_output - hr_mean) / hr_std * lr_std + lr_mean
    return jnp.clip(out, 0.0, 1.0)
