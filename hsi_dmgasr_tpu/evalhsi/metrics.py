"""HSI quality metrics (numpy host path).

Parity targets (reference ``eval_hsi.py``):
  MPSNR  per-band PSNR mean                       (eval_hsi.py:110-121)
  MSSIM  per-band SSIM mean, skimage semantics    (eval_hsi.py:124-135)
  SAM    mean per-pixel spectral angle, degrees   (eval_hsi.py:47-65)
  ERGAS  global relative error                    (eval_hsi.py:27-44)
  CC     mean per-band cross-correlation          (eval_hsi.py:68-79)
  RMSE   whole-cube RMS error                     (eval_hsi.py:99-107)
plus SID/APPSA/MARE/QAVE (eval_hsi.py:138-214) and per-band mean/std
``color_correction`` (eval_hsi.py:259-274).

SSIM is implemented to match ``skimage.metrics.structural_similarity``
defaults exactly (7x7 uniform window, sample covariance, edge crop),
since the reference delegates to skimage.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import uniform_filter
from scipy.signal import convolve2d


# ---------------------------------------------------------------------------
# per-band scalar metrics


def psnr(im_true, im_test, data_range):
    """Peak signal-to-noise ratio (skimage-compatible)."""
    im_true = im_true.astype(np.float64)
    im_test = im_test.astype(np.float64)
    err = np.mean((im_true - im_test) ** 2)
    return 10.0 * np.log10((float(data_range) ** 2) / err)


def ssim(im1, im2, data_range, win_size=7):
    """Structural similarity, matching skimage defaults.

    skimage's structural_similarity with default args uses a uniform
    win_size x win_size filter (reflect padding), sample covariance
    normalization N/(N-1), K1=0.01, K2=0.03, and averages S over the
    image cropped by (win_size-1)//2 on every side.
    """
    im1 = im1.astype(np.float64)
    im2 = im2.astype(np.float64)
    NP = win_size ** im1.ndim
    cov_norm = NP / (NP - 1.0)
    filt = dict(size=win_size, mode="reflect")
    ux = uniform_filter(im1, **filt)
    uy = uniform_filter(im2, **filt)
    uxx = uniform_filter(im1 * im1, **filt)
    uyy = uniform_filter(im2 * im2, **filt)
    uxy = uniform_filter(im1 * im2, **filt)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    R = float(data_range)
    C1 = (0.01 * R) ** 2
    C2 = (0.03 * R) ** 2
    A1, A2 = 2.0 * ux * uy + C1, 2.0 * vxy + C2
    B1, B2 = ux ** 2 + uy ** 2 + C1, vx + vy + C2
    S = (A1 * A2) / (B1 * B2)
    pad = (win_size - 1) // 2
    return S[pad:-pad or None, pad:-pad or None].mean()


# ---------------------------------------------------------------------------
# cube metrics ((H, W, C) layout, same as the reference API)


def _as_band_mat(x_true, x_pred):
    """(H, W, C) -> (C, H*W) float32 pair (eval_hsi.py:82-96)."""
    h, w, c = x_true.shape
    xt = x_true.astype(np.float32).transpose(2, 0, 1).reshape(c, h * w)
    xp = x_pred.astype(np.float32).transpose(2, 0, 1).reshape(c, h * w)
    return xt, xp


def compare_mpsnr(x_true, x_pred, data_range):
    x_true = x_true.astype(np.float32)
    x_pred = x_pred.astype(np.float32)
    return np.mean(
        [psnr(x_true[:, :, k], x_pred[:, :, k], data_range) for k in range(x_true.shape[2])]
    )


def compare_mssim(x_true, x_pred, data_range):
    x_true = x_true.astype(np.float32)
    x_pred = x_pred.astype(np.float32)
    return np.mean(
        [ssim(x_true[:, :, k], x_pred[:, :, k], data_range) for k in range(x_true.shape[2])]
    )


def compare_sam(x_true, x_pred):
    """Mean spectral angle in degrees over pixels with nonzero norms.

    Deviation from eval_hsi.py:47-65: the cosine is clipped to [-1, 1].
    The reference feeds arccos raw f32 ratios, which exceed 1 by roundoff
    for near-identical spectra and nan-poison the mean; clipping only
    touches those roundoff values (|cos|-1 ~ 1e-7), never real angles.
    """
    xt = x_true.astype(np.float32)
    xp = x_pred.astype(np.float32)
    nt = np.linalg.norm(xt, axis=2)
    npred = np.linalg.norm(xp, axis=2)
    valid = (nt != 0) & (npred != 0)
    inner = np.sum(xt * xp, axis=2)
    # restrict to valid pixels; reference loops and skips zero-norm pixels
    cos = np.clip(inner[valid] / (nt[valid] * npred[valid]), -1.0, 1.0)
    ang = np.arccos(cos)
    return float(np.mean(ang) * 180.0 / np.pi)


def compare_ergas(x_true, x_pred, ratio):
    xt, xp = _as_band_mat(x_true, x_pred)
    err = xt - xp
    r_mse = np.mean(err ** 2, axis=1)
    tmp = r_mse / (np.mean(xt, axis=1) ** 2)
    return (100.0 / ratio) * np.sqrt(np.mean(tmp))


def compare_corr(x_true, x_pred):
    xt, xp = _as_band_mat(x_true, x_pred)
    xt = xt - xt.mean(axis=1, keepdims=True)
    xp = xp - xp.mean(axis=1, keepdims=True)
    num = np.sum(xt * xp, axis=1)
    den = np.sqrt(np.sum(xt * xt, axis=1) * np.sum(xp * xp, axis=1))
    return float((num / den).mean())


def compare_rmse(x_true, x_pred):
    xt = x_true.astype(np.float32)
    xp = x_pred.astype(np.float32)
    return float(np.linalg.norm(xt - xp) / np.sqrt(xt.size))


def compare_sid(x_true, x_pred):
    """Spectral information divergence (eval_hsi.py:138-151)."""
    xt = x_true.astype(np.float32)
    xp = x_pred.astype(np.float32)
    N = xt.shape[2]
    err = np.zeros(N)
    for i in range(N):
        err[i] = abs(
            np.sum(xp[:, :, i] * np.log10((xp[:, :, i] + 1e-3) / (xt[:, :, i] + 1e-3)))
            + np.sum(xt[:, :, i] * np.log10((xt[:, :, i] + 1e-3) / (xp[:, :, i] + 1e-3)))
        )
    return float(np.mean(err / (xt.shape[0] * xt.shape[1])))


def compare_appsa(x_true, x_pred):
    """Average per-pixel spectral angle (eval_hsi.py:154-166)."""
    xt = x_true.astype(np.float32)
    xp = x_pred.astype(np.float32)
    nom = np.sum(xt * xp, axis=2)
    denom = np.linalg.norm(xt, axis=2) * np.linalg.norm(xp, axis=2)
    cos = np.minimum(nom / (denom + 1e-3), 1.0)
    return float(np.sum(np.arccos(cos)) / (xt.shape[0] * xt.shape[1]))


def compare_mare(x_true, x_pred):
    """Mean absolute relative error (eval_hsi.py:169-179)."""
    xt = x_true.astype(np.float32)
    xp = x_pred.astype(np.float32)
    return float(np.mean(np.abs(xt - xp) / (xt + 1.0)))


def img_qi(img1, img2, block_size=8):
    """Universal image quality index per band (eval_hsi.py:182-206)."""
    N = block_size ** 2
    win = np.ones((block_size, block_size))
    img1_sq, img2_sq, img12 = img1 * img1, img2 * img2, img1 * img2
    s1 = convolve2d(img1, np.rot90(win), mode="valid")
    s2 = convolve2d(img2, np.rot90(win), mode="valid")
    s1_sq = convolve2d(img1_sq, np.rot90(win), mode="valid")
    s2_sq = convolve2d(img2_sq, np.rot90(win), mode="valid")
    s12 = convolve2d(img12, np.rot90(win), mode="valid")
    mul = s1 * s2
    sq_mul = s1 * s1 + s2 * s2
    numerator = 4 * (N * s12 - mul) * mul
    denom1 = N * (s1_sq + s2_sq) - sq_mul
    denom = denom1 * sq_mul
    qmap = np.ones(denom.shape)
    idx = (denom1 == 0) & (sq_mul != 0)
    qmap[idx] = 2 * mul[idx] / sq_mul[idx]
    idx = denom != 0
    qmap[idx] = numerator[idx] / denom[idx]
    return qmap.mean()


def compare_qave(x_true, x_pred, block_size=8):
    n_bands = x_true.shape[2]
    return float(
        np.mean([img_qi(x_true[:, :, i], x_pred[:, :, i], block_size) for i in range(n_bands)])
    )


def quality_assessment(x_true, x_pred, data_range, ratio, multi_dimension=False, block_size=8):
    """Standard metric dict (eval_hsi.py:217-238)."""
    return {
        "MPSNR": compare_mpsnr(x_true=x_true, x_pred=x_pred, data_range=data_range),
        "MSSIM": compare_mssim(x_true=x_true, x_pred=x_pred, data_range=data_range),
        "ERGAS": compare_ergas(x_true=x_true, x_pred=x_pred, ratio=ratio),
        "SAM": compare_sam(x_true=x_true, x_pred=x_pred),
        "CrossCorrelation": compare_corr(x_true=x_true, x_pred=x_pred),
        "RMSE": compare_rmse(x_true=x_true, x_pred=x_pred),
    }


def sum_dict(a, b):
    """Elementwise dict sum for metric accumulation (eval_hsi.py:276-280)."""
    return {k: sum(d.get(k, 0) for d in (a, b)) for k in a.keys() | b.keys()}


def color_correction(lr_input, hr_output, num_channels=31):
    """Per-band mean/std matching of SR output to GT (eval_hsi.py:259-274)."""
    hr_mean = np.mean(hr_output, axis=(0, 1))
    hr_std = np.std(hr_output, axis=(0, 1))
    lr_mean = np.mean(lr_input, axis=(0, 1))
    lr_std = np.std(lr_input, axis=(0, 1))
    corrected = np.zeros(hr_output.shape, dtype=np.float32)
    # only the first num_channels bands are corrected (rest stay zero),
    # matching the reference's explicit channel loop.
    c = num_channels
    corrected[:, :, :c] = (
        (hr_output[:, :, :c] - hr_mean[:c]) / hr_std[:c] * lr_std[:c] + lr_mean[:c]
    )
    return np.clip(corrected, 0.0, 1.0)
