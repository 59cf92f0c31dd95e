"""Image conversion/saving helpers (core/metrics.py:11-58 equivalents).

NHWC-native: tensor2img takes (B, H, W, C) / (H, W, C) / (H, W) arrays in
[min_max] float, tiles batches into a sqrt grid like torchvision
make_grid, and returns uint8 HWC. save_img3 picks 3 display bands from an
HSI cube (the reference hard-switches per dataset at core/metrics.py:49-58;
here the bands are an argument with the reference's Harvard default).
"""

from __future__ import annotations

import math

import numpy as np


def tensor2img(arr, out_type=np.uint8, min_max=(0, 1)):
    arr = np.asarray(arr, dtype=np.float32)
    arr = np.clip(arr, *min_max)
    arr = np.squeeze(arr)
    if arr.ndim == 4:
        n = arr.shape[0]
        nrow = int(math.sqrt(n))
        ncol = int(math.ceil(n / nrow))
        b, h, w, c = arr.shape
        grid = np.zeros((nrow * h, ncol * w, c), arr.dtype)
        for i in range(n):
            r, col = divmod(i, ncol)
            grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = arr[i]
        arr = grid
    elif arr.ndim not in (2, 3):
        raise TypeError(f"Only 2D/3D/4D supported, got {arr.ndim}D")
    if out_type == np.uint8:
        arr = (arr * 255.0).round()
    return arr.astype(out_type)


def save_img(img, img_path):
    import cv2

    cv2.imwrite(img_path, img)


def save_img3(img, img_path, bands=(5, 15, 25)):
    """Save 3 selected HSI bands as an RGB image (core/metrics.py:51-58)."""
    import cv2

    if img.ndim == 3 and img.shape[2] > 3:
        img = img[:, :, list(bands)]
    cv2.imwrite(img_path, img)


def save_error_map(err, img_path):
    """Jet-colormapped absolute-error image (sr_gae.py:536-539, which
    uses matplotlib imshow(cmap='jet'); cv2's COLORMAP_JET equivalent)."""
    import cv2

    err = np.asarray(err, dtype=np.float32)
    if err.ndim == 3:
        err = err.mean(axis=2)
    scaled = np.clip(err / max(err.max(), 1e-8) * 255.0, 0, 255).astype(np.uint8)
    cv2.imwrite(img_path, cv2.applyColorMap(scaled, cv2.COLORMAP_JET))
