"""Scene cropping utility (reference GAE/crop.py:41-72).

Tiles large HSI scenes into fixed-size corner/center blocks saved as
.npy — the test-set preparation step for 512^2 evaluation blocks.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def corner_center_crops(img, size):
    """Four corners + center crops of an (H, W, C) scene."""
    h, w, _ = img.shape
    if h < size or w < size:
        raise ValueError(f"scene {img.shape} smaller than crop {size}")
    y_c = (h - size) // 2
    x_c = (w - size) // 2
    return {
        "tl": img[:size, :size],
        "tr": img[:size, w - size:],
        "bl": img[h - size:, :size],
        "br": img[h - size:, w - size:],
        "center": img[y_c:y_c + size, x_c:x_c + size],
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help=".mat (key) or .npy scene")
    p.add_argument("--key", default="block")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    if args.input.endswith(".npy"):
        img = np.load(args.input)
    else:
        import scipy.io as sio

        img = np.asarray(
            sio.loadmat(args.input, verify_compressed_data_integrity=False)[args.key]
        )
    os.makedirs(args.out, exist_ok=True)
    stem = os.path.splitext(os.path.basename(args.input))[0]
    for name, crop in corner_center_crops(img, args.size).items():
        np.save(os.path.join(args.out, f"{stem}_{name}.npy"),
                crop.astype(np.float32))
    print(f"wrote 5 crops of {args.size}^2 to {args.out}")


if __name__ == "__main__":
    main()
