"""Golden fixtures for torch-style bicubic (F.interpolate parity)."""

import os
import sys

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def main():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(3)
    payload = {}
    for name, (h, w, s) in {
        "up4": (32, 32, 4), "up8": (16, 16, 8), "odd": (13, 17, 4)
    }.items():
        x = rng.rand(h, w, 5).astype(np.float32)
        xt = torch.from_numpy(x).permute(2, 0, 1)[None]
        y = F.interpolate(xt, scale_factor=s, mode="bicubic")
        payload[f"{name}__in"] = x
        payload[f"{name}__out"] = y[0].permute(1, 2, 0).numpy()
        payload[f"{name}__scale"] = np.array([s])
    np.savez_compressed(os.path.join(OUT, "torch_bicubic_golden.npz"), **payload)
    print("wrote torch_bicubic_golden.npz")


if __name__ == "__main__":
    sys.exit(main())
