"""Generate synthetic HSI datasets for end-to-end tests and benches.

Creates Pavia-like scenes (smooth spatial structure with correlated
spectra) in every format the data layer supports:
  * {out}/mat_scenes/  — .mat files with a 'block' HWC array (HSTrainingData)
  * {out}/npy_scenes/  — .npy HWC cubes (HSTestData)
  * {out}/pairs/train/ — .mat with 'lr'/'hr' CHW pairs (TrainsetFromFolder)
  * {out}/pairs/test/  — .mat with 'LR'/'HR' HWC pairs (TestsetFromFolder)
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hsi_dmgasr_tpu.data.imresize import imresize  # noqa: E402


def synth_cube(rng, h, w, c):
    """Smooth random cube: low-frequency spatial fields mixed across a
    random spectral basis, plus mild noise."""
    n_basis = 6
    fields = []
    for _ in range(n_basis):
        small = rng.rand(h // 8 + 2, w // 8 + 2)
        fields.append(imresize(small, output_shape=(h, w)))
    fields = np.stack(fields, -1)  # (h, w, n_basis)
    mix = rng.rand(n_basis, c)
    # smooth spectra: cumulative blur over bands
    for _ in range(3):
        mix = 0.5 * mix + 0.25 * np.roll(mix, 1, 1) + 0.25 * np.roll(mix, -1, 1)
    cube = fields @ mix
    cube += 0.02 * rng.rand(h, w, c)
    cube -= cube.min()
    cube /= cube.max()
    return cube.astype(np.float32)


def main():
    import scipy.io as sio

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/hsi_synth")
    ap.add_argument("--channels", type=int, default=102)
    ap.add_argument("--scenes", type=int, default=3)
    ap.add_argument("--size", type=int, default=160)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    for sub in ["mat_scenes", "npy_scenes", "pairs/train", "pairs/test"]:
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)

    for i in range(args.scenes):
        cube = synth_cube(rng, args.size, args.size, args.channels)
        sio.savemat(
            os.path.join(args.out, "mat_scenes", f"scene_{i}.mat"),
            {"block": cube},
        )
        np.save(os.path.join(args.out, "npy_scenes", f"scene_{i}.npy"), cube)

        # paired crops (HR 128, LR 32 at x4) like the MATLAB-preprocessed sets
        ph = min(args.size, 128)
        hr = cube[:ph, :ph, :]
        lr = imresize(hr, output_shape=(ph // args.scale, ph // args.scale))
        lr = np.clip(lr, 0, 1).astype(np.float32)
        sio.savemat(
            os.path.join(args.out, "pairs", "train", f"pair_{i}.mat"),
            {"lr": np.moveaxis(lr, -1, 0), "hr": np.moveaxis(hr, -1, 0)},
        )
        sio.savemat(
            os.path.join(args.out, "pairs", "test", f"pair_{i}.mat"),
            {"LR": lr, "HR": hr},
        )
    print("wrote", args.scenes, "scenes to", args.out)


if __name__ == "__main__":
    main()
