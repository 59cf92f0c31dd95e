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


def _smooth_spectra(rng, k, c, passes=3):
    """k smooth random spectral signatures (k, c)."""
    mix = rng.rand(k, c)
    for _ in range(passes):
        mix = 0.5 * mix + 0.25 * np.roll(mix, 1, 1) + 0.25 * np.roll(mix, -1, 1)
    return mix


def synth_cube_smooth(rng, h, w, c):
    """Round-1/2 generator: low-frequency spatial fields mixed across a
    random spectral basis. Too easy — bicubic scores ~40 dB on these
    (BENCHMARKS.md round-1 note), so the diffusion had nothing to learn."""
    n_basis = 6
    fields = []
    for _ in range(n_basis):
        small = rng.rand(h // 8 + 2, w // 8 + 2)
        fields.append(imresize(small, output_shape=(h, w)))
    fields = np.stack(fields, -1)  # (h, w, n_basis)
    mix = _smooth_spectra(rng, n_basis, c)
    cube = fields @ mix
    cube += 0.02 * rng.rand(h, w, c)
    cube -= cube.min()
    cube /= cube.max()
    return cube.astype(np.float32)


def synth_cube(rng, h, w, c):
    """Structured Pavia-like cube: piecewise-constant material regions
    with sharp boundaries + multi-octave (1/f) texture + spectrally
    correlated detail.

    Emulates what makes real HSI scenes hard for x4 SR: material edges
    (Voronoi cells + rectangular 'building' overlays) that bicubic blurs,
    and sub-8-px texture octaves destroyed by the downsample that the
    model must reconstruct. Each material has a smooth spectral
    signature; per-pixel intensity modulates it, and a low-rank
    band-correlated texture term breaks the exact rank-K structure.
    """
    k = 12
    # material label map: Voronoi cells over random seeds ...
    seeds = rng.rand(k, 2) * [h, w]
    yy, xx = np.mgrid[0:h, 0:w]
    d2 = (yy[..., None] - seeds[:, 0]) ** 2 + (xx[..., None] - seeds[:, 1]) ** 2
    label = np.argmin(d2, axis=-1)
    # ... plus rectangular overlays (urban blocks, sharp axis-aligned edges)
    for _ in range(10):
        rh = rng.randint(h // 16, h // 3)
        rw = rng.randint(w // 16, w // 3)
        y0 = rng.randint(0, h - rh)
        x0 = rng.randint(0, w - rw)
        label[y0:y0 + rh, x0:x0 + rw] = rng.randint(k)

    # multi-octave 1/f value noise, includes octaves finer than the x4
    # downsample kernel (cell sizes 2 and 4 px)
    tex = np.zeros((h, w), np.float32)
    for cell, amp in [(2, 0.20), (4, 0.30), (8, 0.45), (16, 0.65), (32, 1.0)]:
        small = rng.rand(max(h // cell, 1) + 2, max(w // cell, 1) + 2)
        tex += amp * (imresize(small, output_shape=(h, w)) - 0.5)
    tex /= np.abs(tex).max()

    spectra = _smooth_spectra(rng, k, c)          # (k, c) in [0,1]
    # spread material brightness apart so edges carry real contrast
    spectra = 0.15 + 0.7 * spectra * rng.uniform(0.4, 1.0, (k, 1))
    cube = spectra[label]                          # (h, w, c)
    cube *= (1.0 + 0.5 * tex)[..., None]

    # low-rank band-correlated texture detail (breaks rank-k structure)
    n_basis = 4
    fields = []
    for _ in range(n_basis):
        small = rng.rand(h // 4 + 2, w // 4 + 2)
        fields.append(imresize(small, output_shape=(h, w)) - 0.5)
    detail = np.stack(fields, -1) @ _smooth_spectra(rng, n_basis, c)
    cube += 0.15 * detail
    cube += 0.01 * rng.rand(h, w, c)

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
    ap.add_argument("--style", choices=["structured", "smooth"],
                    default="structured",
                    help="'structured' (material edges + 1/f texture, the "
                         "realistic default) or the round-1 'smooth' blobs")
    args = ap.parse_args()

    rng = np.random.RandomState(args.seed)
    for sub in ["mat_scenes", "npy_scenes", "pairs/train", "pairs/test"]:
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)

    gen = synth_cube if args.style == "structured" else synth_cube_smooth
    for i in range(args.scenes):
        cube = gen(rng, args.size, args.size, args.channels)
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
