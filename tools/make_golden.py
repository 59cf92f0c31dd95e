"""Generate golden test fixtures from the reference implementation.

Run once in the build environment (where /root/reference is mounted);
the resulting .npz files are committed so tests never need the reference.

Only pure-numpy reference modules are executed (imsize.py). Torch-dependent
golden data (GAE encode/decode outputs from the shipped checkpoints) is
produced by tools/make_gae_golden.py.
"""

import importlib.util
import os
import sys

import numpy as np

REF = os.environ.get("REFERENCE_DIR", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    os.makedirs(OUT, exist_ok=True)
    imsize = load_module(os.path.join(REF, "imsize.py"), "ref_imsize")

    rng = np.random.RandomState(0)
    cases = {}
    # the shapes the framework actually uses: train crop 128->32->128,
    # test crop 64->16->64, plus odd sizes and uint8 and 2-D inputs.
    img128 = rng.rand(128, 128, 5).astype(np.float32)
    cases["down_128_32"] = (img128, dict(output_shape=(32, 32)))
    cases["up_32_128"] = (
        imsize.imresize(img128, output_shape=(32, 32)).astype(np.float64),
        dict(output_shape=(128, 128)),
    )
    img64 = rng.rand(64, 64, 3).astype(np.float32)
    cases["down_64_16"] = (img64, dict(output_shape=(16, 16)))
    cases["scale_half"] = (img64, dict(scalar_scale=0.5))
    cases["scale_2x"] = (img64, dict(scalar_scale=2.0))
    cases["scale_3x"] = (rng.rand(17, 23, 2), dict(scalar_scale=3.0))
    cases["odd_shape"] = (rng.rand(37, 53, 4), dict(output_shape=(19, 29)))
    cases["gray_2d"] = (rng.rand(40, 40), dict(output_shape=(10, 10)))
    u8 = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
    cases["uint8"] = (u8, dict(output_shape=(64, 96)))

    payload = {}
    for name, (img, kw) in cases.items():
        out = imsize.imresize(img, **kw)
        payload[f"{name}__in"] = img
        payload[f"{name}__out"] = out
        payload[f"{name}__kw"] = np.array(
            [kw.get("scalar_scale") or 0.0]
            + list(kw.get("output_shape") or (0, 0)),
            dtype=np.float64,
        )
    np.savez_compressed(os.path.join(OUT, "imresize_golden.npz"), **payload)
    print("wrote", os.path.join(OUT, "imresize_golden.npz"))


if __name__ == "__main__":
    sys.exit(main())
