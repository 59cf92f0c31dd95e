"""Golden loss values from the reference implementations (torch CPU)."""

import importlib.util
import os
import sys

import numpy as np

REF = os.environ.get("REFERENCE_DIR", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    import types

    import torch

    # absent optional deps of the reference modules (metrics-only usage)
    for missing in ("sewar", "skimage", "skimage.metrics", "icvl_data", "cv2x"):
        mod = types.ModuleType(missing)
        mod.LoadData = object
        sys.modules.setdefault(missing, mod)
    sys.path.insert(0, REF)  # GELIN/SSPSR import `common` from the ref root
    gelin = load_module(os.path.join(REF, "GELIN.py"), "ref_gelin")
    sspsr = load_module(os.path.join(REF, "SSPSR.py"), "ref_sspsr")
    # models_GDRRN pulls helper names that live in GAE/utils.py, not the
    # root utils.py; stub them (unused by the loss class).
    import utils as ref_utils

    for name in ("SAM", "PSNR_GPU", "get_paths", "TrainsetFromFolder"):
        if not hasattr(ref_utils, name):
            setattr(ref_utils, name, object)
    sys.modules.setdefault("MCNet", types.ModuleType("MCNet"))
    gdrrn = load_module(
        os.path.join(REF, "GAE", "models_GDRRN.py"), "ref_gdrrn"
    )

    rng = np.random.RandomState(11)
    y = rng.rand(2, 7, 12, 12).astype(np.float32)
    gt = rng.rand(2, 7, 12, 12).astype(np.float32)
    yt, gtt = torch.from_numpy(y), torch.from_numpy(gt)

    payload = {"y": y, "gt": gt}
    payload["h_loss"] = gelin.HLoss(0.3, 0.1)(yt, gtt).item()
    payload["cal_sam"] = gelin.cal_sam(yt, gtt).item()
    payload["hybrid_loss"] = sspsr.HybridLoss(
        spatial_tv=True, spectral_tv=True
    )(yt, gtt).item()
    payload["spe_loss"] = gdrrn.myloss_spe(N=2)(yt, gtt).item()
    np.savez(os.path.join(OUT, "loss_golden.npz"), **payload)
    print({k: v for k, v in payload.items() if np.isscalar(v)})


if __name__ == "__main__":
    main()
