"""Param-count goldens for the baseline zoo from the reference modules.

Instantiates the reference SSPSR/GELIN/EDSR/GDRNN/MCNet (torch CPU) at
fixed configs and records parameter counts; the flax rebuilds must match
exactly (same layer inventory == same count).
"""

import importlib.util
import os
import sys
import types

import numpy as np

REF = os.environ.get("REFERENCE_DIR", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def stub_missing():
    for missing in ("sewar", "icvl_data", "MCNet_missing"):
        mod = types.ModuleType(missing)
        mod.LoadData = object
        sys.modules.setdefault(missing, mod)


def count(model):
    return sum(p.numel() for p in model.parameters())


def main():
    stub_missing()
    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "GAE"))

    import torch

    # the reference model forwards hard-code .cuda(); make that a no-op
    # so goldens can be generated on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.set_grad_enabled(False)
    torch.manual_seed(0)

    payload = {}

    sspsr = load_module(os.path.join(REF, "SSPSR.py"), "ref_sspsr2")
    m = sspsr.SSPSR(n_subs=8, n_ovls=2, n_colors=31, n_blocks=3, n_feats=16,
                    n_scale=4, res_scale=0.1, use_share=True)
    payload["sspsr_params"] = count(m)

    # weight-level forward golden (converter rules cover SSPSR's key names)
    m.eval()
    rng2 = np.random.RandomState(5)
    xs = rng2.rand(1, 31, 8, 8).astype(np.float32)
    ys = m(torch.from_numpy(xs), torch.from_numpy(xs))
    np.savez_compressed(
        os.path.join(OUT, "sspsr_forward_golden.npz"),
        x=xs, y=ys.numpy(),
        **{f"sd::{k}": v.numpy() for k, v in m.state_dict().items()},
    )

    gelin = load_module(os.path.join(REF, "GELIN.py"), "ref_gelin2")
    m = gelin.GELIN(n_feats=16, n_colors=31, kernel_size=3, pooling_r=4,
                    n_subs=8, n_ovls=2, blocks=2, scale=4)
    payload["gelin_params"] = count(m)

    import utils as ref_utils

    for name in ("SAM", "PSNR_GPU", "get_paths", "TrainsetFromFolder"):
        if not hasattr(ref_utils, name):
            setattr(ref_utils, name, object)
    sys.modules.setdefault("MCNet", load_module(
        os.path.join(REF, "GAE", "MCNet.py"), "ref_mcnet"))

    mcnet = sys.modules["MCNet"]
    m = mcnet.MCNet(scale=4, n_colors=31, n_feats=8)
    payload["mcnet_params"] = count(m)

    edsr = load_module(os.path.join(REF, "GAE", "EDSR.py"), "ref_edsr")
    m = edsr.EDSR(n_resblocks=2, n_feats=16, n_colors=31, res_scale=1)
    payload["edsr_params"] = count(m)

    gdrrn = load_module(
        os.path.join(REF, "GAE", "models_GDRRN.py"), "ref_gdrrn2"
    )
    m = gdrrn.GDRNN(input_chnl_hsi=31, group=4)
    payload["gdrrn_params"] = count(m)

    np.savez(os.path.join(OUT, "baseline_params_golden.npz"),
             **{k: np.int64(v) for k, v in payload.items()})
    print(payload)


if __name__ == "__main__":
    main()
