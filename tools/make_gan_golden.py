"""Forward goldens for the 3-D attention GAN (reference GAE/net.py).

Instantiates the reference Generator/Discriminator (torch CPU) on fixed
random inputs and records outputs + state_dicts + param counts. The
flax rebuild (models/baselines/gan3d.py) must reproduce the outputs
through the converted weights (tests/test_gan.py).

The discriminator's BatchNorm running stats are randomized before the
eval-mode forward so the golden also exercises the batch_stats
conversion path, not just the conv/pad/pool/linear stack.
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
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    import torch

    torch.set_grad_enabled(False)
    torch.manual_seed(0)

    net = load_module(os.path.join(REF, "GAE", "net.py"), "ref_gan_net")

    # bs=2: the reference's torch.squeeze calls drop ALL unit dims, so
    # bs=1 would squeeze the batch axis away and crash F.interpolate
    g = net.Generator(bs=2, c=1, l=31, h=8, w=8).eval()
    rng = np.random.RandomState(7)
    gx = rng.rand(2, 1, 31, 8, 8).astype(np.float32)
    gy = g(torch.from_numpy(gx))

    d = net.Discriminator(bs=2, c=1, l=31, h=32, w=32).eval()
    # nontrivial running stats -> the conversion of batch_stats is
    # actually verified (fresh stats are all-0 mean / all-1 var)
    srng = np.random.RandomState(11)
    for m in d.modules():
        if isinstance(m, torch.nn.BatchNorm3d):
            m.running_mean.copy_(torch.from_numpy(
                srng.randn(m.num_features).astype(np.float32) * 0.1))
            m.running_var.copy_(torch.from_numpy(
                (0.5 + srng.rand(m.num_features)).astype(np.float32)))
    dx = rng.rand(2, 1, 31, 32, 32).astype(np.float32)
    dy = d(torch.from_numpy(dx))

    payload = {
        "g_x": gx, "g_y": gy.numpy(),
        "d_x": dx, "d_y": dy.numpy(),
        "g_params": np.int64(sum(p.numel() for p in g.parameters())),
        "d_params": np.int64(sum(p.numel() for p in d.parameters())),
    }
    payload.update({f"gsd::{k}": v.numpy() for k, v in g.state_dict().items()})
    payload.update({f"dsd::{k}": v.numpy() for k, v in d.state_dict().items()})
    np.savez_compressed(os.path.join(OUT, "gan3d_forward_golden.npz"),
                        **payload)
    print("g_params", payload["g_params"], "d_params", payload["d_params"])
    print("g_y", gy.shape, "d_y", dy.shape)
    print("g sd keys:", list(g.state_dict())[:8])
    print("d sd keys:", list(d.state_dict())[:12])


if __name__ == "__main__":
    main()
