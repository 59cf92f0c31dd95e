"""Generate GAE encode/decode golden outputs from the shipped checkpoints.

Loads each GAE_4_*.pth via the stub-class unpickler, attaches minimal
torch forward implementations to the stubs (the semantics documented in
SURVEY.md for AE.py:256-361), runs encode/decode on a fixed random cube
on CPU, and saves the results as committed .npz fixtures.

The flax parity test (tests/test_gae_parity.py) then checks that the
converted checkpoints reproduce these outputs through XLA — two
independent executors over the same weights.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hsi_dmgasr_tpu.io.convert_torch import (  # noqa: E402
    gae_config_from_module,
    load_torch_module,
    stub_class,
)

REF = os.environ.get("REFERENCE_DIR", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def attach_forwards():
    import torch

    def res_forward(self, x):
        return self.body(x) * self.res_scale + x

    stub_class("common", "ResBlock").forward = res_forward
    stub_class("common", "ResAttentionBlock").forward = res_forward

    def ca_forward(self, x):
        return x * self.conv_du(self.avg_pool(x))

    stub_class("common", "CALayer").forward = ca_forward

    def seq_forward(self, x):
        for m in self._modules.values():
            x = m(x)
        return x

    stub_class("common", "Upsampler").forward = seq_forward

    stub_class("__main__", "SSB").forward = lambda self, x: self.spc(self.spa(x))
    stub_class("__main__", "SSPN").forward = lambda self, x: self.net(x) + x

    def branch_forward(self, x):
        y = self.upsample(self.body(self.head(x)))
        tail = getattr(self, "tail", None)
        if tail is not None:
            y = tail(y)
        return y

    stub_class("__main__", "BranchUnit").forward = branch_forward
    enc = stub_class("__main__", "Encoder")
    enc.forward = lambda self, x: self.final(self.branch(x))
    dec = stub_class("__main__", "Decoder")
    dec.forward = lambda self, x: self.final(self.branch(x))
    gae = stub_class("__main__", "GAE")

    def gae_encode(self, x):
        zs = []
        for sta, end in zip(self.start_idx, self.end_idx):
            zs.append(self.Encoder(x[:, sta:end]))
        return zs

    def gae_decode(self, x_shape, z_list):
        b, c, h, w = x_shape
        y = torch.zeros(b, c, h, w)
        counter = torch.zeros(c)
        for (sta, end), z in zip(zip(self.start_idx, self.end_idx), z_list):
            y[:, sta:end] += self.Decoder(z)
            counter[sta:end] += 1
        y = y / counter[None, :, None, None]
        y1 = self.final(self.trunk(y))
        return y1 + y

    gae.encode_cpu = gae_encode
    gae.decode_cpu = gae_decode


def main():
    import torch

    attach_forwards()
    os.makedirs(OUT, exist_ok=True)
    torch.set_grad_enabled(False)

    for name in ["GAE_4_Pav", "GAE_4_Cav", "GAE_4_Har", "GAE_4_Chi"]:
        path = os.path.join(REF, "GAE_pretrained", f"{name}.pth")
        mod = load_torch_module(path).eval()
        cfg = gae_config_from_module(mod)
        rng = np.random.RandomState(42)
        x = rng.rand(2, cfg["n_colors"], 24, 24).astype(np.float32)
        xt = torch.from_numpy(x)
        z_list = mod.encode_cpu(xt)
        recon = mod.decode_cpu(tuple(xt.shape), z_list)
        payload = {
            "x": x,
            "z": np.stack([z.numpy() for z in z_list], axis=1),  # (B,G,3,H,W)
            "recon": recon.numpy(),
            "config": np.array(
                [cfg["n_subs"], cfg["n_ovls"], cfg["n_colors"], cfg["n_feats"]],
                dtype=np.int64,
            ),
        }
        np.savez_compressed(os.path.join(OUT, f"gae_{name}.npz"), **payload)
        print(name, cfg, "->", payload["z"].shape, payload["recon"].shape)


if __name__ == "__main__":
    main()
