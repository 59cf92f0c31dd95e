"""A/B the from-noise full-chain question on the REFERENCE stack.

Round-3 diagnosed the stage-2 quality plateau to the reverse-chain
entry (cosine-T=20 starts at gamma ~ 2.5e-3) and closed it with
truncated cond-initialized sampling (t_start). What remained an
assertion was that the reference itself — its own training loop
(sr_gae.py:221-250: per-group feed/optimize on GAE latents) and its
own from-pure-noise sampler (model/sr3_modules/diffusion.py:177-201)
— fails identically on this data. This tool trains the REFERENCE
modules in-process (torch CPU) at a tiny-but-same config:

  * same structured scenes, same bit-exact imresize degradation,
    same GAE encoder (shipped GAE_4_Pav weights), same latent affine,
  * reference UNet + GaussianDiffusion + L1(sum)/numel loss +
    per-group Adam steps, exactly model/model.py:51-59,
  * validated BOTH ways every val_freq outer steps: the reference's
    own from-noise p_sample_loop, and a truncated t_start entry
    (x_t0 = sqrt(g)*cond + sqrt(1-g)*eps, then the reference's
    p_sample steps down to 0).

The rebuild twin is configs/ab_fullchain.json run through cli.sr_gae
on CPU at the same scale; tools/ab_fullchain_summary.py composes the
table. A from-noise collapse HERE, with t_start rescuing the same
checkpoints, demonstrates the chain-entry failure is data/schedule-
inherent, not a rebuild bug.

Usage:
    python tools/ab_fullchain_torch.py --outer_steps 900 \
        --out /tmp/ab_torch.json
"""

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF = os.environ.get("REFERENCE_DIR", "/root/reference")

UNET_CFG = dict(in_channel=6, out_channel=3, inner_channel=32,
                norm_groups=16, res_blocks=2, dropout=0.0)
CHANNEL_MULTS = (1, 2, 4)
ATTN_RES = (8,)
SCHEDULE = {"schedule": "cosine", "n_timestep": 20,
            "linear_start": 1e-6, "linear_end": 1e-2}


def _load_ref_module(relpath, name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_scenes(d, pattern):
    paths = sorted(glob.glob(os.path.join(d, pattern)))
    if not paths:
        raise SystemExit(f"no scenes under {d} (regenerate with "
                         "tools/make_synth_data.py, docs/runs/README.md)")
    out = []
    for p in paths:
        if p.endswith(".npy"):
            out.append(np.load(p).astype(np.float32))
        else:
            import scipy.io as sio

            out.append(np.asarray(sio.loadmat(
                p, verify_compressed_data_integrity=False)["block"],
                np.float32))
    return out


def degrade(hr, scale=4):
    """HR -> SR exactly as the rebuild's stage-2 loader: bit-exact
    MATLAB imresize down then back up (data/lrhr.py semantics)."""
    from hsi_dmgasr_tpu.data.imresize import imresize

    h, w = hr.shape[:2]
    lr = np.clip(imresize(hr, output_shape=(h // scale, w // scale)), 0, 1)
    return np.clip(imresize(lr, output_shape=(h, w)), 0, 1).astype(np.float32)


class TorchSide:
    """Reference modules wired exactly as sr_gae.py composes them."""

    def __init__(self, ckpt, crop, shift, scale, seed, lr=1e-4):
        import torch

        from make_gae_golden import attach_forwards

        from hsi_dmgasr_tpu.io.convert_torch import load_torch_module

        sys.modules.setdefault("tqdm", __import__("types").ModuleType("tqdm"))
        if not hasattr(sys.modules["tqdm"], "tqdm"):
            sys.modules["tqdm"].tqdm = lambda it, **kw: it

        attach_forwards()
        self.gae = load_torch_module(ckpt).eval()
        for p in self.gae.parameters():
            p.requires_grad_(False)

        unet_mod = _load_ref_module("model/sr3_modules/unet.py", "_ab_unet")
        diff_mod = _load_ref_module(
            "model/sr3_modules/diffusion.py", "_ab_diff")
        torch.manual_seed(seed)
        self.net = unet_mod.UNet(channel_mults=CHANNEL_MULTS,
                                 attn_res=ATTN_RES, image_size=crop,
                                 **UNET_CFG)
        self.gd = diff_mod.GaussianDiffusion(
            self.net, image_size=crop, channels=3, loss_type="l1",
            conditional=True)
        self.gd.set_loss("cpu")
        self.gd.set_new_noise_schedule(SCHEDULE, device="cpu")
        self.opt = torch.optim.Adam(self.net.parameters(), lr=lr)
        self.shift, self.scale = shift, scale

    def encode(self, cubes_hwc):
        """(B,H,W,C) -> list of per-group (B,3,h,w) affine-mapped latents."""
        import torch

        x = torch.from_numpy(
            np.ascontiguousarray(cubes_hwc.transpose(0, 3, 1, 2)))
        zs = self.gae.encode_cpu(x)
        return [(z - self.shift) * self.scale for z in zs]

    def decode(self, shape_bchw, z_list):
        import torch

        z_list = [z / self.scale + self.shift for z in z_list]
        y = self.gae.decode_cpu(shape_bchw, list(z_list))
        y[y < 0] = 0
        y[y > 1] = 1.0
        return y

    def train_groups(self, z_hr_list, z_sr_list):
        """sr_gae.py:245-250 + model/model.py:51-59: one Adam step per
        band group, L1(sum)/numel."""
        import torch

        losses = []
        for z_hr, z_sr in zip(z_hr_list, z_sr_list):
            self.opt.zero_grad()
            l_pix = self.gd({"HR": z_hr, "SR": z_sr})
            b, c, h, w = z_hr.shape
            l_pix = l_pix.sum() / int(b * c * h * w)
            l_pix.backward()
            self.opt.step()
            losses.append(float(l_pix))
        return float(np.mean(losses))

    def sample_from_noise(self, z_sr_list):
        """The reference's own inference: p_sample_loop per group."""
        import torch

        self.net.eval()
        with torch.no_grad():
            out = [torch.unsqueeze(self.gd.super_resolution(
                z, continous=False), 0) for z in z_sr_list]
        self.net.train()
        return out

    def sample_truncated(self, z_sr_list, t_start=4):
        """Truncated cond-initialized entry, then the reference's own
        p_sample steps (the rebuild's gaussian.init_from_cond applied
        to the reference sampler)."""
        import torch

        self.net.eval()
        out = []
        with torch.no_grad():
            for cond in z_sr_list:
                g = float(self.gd.sqrt_alphas_cumprod_prev[t_start])
                x = g * cond + float(np.sqrt(1.0 - g * g)) * \
                    torch.randn_like(cond)
                for i in reversed(range(t_start)):
                    x = self.gd.p_sample(x, i, condition_x=cond)
                out.append(x)
        self.net.train()
        return out


def validate(side, val_hr, val_sr, t_start):
    from hsi_dmgasr_tpu.evalhsi import color_correction, quality_assessment

    rows = {"from_noise": [], "t_start": []}
    for hr, sr in zip(val_hr, val_sr):
        z_sr = side.encode(sr[None])
        shape = (1, hr.shape[2], hr.shape[0], hr.shape[1])
        for mode, sampler in (("from_noise", side.sample_from_noise),
                              ("t_start", side.sample_truncated)):
            z_out = sampler(z_sr) if mode == "from_noise" else \
                sampler(z_sr, t_start)
            y = side.decode(shape, z_out)[0].numpy().transpose(1, 2, 0)
            y_cc = color_correction(hr, y, num_channels=hr.shape[-1])
            q = quality_assessment(hr, y_cc, data_range=1.0, ratio=4)
            rows[mode].append(float(q["MPSNR"]))
    return {k: float(np.mean(v)) for k, v in rows.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=os.path.join(
        REF, "GAE_pretrained", "GAE_4_Pav.pth"))
    ap.add_argument("--train_scenes", default="/tmp/hsi_r3/train/mat_scenes")
    ap.add_argument("--val_scenes", default="/tmp/hsi_r3/val/npy_scenes")
    ap.add_argument("--crop", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--outer_steps", type=int, default=900)
    ap.add_argument("--val_freq", type=int, default=150)
    ap.add_argument("--t_start", type=int, default=4)
    ap.add_argument("--latent_shift", type=float, default=-0.5431)
    ap.add_argument("--latent_scale", type=float, default=1.662)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/ab_torch.json")
    args = ap.parse_args()

    import torch

    torch.manual_seed(args.seed)
    rng = np.random.RandomState(args.seed)

    train = load_scenes(args.train_scenes, "*.mat")
    val = [v[:args.crop * 2, :args.crop * 2]
           for v in load_scenes(args.val_scenes, "*.npy")]
    val_hr = [v[:args.crop, :args.crop] for v in val]
    val_sr = [degrade(h) for h in val_hr]

    side = TorchSide(args.ckpt, args.crop, args.latent_shift,
                     args.latent_scale, args.seed)

    curve = []
    t0 = time.time()
    for step in range(1, args.outer_steps + 1):
        crops = []
        for _ in range(args.batch):
            s = train[rng.randint(len(train))]
            i = rng.randint(s.shape[0] - args.crop + 1)
            j = rng.randint(s.shape[1] - args.crop + 1)
            c = s[i:i + args.crop, j:j + args.crop]
            if rng.rand() < 0.5:
                c = c[:, ::-1]
            if rng.rand() < 0.5:
                c = c[::-1]
            crops.append(np.ascontiguousarray(c))
        hr = np.stack(crops)
        sr = np.stack([degrade(c) for c in crops])
        z_hr = side.encode(hr)
        z_sr = side.encode(sr)
        loss = side.train_groups(z_hr, z_sr)

        if step % args.val_freq == 0 or step == args.outer_steps:
            m = validate(side, val_hr, val_sr, args.t_start)
            row = {"outer_step": step, "l_pix": loss,
                   "mpsnr_cc_from_noise": m["from_noise"],
                   "mpsnr_cc_t_start": m["t_start"],
                   "elapsed_s": round(time.time() - t0, 1)}
            curve.append(row)
            print(json.dumps(row), flush=True)
            with open(args.out, "w") as f:
                json.dump({"config": vars(args), "curve": curve}, f,
                          indent=1)
    print(json.dumps({"final": curve[-1]}))


if __name__ == "__main__":
    main()
