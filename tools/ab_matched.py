"""Matched-init, matched-data A/B: torch reference vs rebuild.

Round-4's A/B (tools/ab_fullchain_torch.py + configs/ab_fullchain.json)
proved the from-noise chain-entry collapse is shared by the reference's
own stack, but left a 2.5 dB absolute gap between the stacks
(t_start MPSNR_cc 27.10 torch vs 24.58 rebuild) explained only by
"independent init/RNG/data order" (VERDICT r4 weak #3). This tool kills
the confound: it trains BOTH stacks in one process with

  * the SAME UNet initialization — the torch UNet's state_dict is
    converted into flax params at step 0 (io/convert_torch
    .state_dict_to_flax, the converter the e2e parity test proved exact
    to −1.4e-8 dB composed MPSNR),
  * the SAME batch stream — one numpy RandomState draws every crop /
    flip, and the identical (hr, sr) numpy arrays feed both sides
    (degradation is the shared bit-exact imresize),
  * the SAME training dynamics schema — per-group sequential Adam steps
    (sr_gae.py:245-250 == pipeline.train_step(per_group=True)),
    L1(sum)/numel loss, lr 1e-4, no EMA, dropout 0.

The only remaining difference is the per-step noise/γ RNG (same
distribution, different draws) and framework numerics. Both sides are
validated from-noise and with truncated t_start entry every val_freq
outer steps on the same val scenes.

Usage:
    python tools/ab_matched.py --outer_steps 900 --out /tmp/ab_matched.json
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ab_fullchain_torch import (  # noqa: E402
    ATTN_RES, CHANNEL_MULTS, SCHEDULE, UNET_CFG,
    TorchSide, degrade, load_scenes, validate,
)


class JaxSide:
    """The rebuild composed exactly as cli.sr_gae does, with the torch
    UNet init injected at step 0."""

    def __init__(self, ckpt, crop, shift, scale, torch_net, lr=1e-4,
                 seed=0):
        import jax

        from hsi_dmgasr_tpu.io.convert_torch import (
            load_torch_gae, state_dict_to_flax,
        )
        from hsi_dmgasr_tpu.pipeline import DMGASRPipeline
        from hsi_dmgasr_tpu.train.ddpm_model import DDPMModel

        variables, cfg = load_torch_gae(ckpt)
        opt = {
            "name": "ab_matched",
            "gpu_ids": [0],
            "gae": {"latent_shift": shift, "latent_scale": scale},
            "model": {
                "which_model_G": "sr3",
                "finetune_norm": False,
                "unet": {
                    "in_channel": UNET_CFG["in_channel"],
                    "out_channel": UNET_CFG["out_channel"],
                    "inner_channel": UNET_CFG["inner_channel"],
                    "norm_groups": UNET_CFG["norm_groups"],
                    "channel_multiplier": list(CHANNEL_MULTS),
                    "attn_res": list(ATTN_RES),
                    "res_blocks": UNET_CFG["res_blocks"],
                    "dropout": UNET_CFG["dropout"],
                },
                "beta_schedule": {"train": dict(SCHEDULE),
                                  "val": dict(SCHEDULE)},
                "diffusion": {"image_size": crop, "channels": 3,
                              "conditional": True},
            },
            "train": {"optimizer": {"type": "adam", "lr": lr}},
            "path": {},
        }
        ddpm = DDPMModel(opt, seed=seed,
                         example_shape=(1, crop, crop,
                                        UNET_CFG["in_channel"]))
        sd = {k: v.detach().cpu().numpy()
              for k, v in torch_net.state_dict().items()}
        converted = state_dict_to_flax(sd)
        ddpm.state = ddpm.state.replace(params=converted["params"])
        self.ddpm = ddpm
        self.pipeline = DMGASRPipeline(opt, variables, cfg, ddpm=ddpm)
        self._key = jax.random.PRNGKey(seed + 7919)

    def train(self, hr, sr):
        import jax

        self._key, k = jax.random.split(self._key)
        loss = self.pipeline.train_step({"HR": hr, "SR": sr}, key=k,
                                        per_group=True)
        return float(loss)

    def _sample(self, cond, key, t_start=None):
        denoise_fn = self.ddpm._eval_denoise_fn()
        return self.ddpm.val_diffusion.sample_loop(
            denoise_fn, key, cond=cond, t_start=t_start)

    def validate(self, val_hr, val_sr, t_start):
        import jax
        import jax.numpy as jnp

        from hsi_dmgasr_tpu.evalhsi import (
            color_correction, quality_assessment,
        )

        rows = {"from_noise": [], "t_start": []}
        for hr, sr in zip(val_hr, val_sr):
            z_sr = self.pipeline.encode(jnp.asarray(sr[None]))
            cond = self.pipeline._fold(z_sr)
            for mode, ts in (("from_noise", None), ("t_start", t_start)):
                self._key, k = jax.random.split(self._key)
                z_out = self._sample(cond, k, t_start=ts)
                y = self.pipeline.decode(self.pipeline._unfold(z_out, 1))
                y = np.clip(np.asarray(y)[0], 0.0, 1.0)
                y_cc = color_correction(hr, y, num_channels=hr.shape[-1])
                q = quality_assessment(hr, y_cc, data_range=1.0, ratio=4)
                rows[mode].append(float(q["MPSNR"]))
        return {k: float(np.mean(v)) for k, v in rows.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=os.path.join(
        os.environ.get("REFERENCE_DIR", "/root/reference"),
        "GAE_pretrained", "GAE_4_Pav.pth"))
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
    ap.add_argument("--out", default="/tmp/ab_matched.json")
    args = ap.parse_args()

    # both sides on host CPU: torch has no TPU and contending for the
    # axon chip with a live training run is forbidden (CLAUDE.md)
    import jax

    jax.config.update("jax_platforms", "cpu")
    import torch

    torch.manual_seed(args.seed)
    rng = np.random.RandomState(args.seed)

    train = load_scenes(args.train_scenes, "*.mat")
    val = [v[:args.crop * 2, :args.crop * 2]
           for v in load_scenes(args.val_scenes, "*.npy")]
    val_hr = [v[:args.crop, :args.crop] for v in val]
    val_sr = [degrade(h) for h in val_hr]

    t_side = TorchSide(args.ckpt, args.crop, args.latent_shift,
                       args.latent_scale, args.seed)
    j_side = JaxSide(args.ckpt, args.crop, args.latent_shift,
                     args.latent_scale, t_side.net, seed=args.seed)

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

        z_hr = t_side.encode(hr)
        z_sr = t_side.encode(sr)
        t_loss = t_side.train_groups(z_hr, z_sr)
        j_loss = j_side.train(hr, sr)

        if step % args.val_freq == 0 or step == args.outer_steps:
            tm = validate(t_side, val_hr, val_sr, args.t_start)
            jm = j_side.validate(val_hr, val_sr, args.t_start)
            row = {"outer_step": step,
                   "l_pix_torch": t_loss, "l_pix_jax": j_loss,
                   "torch_from_noise": tm["from_noise"],
                   "torch_t_start": tm["t_start"],
                   "jax_from_noise": jm["from_noise"],
                   "jax_t_start": jm["t_start"],
                   "elapsed_s": round(time.time() - t0, 1)}
            curve.append(row)
            print(json.dumps(row), flush=True)
            with open(args.out, "w") as f:
                json.dump({"config": {k: v for k, v in vars(args).items()},
                           "curve": curve}, f, indent=1)
    print(json.dumps({"final": curve[-1]}))


if __name__ == "__main__":
    main()
