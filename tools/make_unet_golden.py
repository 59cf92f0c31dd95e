"""Generate UNet + diffusion golden fixtures from the reference modules.

Imports /root/reference/model/{sr3_modules,ddpm_modules} (torch, CPU) and
runs small-config forward passes with fixed inputs; saves state_dicts and
outputs so the flax UNet + GaussianDiffusion can be parity-tested without
torch at test time.
"""

import importlib.util
import os
import sys

import numpy as np

REF = os.environ.get("REFERENCE_DIR", "/root/reference")
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    import torch

    torch.manual_seed(0)
    torch.set_grad_enabled(False)
    os.makedirs(OUT, exist_ok=True)

    sr3_unet = load_module(
        os.path.join(REF, "model/sr3_modules/unet.py"), "ref_sr3_unet"
    )
    sr3_diff = load_module(
        os.path.join(REF, "model/sr3_modules/diffusion.py"), "ref_sr3_diff"
    )
    ddpm_unet = load_module(
        os.path.join(REF, "model/ddpm_modules/unet.py"), "ref_ddpm_unet"
    )

    payload = {}

    # ---- SR3 UNet forward (small config exercising attention + skips)
    net = sr3_unet.UNet(
        in_channel=6, out_channel=3, inner_channel=16, norm_groups=8,
        channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0,
        image_size=16,
    ).eval()
    rng = np.random.RandomState(7)
    x = rng.rand(2, 6, 16, 16).astype(np.float32)
    gamma = np.array([[0.3], [0.9]], dtype=np.float32)
    y = net(torch.from_numpy(x), torch.from_numpy(gamma))
    payload["sr3_x"] = x
    payload["sr3_gamma"] = gamma
    payload["sr3_y"] = y.numpy()
    sd = {f"sr3_sd::{k}": v.numpy() for k, v in net.state_dict().items()}
    payload.update(sd)

    # ---- SR3 UNet, full 5-level config (deep skip-stack bookkeeping)
    net5 = sr3_unet.UNet(
        in_channel=6, out_channel=3, inner_channel=8, norm_groups=4,
        channel_mults=(1, 2, 4, 8, 8), attn_res=(16,), res_blocks=2,
        dropout=0, image_size=32,
    ).eval()
    x5 = rng.rand(1, 6, 32, 32).astype(np.float32)
    g5 = np.array([[0.5]], dtype=np.float32)
    y5 = net5(torch.from_numpy(x5), torch.from_numpy(g5))
    payload["sr3d_x"] = x5
    payload["sr3d_gamma"] = g5
    payload["sr3d_y"] = y5.numpy()
    payload.update({f"sr3d_sd::{k}": v.numpy() for k, v in net5.state_dict().items()})

    # ---- DDPM UNet forward (BatchNorm variant, eval mode)
    dnet = ddpm_unet.UNet(
        in_channel=6, out_channel=3, inner_channel=16, norm_groups=8,
        channel_mults=(1, 2), attn_res=(8,), res_blocks=1, dropout=0,
        image_size=16,
    ).eval()
    t = np.array([3, 17], dtype=np.int64)
    dy = dnet(torch.from_numpy(x), torch.from_numpy(t))
    payload["ddpm_x"] = x
    payload["ddpm_t"] = t
    payload["ddpm_y"] = dy.numpy()
    payload.update({f"ddpm_sd::{k}": v.numpy() for k, v in dnet.state_dict().items()})

    # ---- schedules: all 7 types
    for sched in ["quad", "linear", "warmup10", "warmup50", "const", "jsd", "cosine"]:
        betas = sr3_diff.make_beta_schedule(sched, 20, 1e-6, 1e-2)
        if hasattr(betas, "numpy"):
            betas = betas.numpy()
        payload[f"betas_{sched}"] = np.asarray(betas)

    # ---- GaussianDiffusion: buffers + deterministic p_mean_variance
    gd = sr3_diff.GaussianDiffusion(
        net, image_size=16, channels=3, loss_type="l1", conditional=True
    )
    gd.set_new_noise_schedule(
        {"schedule": "cosine", "n_timestep": 20, "linear_start": 1e-6,
         "linear_end": 1e-2},
        device="cpu",
    )
    payload["buf_sqrt_alphas_cumprod_prev"] = gd.sqrt_alphas_cumprod_prev
    for name in ["betas", "alphas_cumprod", "sqrt_recip_alphas_cumprod",
                 "sqrt_recipm1_alphas_cumprod", "posterior_log_variance_clipped",
                 "posterior_mean_coef1", "posterior_mean_coef2"]:
        payload[f"buf_{name}"] = getattr(gd, name).numpy()

    xt = rng.rand(2, 3, 16, 16).astype(np.float32) * 2 - 1
    cond = rng.rand(2, 3, 16, 16).astype(np.float32) * 2 - 1
    for t_step in [0, 7, 19]:
        mean, logvar = gd.p_mean_variance(
            torch.from_numpy(xt), t_step, clip_denoised=True,
            condition_x=torch.from_numpy(cond),
        )
        payload[f"pmv_mean_{t_step}"] = mean.numpy()
        payload[f"pmv_logvar_{t_step}"] = np.asarray(logvar)
    payload["pmv_x"] = xt
    payload["pmv_cond"] = cond

    # ---- q_sample with fixed noise
    noise = rng.randn(2, 3, 16, 16).astype(np.float32)
    g = np.array([0.8], dtype=np.float32)
    qs = gd.q_sample(
        torch.from_numpy(xt),
        torch.from_numpy(g).view(-1, 1, 1, 1),
        noise=torch.from_numpy(noise),
    )
    payload["qs_noise"] = noise
    payload["qs_gamma"] = g
    payload["qs_out"] = qs.numpy()

    # ---- FULL reverse chain (T=20 cosine) with recorded per-step noise:
    # drives the reference p_sample per step (p_mean_variance + recorded
    # Gaussian, exactly p_sample_loop's update at diffusion.py:177-201)
    # so the composed jax scan can be replayed deterministically.
    chain_rng = np.random.RandomState(11)
    x = chain_rng.randn(1, 3, 16, 16).astype(np.float32)
    chain_cond = (chain_rng.rand(1, 3, 16, 16).astype(np.float32) * 2 - 1)
    payload["chain_x_init"] = x
    payload["chain_cond"] = chain_cond
    noises = []
    xt = torch.from_numpy(x)
    for t_step in reversed(range(20)):
        mean, logvar = gd.p_mean_variance(
            xt, t_step, clip_denoised=True,
            condition_x=torch.from_numpy(chain_cond),
        )
        nz = (chain_rng.randn(*x.shape).astype(np.float32)
              if t_step > 0 else np.zeros_like(x))
        noises.append(nz)
        xt = mean + torch.from_numpy(nz) * np.exp(0.5 * float(logvar))
    payload["chain_noises"] = np.stack(noises)  # ordered t=19..0
    payload["chain_final"] = xt.numpy()

    np.savez_compressed(os.path.join(OUT, "unet_diffusion_golden.npz"), **payload)
    print("wrote", len(payload), "arrays")


if __name__ == "__main__":
    main()
