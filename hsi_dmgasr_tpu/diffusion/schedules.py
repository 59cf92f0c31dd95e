"""Beta schedules and precomputed diffusion buffers.

Parity with sr3_modules/diffusion.py:11-49 (schedule construction) and
:93-140 (buffer registration). Everything is computed in float64 numpy
on the host exactly like the reference, then carried as f32 device
constants — the per-step host tensor creation of the reference
(diffusion.py:154-155) disappears because samplers index these arrays
inside lax.scan.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np


def _warmup_beta(linear_start, linear_end, n_timestep, warmup_frac):
    betas = linear_end * np.ones(n_timestep, dtype=np.float64)
    warmup_time = int(n_timestep * warmup_frac)
    betas[:warmup_time] = np.linspace(
        linear_start, linear_end, warmup_time, dtype=np.float64
    )
    return betas


def make_beta_schedule(schedule, n_timestep, linear_start=1e-4,
                       linear_end=2e-2, cosine_s=8e-3):
    """All 7 reference schedules (sr3_modules/diffusion.py:19-49)."""
    if schedule == "quad":
        betas = (
            np.linspace(
                linear_start ** 0.5, linear_end ** 0.5, n_timestep,
                dtype=np.float64,
            )
            ** 2
        )
    elif schedule == "linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "warmup10":
        betas = _warmup_beta(linear_start, linear_end, n_timestep, 0.1)
    elif schedule == "warmup50":
        betas = _warmup_beta(linear_start, linear_end, n_timestep, 0.5)
    elif schedule == "const":
        betas = linear_end * np.ones(n_timestep, dtype=np.float64)
    elif schedule == "jsd":
        betas = 1.0 / np.linspace(n_timestep, 1, n_timestep, dtype=np.float64)
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * math.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, None, 0.999)
    else:
        raise NotImplementedError(schedule)
    return betas


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All buffers of sr3_modules/diffusion.py:93-140, as numpy arrays.

    sqrt_alphas_cumprod_prev has length T+1 (index 0 is 1.0) — it drives
    both the continuous-γ training draw (diffusion.py:228-236) and the
    per-step conditioning scalar at sampling (diffusion.py:154-155).
    """

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod_prev: np.ndarray  # (T+1,)
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    log_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray
    posterior_variance: np.ndarray
    posterior_log_variance_clipped: np.ndarray
    posterior_mean_coef1: np.ndarray
    posterior_mean_coef2: np.ndarray

    @property
    def num_timesteps(self):
        return int(self.betas.shape[0])

    @classmethod
    def create(cls, schedule="linear", n_timestep=2000, linear_start=1e-4,
               linear_end=2e-2, cosine_s=8e-3):
        betas = make_beta_schedule(
            schedule, n_timestep, linear_start, linear_end, cosine_s
        )
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        posterior_variance = (
            betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        )
        return cls(
            betas=betas,
            alphas_cumprod=alphas_cumprod,
            alphas_cumprod_prev=alphas_cumprod_prev,
            sqrt_alphas_cumprod_prev=np.sqrt(np.append(1.0, alphas_cumprod)),
            sqrt_alphas_cumprod=np.sqrt(alphas_cumprod),
            sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - alphas_cumprod),
            log_one_minus_alphas_cumprod=np.log(1.0 - alphas_cumprod),
            sqrt_recip_alphas_cumprod=np.sqrt(1.0 / alphas_cumprod),
            sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / alphas_cumprod - 1),
            posterior_variance=posterior_variance,
            posterior_log_variance_clipped=np.log(
                np.maximum(posterior_variance, 1e-20)
            ),
            posterior_mean_coef1=(
                betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            ),
            posterior_mean_coef2=(
                (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
            ),
        )

    @classmethod
    def from_config(cls, schedule_opt):
        """Build from the reference config schema
        (config 'beta_schedule' sub-dict, e.g. sr_sr3_16_128.json:95-108)."""
        return cls.create(
            schedule=schedule_opt["schedule"],
            n_timestep=schedule_opt["n_timestep"],
            linear_start=schedule_opt.get("linear_start", 1e-4),
            linear_end=schedule_opt.get("linear_end", 2e-2),
        )
