"""Gaussian diffusion as pure functions + lax.scan sampler.

TPU-native redesign of the reference GaussianDiffusion
(sr3_modules/diffusion.py:64-253):

  * Training (p_losses, diffusion.py:222-250): the continuous-γ trick is
    preserved exactly — one shared t ~ U{1..T} per batch, then per-sample
    γ ~ U[√ᾱ_{t-1}, √ᾱ_t]; the UNet is conditioned on γ itself.
  * Sampling (p_sample_loop, diffusion.py:177-201): the reference runs a
    Python loop with a host round-trip per step (CPU tensor creation at
    diffusion.py:154-155 + tqdm). Here the entire reverse chain is ONE
    lax.scan on device: schedule buffers are traced constants indexed by
    the scan counter; zero host syncs for all T steps.
  * Loss (model/model.py:49-59): reference computes
    L1(reduction='sum')/(B*C*H*W) == plain mean; we use the mean.

The denoise function signature is ``denoise_fn(x, noise_level) -> eps``
where x already contains the conditioning concat if conditional.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Bundles a denoise apply-fn with a schedule; stateless/pure."""

    schedule: DiffusionSchedule
    conditional: bool = True
    loss_type: str = "l1"
    clip_denoised: bool = True
    # Beyond-reference: per-sample loss weighting. None reproduces the
    # reference's unweighted mean exactly; ("min_snr", cap) applies
    # min-SNR-γ weighting for the ε-objective (Hang et al. 2023,
    # arXiv:2303.09556): w = min(SNR, cap)/SNR with SNR = γ²/(1-γ²).
    # Motivation here: the round-3 chain-entry diagnosis (BENCHMARKS.md)
    # showed the model under-trains the low-γ (high-noise) steps that a
    # from-pure-noise sampler depends on; min-SNR rebalances the easy
    # high-γ samples that otherwise dominate the unweighted mean.
    loss_weight: tuple | None = None

    def _loss_w(self, gamma):
        """Per-sample weight from √ᾱ (``gamma``); shape-preserving."""
        if self.loss_weight is None:
            return jnp.ones_like(gamma)
        kind, cap = self.loss_weight
        if kind == "min_snr":
            g2 = jnp.clip(gamma.astype(jnp.float32) ** 2, 1e-12, 1 - 1e-12)
            snr = g2 / (1.0 - g2)
            return jnp.minimum(1.0, jnp.float32(cap) / snr)
        raise NotImplementedError(self.loss_weight)

    # ---------------------------------------------------------------- q

    def q_sample(self, x_start, continuous_sqrt_alpha_cumprod, noise):
        """γ·x0 + √(1-γ²)·ε (diffusion.py:213-220); γ broadcasts over
        trailing dims."""
        g = continuous_sqrt_alpha_cumprod
        return g * x_start + jnp.sqrt(1.0 - g ** 2) * noise

    # ------------------------------------------------------------- train

    def p_losses(self, denoise_fn, key, x_hr, x_sr=None, noise=None):
        """Continuous-γ denoising loss (diffusion.py:222-250).

        x_hr: (B, H, W, C) target; x_sr: conditioning (bicubic-up LR),
        concatenated channel-wise before the UNet as in the reference
        (cond first: torch.cat([SR, noisy], dim=1), diffusion.py:247).
        """
        sched = self.schedule
        b = x_hr.shape[0]
        k_t, k_g, k_n = jax.random.split(key, 3)
        t = jax.random.randint(k_t, (), 1, sched.num_timesteps + 1)
        sacp = jnp.asarray(sched.sqrt_alphas_cumprod_prev, jnp.float32)
        lo = sacp[t - 1]
        hi = sacp[t]
        gamma = jax.random.uniform(k_g, (b,), jnp.float32, 0.0, 1.0) * (hi - lo) + lo
        if noise is None:
            noise = jax.random.normal(k_n, x_hr.shape, x_hr.dtype)
        x_noisy = self.q_sample(x_hr, gamma[:, None, None, None], noise)
        if self.conditional:
            inp = jnp.concatenate([x_sr, x_noisy], axis=-1)
        else:
            inp = x_noisy
        eps_pred = denoise_fn(inp, gamma[:, None])
        err = noise - eps_pred
        if self.loss_type == "l1":
            per = jnp.mean(jnp.abs(err), axis=(1, 2, 3))
        elif self.loss_type == "l2":
            per = jnp.mean(err ** 2, axis=(1, 2, 3))
        else:
            raise NotImplementedError(self.loss_type)
        return jnp.mean(self._loss_w(gamma) * per)

    # ------------------------------------------------------------ sample

    def _step(self, denoise_fn, x, t, key, cond, noise=None):
        """One reverse step == reference p_sample (diffusion.py:142-175),
        with every scalar gathered from traced buffers. ``noise`` overrides
        the drawn Gaussian (deterministic replay / torch parity)."""
        sched = self.schedule
        f32 = partial(jnp.asarray, dtype=jnp.float32)
        sacp_prev = f32(sched.sqrt_alphas_cumprod_prev)
        srac = f32(sched.sqrt_recip_alphas_cumprod)
        sracm1 = f32(sched.sqrt_recipm1_alphas_cumprod)
        c1 = f32(sched.posterior_mean_coef1)
        c2 = f32(sched.posterior_mean_coef2)
        plv = f32(sched.posterior_log_variance_clipped)

        b = x.shape[0]
        noise_level = jnp.full((b, 1), sacp_prev[t + 1], jnp.float32)
        if cond is not None:
            inp = jnp.concatenate([cond, x], axis=-1)
        else:
            inp = x
        eps = denoise_fn(inp, noise_level)
        x_recon = srac[t] * x - sracm1[t] * eps
        if self.clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean = c1[t] * x_recon + c2[t] * x
        if noise is None:
            noise = jax.random.normal(key, x.shape, x.dtype)
        noise = jnp.where(t > 0, noise, jnp.zeros_like(noise))
        return mean + noise * jnp.exp(0.5 * plv[t])

    def init_from_cond(self, cond, key, t_start):
        """Truncated-chain start state: x_{t0} = γ_{t0}·cond + √(1-γ²)·ε.

        Initializes the reverse chain at timestep ``t_start`` from the
        conditioning instead of pure noise (CCDF-style truncation,
        Chung et al. 2022). Motivation (BENCHMARKS.md round 3): the
        first reverse steps of a T=20 cosine chain sit at γ ~ 2.5e-3
        where x̂0 = x/γ - ... amplifies the ε-prediction error ~400x —
        the full chain DESTROYS a near-perfect conditioning (measured
        16.5 vs 25.4+ MPSNR_cc on the round-3 run). Beyond-reference
        feature; the reference always starts from pure noise
        (sr3_modules/diffusion.py:177-201).
        """
        g = jnp.float32(self.schedule.sqrt_alphas_cumprod_prev[t_start])
        eps = jax.random.normal(key, cond.shape, jnp.float32)
        return g * cond + jnp.sqrt(1.0 - g * g) * eps

    def sample_loop(self, denoise_fn, key, shape=None, cond=None,
                    return_intermediates=False, x_init=None, noise_seq=None,
                    t_start=None):
        """Full reverse chain as one lax.scan (vs diffusion.py:177-201).

        conditional: cond is the bicubic-upsampled LR latent, shape sets
        itself from cond. unconditional: pass shape. ``x_init`` and
        ``noise_seq`` (T, *shape — ordered t=T-1..0) replace the drawn
        Gaussians for deterministic replay (torch parity).

        ``t_start``: run only the last t_start reverse steps, starting
        from ``init_from_cond`` (or ``x_init`` when given). Requires
        cond (or an explicit x_init). t_start == T runs the full step
        count with the cond-seeded start state.
        """
        sched = self.schedule
        T = sched.num_timesteps
        if cond is not None:
            shape = cond.shape
        t0 = T
        if t_start is not None:
            t0 = int(t_start)
            if not 0 < t0 <= T:
                raise ValueError(f"t_start {t_start} outside (0, {T}]")
            if cond is None and x_init is None:
                raise ValueError("t_start needs cond (or x_init)")
        k_init, k_steps = jax.random.split(key)
        if x_init is not None:
            x0 = jnp.asarray(x_init, jnp.float32)
        elif t_start is not None:
            x0 = self.init_from_cond(cond, k_init, t0)
        else:
            x0 = jax.random.normal(k_init, shape, jnp.float32)
        step_keys = jax.random.split(k_steps, t0)
        ts = jnp.arange(t0 - 1, -1, -1)

        if noise_seq is not None:
            nz = jnp.asarray(noise_seq, jnp.float32)[-t0:]

            def body(x, inp):
                t, k, nz = inp
                x = self._step(denoise_fn, x, t, k, cond, noise=nz)
                return x, (x if return_intermediates else None)

            xs = (ts, step_keys, nz)
        else:
            def body(x, inp):
                t, k = inp
                x = self._step(denoise_fn, x, t, k, cond)
                return x, (x if return_intermediates else None)

            xs = (ts, step_keys)

        x_fin, inter = jax.lax.scan(body, x0, xs)
        if return_intermediates:
            return x_fin, inter
        return x_fin

    def super_resolution(self, denoise_fn, key, cond,
                         return_intermediates=False):
        """Conditional sampling seeded from noise (diffusion.py:209-211)."""
        return self.sample_loop(
            denoise_fn, key, cond=cond, return_intermediates=return_intermediates
        )

    def sample(self, denoise_fn, key, batch_size, image_size, channels,
               return_intermediates=False):
        """Unconditional generation (diffusion.py:203-207), NHWC."""
        return self.sample_loop(
            denoise_fn, key,
            shape=(batch_size, image_size, image_size, channels),
            return_intermediates=return_intermediates,
        )

    # ----------------------------------------------------- fast sampling

    def ddim_sample_loop(self, denoise_fn, key, shape=None, cond=None,
                         steps=None, eta=0.0):
        """DDIM sampler (Song et al. 2020) — beyond-reference feature.

        Runs `steps` evenly-strided timesteps of the trained schedule
        (deterministic at eta=0), cutting inference cost by T/steps at
        near-identical quality. Same conditioning protocol as the
        ancestral sampler: the UNet sees sqrt_alphas_cumprod_prev[t+1].
        """
        sched = self.schedule
        T = sched.num_timesteps
        steps = steps or T
        ts = np.linspace(0, T - 1, steps).round().astype(np.int32)[::-1]
        acp = jnp.asarray(
            np.append(1.0, sched.alphas_cumprod), jnp.float32
        )  # index t+1 == alpha_bar_t
        sacp_prev = jnp.asarray(sched.sqrt_alphas_cumprod_prev, jnp.float32)

        if cond is not None:
            shape = cond.shape
        k_init, k_steps = jax.random.split(key)
        x0 = jax.random.normal(k_init, shape, jnp.float32)
        step_keys = jax.random.split(k_steps, len(ts))
        t_cur = jnp.asarray(ts)
        t_next = jnp.asarray(np.append(ts[1:], -1))

        def body(x, inp):
            t, tn, k = inp
            b = x.shape[0]
            noise_level = jnp.full((b, 1), sacp_prev[t + 1], jnp.float32)
            inp_x = (jnp.concatenate([cond, x], axis=-1)
                     if cond is not None else x)
            eps = denoise_fn(inp_x, noise_level)
            a_t = acp[t + 1]
            a_n = acp[tn + 1]  # tn==-1 -> acp[0]==1
            x0_pred = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
            if self.clip_denoised:
                x0_pred = jnp.clip(x0_pred, -1.0, 1.0)
            sigma = eta * jnp.sqrt(
                (1 - a_n) / (1 - a_t) * (1 - a_t / a_n)
            )
            dir_xt = jnp.sqrt(jnp.maximum(1 - a_n - sigma ** 2, 0.0)) * eps
            noise = jax.random.normal(k, x.shape, x.dtype)
            noise = jnp.where(tn >= 0, noise, jnp.zeros_like(noise))
            x = jnp.sqrt(a_n) * x0_pred + dir_xt + sigma * noise
            return x, None

        x_fin, _ = jax.lax.scan(body, x0, (t_cur, t_next, step_keys))
        return x_fin


# ----------------------------------------------------------------------
# discrete-t DDPM variant (model/ddpm_modules/diffusion.py)


@dataclasses.dataclass(frozen=True)
class DDPMDiffusion(GaussianDiffusion):
    """Discrete-timestep variant: t is fed to the UNet directly
    (ddpm_modules/diffusion.py:64-67 extract + :278-294 p_losses)."""

    def p_losses(self, denoise_fn, key, x_hr, x_sr=None, noise=None):
        sched = self.schedule
        b = x_hr.shape[0]
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (b,), 0, sched.num_timesteps)
        sac = jnp.asarray(sched.sqrt_alphas_cumprod, jnp.float32)
        som = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod, jnp.float32)
        if noise is None:
            noise = jax.random.normal(k_n, x_hr.shape, x_hr.dtype)
        x_noisy = (
            sac[t][:, None, None, None] * x_hr
            + som[t][:, None, None, None] * noise
        )
        inp = (
            jnp.concatenate([x_sr, x_noisy], axis=-1)
            if self.conditional else x_noisy
        )
        eps_pred = denoise_fn(inp, t)
        err = noise - eps_pred
        if self.loss_type == "l1":
            per = jnp.mean(jnp.abs(err), axis=(1, 2, 3))
        elif self.loss_type == "l2":
            per = jnp.mean(err ** 2, axis=(1, 2, 3))
        else:
            raise NotImplementedError(self.loss_type)
        return jnp.mean(self._loss_w(sac[t]) * per)

    def _step(self, denoise_fn, x, t, key, cond, noise=None):
        sched = self.schedule
        f32 = partial(jnp.asarray, dtype=jnp.float32)
        srac = f32(sched.sqrt_recip_alphas_cumprod)
        sracm1 = f32(sched.sqrt_recipm1_alphas_cumprod)
        c1 = f32(sched.posterior_mean_coef1)
        c2 = f32(sched.posterior_mean_coef2)
        plv = f32(sched.posterior_log_variance_clipped)

        b = x.shape[0]
        tb = jnp.full((b,), t, jnp.int32)
        inp = jnp.concatenate([cond, x], axis=-1) if cond is not None else x
        eps = denoise_fn(inp, tb)
        x_recon = srac[t] * x - sracm1[t] * eps
        if self.clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        mean = c1[t] * x_recon + c2[t] * x
        if noise is None:
            noise = jax.random.normal(key, x.shape, x.dtype)
        noise = jnp.where(t > 0, noise, jnp.zeros_like(noise))
        return mean + noise * jnp.exp(0.5 * plv[t])

    def interpolate(self, denoise_fn, key, x1, x2, t=None, lam=0.5):
        """Latent interpolation (ddpm_modules/diffusion.py:242-257)."""
        sched = self.schedule
        T = sched.num_timesteps
        t = T - 1 if t is None else t
        k_q1, k_q2, k_steps = jax.random.split(key, 3)
        sac = jnp.asarray(sched.sqrt_alphas_cumprod, jnp.float32)
        som = jnp.asarray(sched.sqrt_one_minus_alphas_cumprod, jnp.float32)

        def q_at(x, k):
            n = jax.random.normal(k, x.shape, x.dtype)
            return sac[t] * x + som[t] * n

        img = (1 - lam) * q_at(x1, k_q1) + lam * q_at(x2, k_q2)
        step_keys = jax.random.split(k_steps, t)
        ts = jnp.arange(t - 1, -1, -1)

        def body(x, inp):
            ti, k = inp
            return self._step(denoise_fn, x, ti, k, None), None

        img, _ = jax.lax.scan(body, img, (ts, step_keys))
        return img
