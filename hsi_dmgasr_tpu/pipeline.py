"""DMGASR pipeline: GAE latent space + SR3 conditional diffusion.

The productized equivalent of the reference's stage-2 driver sr_gae.py:

  * ``train_step`` (sr_gae.py:221-250): GAE-encodes the HR and SR cubes
    and trains the diffusion model on latent pairs. The reference runs G
    *sequential* optimizer steps per batch (one per band group,
    sr_gae.py:245-250); here the default folds all G groups into one
    (B*G)-batch step (identical gradient signal per sample, G× fewer
    optimizer invocations, G× larger MXU batches). ``per_group=True``
    reproduces the reference's sequential dynamics exactly.
  * ``super_resolve`` (sr_gae.py:436-484): encode the bicubic-upsampled
    LR cube -> run the T-step reverse diffusion for ALL G groups as one
    batched lax.scan -> GAE-decode -> clip to [0,1]. The reference's
    G×T sequential UNet forwards become T forwards of a G-batch.
  * ``evaluate`` (sr_gae.py:489-496): HSI quality suite + optional
    per-band color correction.

Unlike the reference — which torch.load()s the GAE from disk EVERY
training batch (sr_gae.py:228) — the GAE parameters are loaded once and
live on device.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.gae import GAE
from .train.ddpm_model import DDPMModel
from .evalhsi import color_correction as _color_correction
from .evalhsi import quality_assessment
from .evalhsi.jax_metrics import quality_assessment_jax


class DMGASRPipeline:
    def __init__(self, opt, gae_variables, gae_config, ddpm: Optional[DDPMModel] = None,
                 seed=0):
        self.opt = opt
        self.gae = GAE(
            n_subs=gae_config["n_subs"], n_ovls=gae_config["n_ovls"],
            n_colors=gae_config["n_colors"], n_feats=gae_config["n_feats"],
        )
        self.gae_variables = gae_variables
        self.G = gae_config["G"]
        self.n_colors = gae_config["n_colors"]

        # Latent affine normalization (config gae.latent_shift/latent_scale,
        # default identity for reference parity). The GAE encoder ends in a
        # plain conv (AE.py:168-199) so nothing bounds its latents, while the
        # sampler clips x̂0 to [-1,1] every reverse step (gaussian.py:105-106
        # == reference diffusion.py:163-164) and the SR3 noise schedule
        # assumes data filling [-1,1]. Measured on the converted GAE_4_Pav
        # (tools/diag_latents.py): latents live in [-1.52, +0.06], mean -0.32
        # std 0.24 — the clip truncates real mass and the signal is ~4x
        # smaller than the schedule's unit-range assumption. The affine
        # z' = (z - shift) * scale recenters the diffusion's working space;
        # decode inverts it, so GAE weights and outputs are untouched.
        gae_opt = (opt or {}).get("gae") or {}
        self.latent_shift = float(gae_opt.get("latent_shift") or 0.0)
        self.latent_scale = float(gae_opt.get("latent_scale") or 1.0)
        shift, scale = self.latent_shift, self.latent_scale

        self._encode = jax.jit(
            lambda v, x: (self.gae.apply(v, x, method=GAE.encode) - shift)
            * scale
        )
        self._decode = jax.jit(
            lambda v, z: self.gae.apply(
                v, z / scale + shift, method=GAE.decode
            )
        )
        self.ddpm = ddpm if ddpm is not None else DDPMModel(opt, seed=seed)
        self._key = jax.random.PRNGKey(seed + 17)

    # ------------------------------------------------------------ stages

    def encode(self, cube):
        """(B, H, W, C) cube -> (B, G, h, w, 3) latents."""
        return self._encode(self.gae_variables, jnp.asarray(cube))

    def decode(self, z):
        return self._decode(self.gae_variables, z)

    @staticmethod
    def _fold(z):
        """(B, G, h, w, c) -> (B*G, h, w, c)."""
        b, g, h, w, c = z.shape
        return z.reshape(b * g, h, w, c)

    def _unfold(self, z, b):
        bg, h, w, c = z.shape
        return z.reshape(b, bg // b, h, w, c)

    # ------------------------------------------------------------- train

    def _degrade_fn(self, hw, scale):
        """On-device MATLAB-bicubic degradation HR -> bicubic-up(LR).

        Replaces the host-side per-item imresize pair (HStrain.py:61-63)
        with two MXU matmuls inside the jitted step — the training input
        pipeline then only ships HR crops.
        """
        ck = (hw, scale)
        if not hasattr(self, "_degrade_cache"):
            self._degrade_cache = {}
        if ck not in self._degrade_cache:
            from .data.imresize import make_imresize_jax

            down = make_imresize_jax(hw, output_shape=(hw[0] // scale,
                                                       hw[1] // scale))
            up = make_imresize_jax((hw[0] // scale, hw[1] // scale),
                                   output_shape=hw)

            def f(hr):
                return jnp.clip(up(jnp.clip(down(hr), 0.0, 1.0)), 0.0, 1.0)

            self._degrade_cache[ck] = jax.jit(f)
        return self._degrade_cache[ck]

    @staticmethod
    def _to_f32(x):
        """Accept half-precision host->device transfers (the tunnel
        upload is the training bottleneck at ~25 MB/s; f16 halves it)
        and widen on device before any compute."""
        x = jnp.asarray(x)
        if x.dtype in (jnp.float16, jnp.bfloat16):
            x = x.astype(jnp.float32)
        return x

    def train_step_from_hr(self, hr, scale=4, key=None, per_group=False):
        """Training step from HR crops only; SR derived on device."""
        hr = self._to_f32(hr)
        sr = self._degrade_fn((hr.shape[1], hr.shape[2]), scale)(hr)
        return self.train_step({"HR": hr, "SR": sr}, key=key,
                               per_group=per_group)

    def train_step(self, batch, key=None, per_group=False):
        """One diffusion update from a cube batch {'HR','SR'} (NHWC)."""
        z_hr = self.encode(self._to_f32(batch["HR"]))
        z_sr = self.encode(self._to_f32(batch["SR"]))
        if per_group:
            # reference dynamics: one optimizer step per band group
            # (sr_gae.py:245-250); each step draws fresh RNG
            keys = (jax.random.split(key, self.G) if key is not None
                    else [None] * self.G)
            losses = []
            for g in range(self.G):
                losses.append(
                    self.ddpm.train_step(
                        {"HR": z_hr[:, g], "SR": z_sr[:, g]}, keys[g]
                    )
                )
            return jnp.mean(jnp.stack(losses))
        return self.ddpm.train_step(
            {"HR": self._fold(z_hr), "SR": self._fold(z_sr)}, key
        )

    # --------------------------------------------------------- inference

    def super_resolve(self, sr_cube, key=None, return_latents=False):
        """Full DMGASR inference on bicubic-upsampled LR cubes.

        sr_cube: (B, H, W, C) in [0,1]. Returns (B, H, W, C) in [0,1].
        """
        if key is None:
            self._key, key = jax.random.split(self._key)
        sr_cube = jnp.asarray(sr_cube)
        b = sr_cube.shape[0]
        z_sr = self.encode(sr_cube)
        cond = self._fold(z_sr)
        z_out = self.ddpm.super_resolution(cond, key=key)
        y = self.decode(self._unfold(z_out, b))
        y = jnp.clip(y, 0.0, 1.0)
        if return_latents:
            return y, self._unfold(z_out, b)
        return y

    def reconstruct(self, cube):
        """GAE round-trip (no diffusion) — stage-1 quality check."""
        return jnp.clip(self.decode(self.encode(cube)), 0.0, 1.0)

    def _spatial_sampler(self, mesh, shape, replay, fused):
        """Cached shard_map reverse-chain runner over ('data','space').

        fused=True runs the Pallas fused UNet with explicit H-halo
        exchange + pmean GroupNorm (parallel/spatial.py) — round 2
        forfeited the fused kernels here because GSPMD cannot partition
        pallas_call. fused=False keeps the GSPMD-partitioned unfused
        path. replay=True additionally takes x_init/noise_seq so the
        chain is bit-identical to the single-device sampler."""
        from jax.sharding import PartitionSpec as P
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map

        diff_opt = (self.opt.get("model") or {}).get("diffusion") or {}
        t_start = diff_opt.get("t_start")
        ck = ("spatial", shape, replay, fused, t_start,
              tuple(sorted(mesh.shape.items())))
        if not hasattr(self, "_spatial_cache"):
            self._spatial_cache = {}
        if ck in self._spatial_cache:
            return self._spatial_cache[ck]

        diffusion = self.ddpm.val_diffusion
        unet = self.ddpm.unet
        unet_sp = unet.clone(
            fuse_blocks=True, spatial_axis="space"
        ) if fused else unet

        def local_fn(params, key, cond, x_init, noise_seq):
            def denoise_fn(x, t):
                return unet_sp.apply({"params": params}, x, t, train=False)

            if not replay:
                # independent per-rank noise (a valid sample; replay mode
                # exists for exact single-device parity in tests)
                key = jax.random.fold_in(key, jax.lax.axis_index("space"))
                key = jax.random.fold_in(key, jax.lax.axis_index("data"))
                x_init = noise_seq = None
            return diffusion.sample_loop(
                denoise_fn, key, cond=cond, x_init=x_init,
                noise_seq=noise_seq, t_start=t_start,
            )

        sh = P("data", "space")
        fn = jax.jit(shard_map(
            local_fn, mesh=mesh,
            in_specs=(P(), P(), sh,
                      sh if replay else P(),
                      P(None, "data", "space") if replay else P()),
            out_specs=sh, check_vma=False,
        ))
        self._spatial_cache[ck] = fn
        return fn

    def super_resolve_spatial(self, sr_cube, mesh, key=None, fused=True,
                              replay_noise=False):
        """Single-cube LATENCY scaling over a 2-D ('data','space') mesh:
        band groups ride 'data', image height rides 'space'.

        fused=True (default): shard_map with explicit ICI halo exchange
        feeding the fused Pallas kernels — full round-2 kernel speedup
        under sharding, a capability the reference's batch-only
        DataParallel (model/networks.py:113-115) cannot express.
        fused=False: round-2 behavior (GSPMD auto-partitioned unfused
        UNet). replay_noise=True draws the whole noise sequence up front
        so the chain is bit-identical to single-device sampling."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.mesh import replicate

        if key is None:
            self._key, key = jax.random.split(self._key)
        sr = jax.device_put(
            jnp.asarray(sr_cube),
            NamedSharding(mesh, P(None, "space")),
        )
        gv = replicate(mesh, self.gae_variables)
        z = self._encode(gv, sr)
        b = sr.shape[0]
        cond = self._fold(z)
        # wrap-pad the (B*G) group batch to a 'data'-axis multiple
        n_data = mesh.shape["data"]
        orig = cond.shape[0]
        pad = (-orig) % n_data
        if pad:
            cond = jnp.pad(cond, ((0, pad),) + ((0, 0),) * 3, mode="wrap")
        cond = jax.device_put(
            cond, NamedSharding(mesh, P("data", "space"))
        )
        params = replicate(mesh, self.ddpm.eval_params)
        if not fused:
            stats = (replicate(mesh, self.ddpm.state.batch_stats)
                     if self.ddpm.state.batch_stats is not None else None)
            run = self.ddpm._get_sampler(tuple(cond.shape))
            z_out = run(params, stats, key, cond)
        else:
            if replay_noise:
                # reproduce sample_loop's internal draws exactly
                T = diffusion_T = self.ddpm.val_diffusion.schedule.num_timesteps
                k_init, k_steps = jax.random.split(key)
                x_init = jax.random.normal(k_init, cond.shape, jnp.float32)
                step_keys = jax.random.split(k_steps, diffusion_T)
                noise_seq = jax.vmap(
                    lambda k: jax.random.normal(k, cond.shape, jnp.float32)
                )(step_keys)
            else:
                x_init = jnp.zeros((), jnp.float32)
                noise_seq = jnp.zeros((), jnp.float32)
            run = self._spatial_sampler(mesh, tuple(cond.shape),
                                        replay_noise, True)
            z_out = run(params, key, cond, x_init, noise_seq)
        if pad:
            z_out = z_out[:orig]
        y = self._decode(gv, self._unfold(z_out, b))
        return jnp.clip(y, 0.0, 1.0)

    def super_resolve_tiled(self, sr_cube, tile=512, overlap=32, key=None):
        """Tiled inference for scenes larger than one shot handles.

        Replaces the reference's OFFLINE corner/center cropping
        (GAE/crop.py:41-72) with online overlapped tiling: tiles are
        super-resolved (batched per row) and blended with overlap
        averaging. sr_cube: (H, W, C) or (B=1, H, W, C) numpy/jax array.
        """
        if key is None:
            self._key, key = jax.random.split(self._key)
        x = np.asarray(sr_cube)
        if x.ndim == 4:
            x = x[0]
        H, W, C = x.shape
        if H <= tile and W <= tile:
            return self.super_resolve(x[None], key=key)[0]
        stride = tile - overlap

        def _origins(dim):
            # clamp to >= 0 so a dim <= tile yields the single origin 0
            # (the slice then naturally shortens to the scene edge) —
            # a negative origin would leave weight-0 regions -> NaN.
            return sorted({max(0, min(o, dim - tile))
                           for o in range(0, max(dim - overlap, 1), stride)})

        ys, xs = _origins(H), _origins(W)
        out = np.zeros((H, W, C), np.float32)
        weight = np.zeros((H, W, 1), np.float32)
        keys = jax.random.split(key, len(ys) * len(xs))
        ki = 0
        for y0 in ys:
            for x0 in xs:
                patch = x[y0:y0 + tile, x0:x0 + tile][None]
                pred = np.asarray(self.super_resolve(patch, key=keys[ki]))[0]
                ki += 1
                out[y0:y0 + tile, x0:x0 + tile] += pred
                weight[y0:y0 + tile, x0:x0 + tile] += 1.0
        assert (weight > 0).all(), "tiling left uncovered regions"
        return jnp.asarray(out / weight)

    # -------------------------------------------------------------- eval

    def evaluate(self, sr_cube, hr_cube, ratio=4, use_color_correction=False,
                 on_device=True, key=None):
        """Super-resolve + HSI metric dict (sr_gae.py:489-496).

        Returns (metrics, prediction, seconds)."""
        t0 = time.time()
        pred = self.super_resolve(sr_cube, key=key)
        pred.block_until_ready()
        dt = time.time() - t0

        metrics_list = []
        preds = np.asarray(pred)
        hrs = np.asarray(hr_cube)
        for i in range(preds.shape[0]):
            y, gt = preds[i], hrs[i]
            if use_color_correction:
                y = _color_correction(gt, y, num_channels=self.n_colors)
            if on_device:
                m = {
                    k: float(v)
                    for k, v in quality_assessment_jax(
                        gt, y, data_range=1.0, ratio=ratio
                    ).items()
                }
            else:
                m = quality_assessment(gt, y, data_range=1.0, ratio=ratio)
            metrics_list.append(m)
        avg = {
            k: float(np.mean([m[k] for m in metrics_list]))
            for k in metrics_list[0]
        }
        return avg, preds, dt
