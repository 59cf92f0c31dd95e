"""Network factory + weight init (reference model/networks.py).

``define_G(opt)`` reads the reference config schema
(opt['model']['which_model_G'] = 'sr3' | 'ddpm', model/networks.py:83-108)
and returns the flax UNet plus the matching diffusion object. The
'ddpm' choice maps to discrete time embedding + BatchNorm, 'sr3' to the
continuous noise level + GroupNorm (the two reference module pairs).

``init_weights`` reimplements the reference initializers
(model/networks.py:13-74): 'normal' N(0, std), 'kaiming' fan-in,
'orthogonal' (the default applied at networks.py:110-112). They
transform an already-initialized flax param tree; norm scales go to 1,
biases to 0, exactly as the torch versions do.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import DDPMDiffusion, DiffusionSchedule, GaussianDiffusion
from .unet import UNet


def _orthogonal(key, shape):
    """torch.nn.init.orthogonal_ semantics on an HWIO/(in,out) kernel.

    torch flattens OIHW to (O, I*H*W) rows and orthogonalizes; we mirror
    that by working in the same (rows=out, cols=rest) space.
    """
    if len(shape) == 4:
        h, w, i, o = shape
        rows, cols = o, h * w * i
    else:
        i, o = shape
        rows, cols = o, i
    flat = jax.random.normal(key, (rows, cols))
    if rows < cols:
        flat = flat.T
    q, r = jnp.linalg.qr(flat)
    q = q * jnp.sign(jnp.diag(r))
    if rows < cols:
        q = q.T
    q = q[:rows, :cols]
    if len(shape) == 4:
        return q.reshape(o, h, w, i).transpose(1, 2, 3, 0)
    return q.T.reshape(shape)


def init_weights(params, key, init_type="orthogonal", std=0.02, scale=1.0):
    """Re-initialize a flax param tree the reference way."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(key, len(flat))
    out = []
    for (path, leaf), k in zip(flat, keys):
        name = jax.tree_util.keystr((path[-1],))
        is_kernel = "kernel" in name and leaf.ndim >= 2
        is_norm_scale = "scale" in name
        if is_kernel:
            if init_type == "normal":
                leaf = std * jax.random.normal(k, leaf.shape, leaf.dtype)
            elif init_type == "kaiming":
                if leaf.ndim == 4:
                    fan_in = leaf.shape[0] * leaf.shape[1] * leaf.shape[2]
                else:
                    fan_in = leaf.shape[0]
                leaf = scale * jnp.sqrt(2.0 / fan_in) * jax.random.normal(
                    k, leaf.shape, leaf.dtype
                )
            elif init_type == "orthogonal":
                leaf = _orthogonal(k, leaf.shape).astype(leaf.dtype)
            else:
                raise NotImplementedError(init_type)
        elif is_norm_scale:
            leaf = jnp.ones_like(leaf)
        else:  # bias
            leaf = jnp.zeros_like(leaf)
        out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def define_G(opt):
    """Build (unet, diffusion) from a reference-schema config dict.

    Returns the un-initialized flax module and a diffusion object with
    the TRAIN schedule attached; swap schedules with
    ``diffusion_for_phase`` (model/model.py:87-94 equivalent).
    """
    model_opt = opt["model"]
    unet_opt = model_opt["unet"]
    which = model_opt.get("which_model_G", "sr3")
    image_size = model_opt["diffusion"]["image_size"]

    # reference quirk (sr3.py upstream): missing norm_groups defaults to 32
    norm_groups = unet_opt.get("norm_groups") or 32

    unet = UNet(
        in_channel=unet_opt["in_channel"],
        out_channel=unet_opt["out_channel"],
        inner_channel=unet_opt["inner_channel"],
        norm_groups=norm_groups,
        channel_mults=tuple(unet_opt["channel_multiplier"]),
        attn_res=tuple(unet_opt["attn_res"]),
        res_blocks=unet_opt["res_blocks"],
        dropout=unet_opt.get("dropout") or 0.0,
        image_size=image_size,
        time_embedding="discrete" if which == "ddpm" else "continuous",
        norm="batch" if which == "ddpm" else "group",
        remat=bool(unet_opt.get("remat")),
        fuse_blocks=_default_fuse(unet_opt),
    )
    diffusion = diffusion_for_phase(opt, "train")
    return unet, diffusion


def _default_fuse(unet_opt):
    """model.unet.fuse: use the Pallas fused inference kernels
    (kernels/fused_conv.py, ops/fused_up.py). Default: OFF — the kernels
    compute in bf16 internally, while everything reached through
    define_G (training-driver validation, cli infer/eval) runs f32, and
    silently shifting val metrics to bf16 numerics is the wrong default
    (bench.py's own policy: fuse only when running bf16). The flagship
    perf paths opt in explicitly (bench.py, __graft_entry__) where the
    run is bf16 end-to-end. Training always takes the unfused path
    regardless (the fuse gate in models/unet.py checks ``train``)."""
    return bool(unet_opt.get("fuse"))


def diffusion_for_phase(opt, phase):
    """GaussianDiffusion with the phase's beta schedule
    (model/model.py:87-94 schedule switching)."""
    model_opt = opt["model"]
    which = model_opt.get("which_model_G", "sr3")
    sched = DiffusionSchedule.from_config(model_opt["beta_schedule"][phase])
    cls = DDPMDiffusion if which == "ddpm" else GaussianDiffusion
    lw = model_opt["diffusion"].get("loss_weight")
    if lw is not None:
        # {"type": "min_snr", "gamma": 5.0} -> hashable dataclass field.
        # Beyond-reference knob (see GaussianDiffusion.loss_weight).
        kind = lw.get("type")
        if kind != "min_snr":
            raise ValueError(f"unknown model.diffusion.loss_weight type {kind!r}")
        lw = (kind, float(lw.get("gamma", 5.0)))
    return cls(
        schedule=sched,
        conditional=model_opt["diffusion"].get("conditional", True),
        loss_type=model_opt.get("loss_type") or "l1",
        loss_weight=lw,
    )
