"""Torch checkpoint conversion (.pth -> flax param pytrees).

The shipped GAE checkpoints are *whole-module pickles*
(``torch.save(AE_model)``, reference AE.py:637) whose class references
point at ``__main__.{GAE,Encoder,Decoder,BranchUnit,SSB,SSPN}`` and
``common.{ResBlock,ResAttentionBlock,CALayer,Upsampler}``. We register
skeleton ``nn.Module`` subclasses under those names — unpickling an
nn.Module only restores instance ``__dict__``s, so no reference code
executes — then read the live ``state_dict()``.

Diffusion checkpoints (``I{step}_E{epoch}_gen.pth``) are plain
state_dicts (model/model.py:125-145) and load directly.

Layout conversion: torch conv weights are OIHW; flax/NHWC kernels are
HWIO (transpose 2,3,1,0). Linear weights are (out,in) -> (in,out).
"""

from __future__ import annotations

import re
import types

import numpy as np


# ---------------------------------------------------------------------------
# unpickling support


_MAIN_CLASSES = ("GAE", "Encoder", "Decoder", "BranchUnit", "SSB", "SSPN",
                 "AE", "AE_duichen", "SR_encoder", "post_GAE", "Autoencoder",
                 "Swish", "Codebook")
_COMMON_CLASSES = ("ResBlock", "ResAttentionBlock", "CALayer", "Upsampler",
                   "BasicBlock", "MeanShift", "GroupNorm", "Swish")


_STUB_MODULES = {
    "__main__": _MAIN_CLASSES,
    "common": _COMMON_CLASSES,
    "quantize": ("Quantization", "Conv2d_Q"),
    "GELIN": ("GELIN", "SSELM", "NGIM", "HLoss"),
}

_stub_cache = {}


def stub_class(module, name):
    """An empty nn.Module subclass standing in for a reference class.

    Unpickling an nn.Module only restores instance ``__dict__``s, so the
    stub needs no methods; real torch layers (Conv2d, Sequential, ...)
    inside the module tree resolve to actual torch classes.
    """
    import torch.nn as nn

    key = (module, name)
    if key not in _stub_cache:
        _stub_cache[key] = type(name, (nn.Module,), {"__module__": module})
    return _stub_cache[key]


def _make_pickle_shim():
    """A pickle-module shim whose Unpickler resolves reference-repo class
    paths to stubs WITHOUT touching sys.modules or __main__ (a user's
    own GAE/Encoder symbols must never be shadowed or used)."""
    import pickle

    class StubUnpickler(pickle.Unpickler):
        def find_class(self, module, name):
            known = _STUB_MODULES.get(module)
            if known is not None and name in known:
                return stub_class(module, name)
            return super().find_class(module, name)

    shim = types.ModuleType("hsi_dmgasr_tpu_stub_pickle")
    shim.Unpickler = StubUnpickler
    shim.load = pickle.load
    shim.loads = pickle.loads
    shim.dumps = pickle.dumps
    shim.HIGHEST_PROTOCOL = pickle.HIGHEST_PROTOCOL
    return shim


def load_torch_module(path):
    """Unpickle a whole-module .pth on CPU via stub classes."""
    import torch

    return torch.load(
        path, map_location="cpu", weights_only=False,
        pickle_module=_make_pickle_shim(),
    )


def load_state_dict(path):
    """Load either a state_dict .pth or a whole-module .pth -> numpy dict."""
    obj = load_torch_module(path)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in obj.items()}


def gae_config_from_module(mod):
    """Recover (n_subs, n_ovls, n_colors, n_feats, G) from a loaded GAE.

    start_idx/end_idx are plain-python instance attrs restored by pickle
    (AE.py:266-280); n_feats comes from the encoder head shape.
    """
    start = list(mod.start_idx)
    end = list(mod.end_idx)
    n_subs = end[0] - start[0]
    n_ovls = n_subs - (start[1] - start[0]) if len(start) > 1 else 0
    n_colors = end[-1]
    head_w = mod.Encoder.branch.head.weight  # (n_feats, n_subs, 3, 3)
    n_feats = head_w.shape[0]
    return dict(
        n_subs=n_subs, n_ovls=n_ovls, n_colors=n_colors,
        n_feats=n_feats, G=len(start),
        start_idx=start, end_idx=end,
    )


# ---------------------------------------------------------------------------
# key translation


_RULES = [
    (re.compile(r"^Encoder\."), "encoder/"),
    (re.compile(r"^Decoder\."), "decoder/"),
    # --- SR3/DDPM UNet (model/sr3_modules/unet.py, model/ddpm_modules/unet.py)
    (re.compile(r"^denoise_fn\."), ""),  # GaussianDiffusion wrapper prefix
    (re.compile(r"^(noise_level_mlp|time_mlp)\.1\."), "noise_mlp_lin0/"),
    (re.compile(r"^(noise_level_mlp|time_mlp)\.3\."), "noise_mlp_lin1/"),
    (re.compile(r"^downs\.(\d+)\.conv\."), r"downs_\1_conv/"),  # Downsample
    (re.compile(r"^ups\.(\d+)\.conv\."), r"ups_\1_conv/"),  # Upsample
    (re.compile(r"^downs\.(\d+)\."), r"downs_\1/"),
    (re.compile(r"^ups\.(\d+)\."), r"ups_\1/"),
    (re.compile(r"^mid\.(\d+)\."), r"mid_\1/"),
    (re.compile(r"\bnoise_func\.noise_func\.0\."), "noise_func/func/"),
    (re.compile(r"\bmlp\.1\."), "noise_func/func/"),  # ddpm time-emb head
    (re.compile(r"\b(block1|block2|final_conv)\.block\.0\."), r"\1/norm/gn/"),
    (re.compile(r"\b(block1|block2|final_conv)\.block\.3\."), r"\1/conv/"),
    (re.compile(r"\battn\.norm\."), "attn/norm/gn/"),
    (re.compile(r"\bnet\.(\d+)\."), r"net_\1/"),
    (re.compile(r"\bspa\.body\.0\."), "spa/conv0/"),
    (re.compile(r"\bspa\.body\.2\."), "spa/conv1/"),
    (re.compile(r"\bspc\.body\.0\."), "spc/conv0/"),
    (re.compile(r"\bspc\.body\.2\."), "spc/conv1/"),
    (re.compile(r"\bspc\.body\.3\.conv_du\.0\."), "spc/ca/conv_du0/"),
    (re.compile(r"\bspc\.body\.3\.conv_du\.2\."), "spc/ca/conv_du1/"),
    # bare CALayer (outside SSB), e.g. attn in DAQ blocks
    (re.compile(r"\bconv_du\.0\."), "conv_du0/"),
    (re.compile(r"\bconv_du\.2\."), "conv_du1/"),
    # Upsampler Sequential: convs sit at even indices (conv, shuffle, ...)
    (re.compile(r"\bupsample\.(\d+)\."),
     lambda m: f"upsample/conv_{int(m.group(1)) // 2}/"),
    # --- GELIN (GELIN.py:100-276)
    (re.compile(r"^branch\.body\.(\d+)\.body\.0\."), r"branch/body_\1/sc/"),
    (re.compile(r"^branch\.body\.(\d+)\.body\.1\."), r"branch/body_\1/ca/"),
    (re.compile(r"\bsc/f1\.0\."), "sc/f1/"),
    (re.compile(r"\bsc/f2\.1\."), "sc/f2/"),
    (re.compile(r"\bsc/f4\.0\."), "sc/f4/"),
    (re.compile(r"\bca/body\.0\."), "ca/conv0/"),
    (re.compile(r"\bca/body\.2\."), "ca/conv1/"),
    (re.compile(r"\bca/conv_du\.1\."), "ca/du0/"),
    (re.compile(r"\bca/conv_du\.3\."), "ca/du1/"),
    (re.compile(r"\bTrunkUp\.0\."), "trunk_up/"),
    (re.compile(r"\bTrunkUp\.1\."), "trunk_act/"),
    (re.compile(r"\bMultiUp\.0\."), "multi0/"),
    (re.compile(r"\bMultiUp\.1\."), "multi1/"),
    (re.compile(r"\bMultiUp\.2\."), "multi_up/"),
    (re.compile(r"\bMultiUp\.3\."), "multi_act/"),
    (re.compile(r"\berror_resblock\.0\."), "error/"),
    # --- torchvision VGG19 (stage-1 perceptual loss, AE.py:551-604)
    (re.compile(r"^features\.(\d+)\."), r"features_\1/"),
    (re.compile(r"^classifier\.(\d+)\."), r"classifier_\1/"),
]

# model-scoped rule groups, applied BEFORE the common rules when
# state_dict_to_flax(..., model=<name>) is given — avoids cross-model
# collisions on generic names like 'tail.1'.
_MODEL_RULES = {
    # EDSR (GAE/EDSR.py:54-104)
    "edsr": [
        (re.compile(r"^head\.0\."), "head/"),
        (re.compile(r"^body\.(\d+)\.body\.0\."), r"body_\1/conv0/"),
        (re.compile(r"^body\.(\d+)\.body\.2\."), r"body_\1/conv1/"),
        (re.compile(r"^body\.(\d+)\.(weight|bias)$"), r"body_tail/\2"),
        (re.compile(r"^tail\.0\.0\."), "upsample/conv_0/"),
        (re.compile(r"^tail\.1\."), "tail/"),
    ],
    # MCNet (GAE/MCNet.py): weight-normed convs + module renames
    "mcnet": [
        (re.compile(r"^SSRM(\d)\."), lambda m: f"ssrm_{int(m.group(1)) - 1}/"),
        (re.compile(r"\bBlock(\d)\.(\d+)\.conv\.(\d+)\.conv\."),
         lambda m: f"block{m.group(1)}_{m.group(2)}/c{m.group(3)}/"),
        (re.compile(r"\bConv\.conv\.(\d+)\.conv\."),
         lambda m: f"conv_out/c{m.group(1)}/"),
        (re.compile(r"\breduceF\.conv\."), "reduceF/"),
        (re.compile(r"\bconv([123])\.0\."), r"conv\1/c0/"),
        (re.compile(r"\bconv([123])\.2\."), r"conv\1/c1/"),
        (re.compile(r"^tail\.0\."), "tail_up/"),
        (re.compile(r"^tail\.1\."), "tail_conv/"),
    ],
    # GAN-HSI-SR generator (GAE/net.py:75-131)
    "gan3d_g": [
        (re.compile(r"^conv_1\.0\."), "conv1/"),
        (re.compile(r"^attn_(\d)\.conv_1\.0\."), r"attn\1/conv1a/"),
        (re.compile(r"^attn_(\d)\.conv_1\.2\."), r"attn\1/conv1b/"),
        (re.compile(r"^attn_(\d)\.conv_2\.0\."), r"attn\1/fc0/"),
        (re.compile(r"^attn_(\d)\.conv_2\.2\."), r"attn\1/fc1/"),
        (re.compile(r"^conv_2\.0\."), "conv2/"),
        (re.compile(r"^conv_3\."), "conv3/"),
        (re.compile(r"^conv_4\.0\."), "conv4/"),
        (re.compile(r"^conv_5\."), "conv5/"),
    ],
    # GAN-HSI-SR discriminator (GAE/net.py:134-185): Sequential index ->
    # conv/BN pair names (pads and activations occupy the other slots)
    "gan3d_d": [
        (re.compile(r"^conv\.0\."), "c1/"),
        (re.compile(r"^conv\.3\."), "c2/"),
        (re.compile(r"^conv\.4\."), "b2/"),
        (re.compile(r"^conv\.6\."), "c3/"),
        (re.compile(r"^conv\.7\."), "b3/"),
        (re.compile(r"^conv\.10\."), "c4/"),
        (re.compile(r"^conv\.11\."), "b4/"),
        (re.compile(r"^conv\.13\."), "c5/"),
        (re.compile(r"^conv\.14\."), "b5/"),
        (re.compile(r"^conv\.16\."), "c6/"),
        (re.compile(r"^conv\.17\."), "b6/"),
        (re.compile(r"^linera\.0\."), "fc0/"),
        (re.compile(r"^linera\.2\."), "fc1/"),
    ],
    # CEGATSR (GAE/CEGATSR.py)
    "cegatsr": [
        (re.compile(r"^branch\.head\.head\.head\."), "branch/head/head/"),
        (re.compile(r"^branch\.head\.last\.last\."), "branch/head/last/"),
        (re.compile(r"^branch\.head\.body\."), "branch/head/body/"),
        (re.compile(r"\bdepth_conv\.weight$"), "depth_kernel"),
        (re.compile(r"\bdepth_conv\.bias$"), "depth_bias"),
        (re.compile(r"^trunk\.head\."), "trunk_head/"),
        (re.compile(r"^trunk\.body\."), "trunk_body/"),
        (re.compile(r"^trunk\.upsample\.(\d+)\."),
         lambda m: f"trunk_up/conv_{int(m.group(1)) // 2}/"),
    ],
}

# param names (or contiguous sub-paths) whose torch weights are
# ConvTranspose (IO-spatial), not Conv (OI-spatial) — they need the
# input/output axes swapped
_DECONV_HINTS = (("branch_up", "trunk_up"), ("branch_up", "multi_up"),
                 "tail_up", ("head", "last"))


def _path_hit(path, hint):
    if isinstance(hint, str):
        return hint in path
    n = len(hint)
    return any(tuple(path[i:i + n]) == hint for i in range(len(path) - n + 1))
# modules whose 1-D 'weight' is a PReLU slope, not a norm scale
_PRELU_HINTS = ("trunk_act", "multi_act")
# torch keys to drop entirely (declared-but-unused reference modules)
_DROP_KEYS = (re.compile(r"\bBN\.(weight|bias|running_mean|running_var|num_batches_tracked)$"),)


def torch_key_to_flax_path(key, model=None):
    """Translate one torch state_dict key into a flax param path tuple.

    e.g. ``Encoder.branch.body.net.0.spa.body.0.weight`` ->
    ``('encoder','branch','body','net_0','spa','conv0','kernel')``

    ``model`` selects an extra model-scoped rule group (_MODEL_RULES).
    """
    k = key
    for pat, rep in _MODEL_RULES.get(model, []):
        k = pat.sub(rep, k)
    for pat, rep in _RULES:
        k = pat.sub(rep, k)
    k = k.replace(".", "/")
    parts = k.split("/")
    # torch weight_norm: weight_g / weight_v -> kernel_g / kernel_v
    if parts[-1] == "weight_g":
        parts[-1] = "kernel_g"
    elif parts[-1] == "weight_v":
        parts[-1] = "kernel_v"
    elif parts[-1] == "weight":
        parts[-1] = "kernel"
    return tuple(parts)


def _nest(flat):
    tree = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


def state_dict_to_flax(sd, transpose_conv=True, model=None):
    """Generic torch state_dict -> flax variable collections.

    Conv weights (4-D OIHW / 5-D OIDHW) become HWIO / DHWIO kernels;
    transposed convs get the I/O swap; weight-norm g/v pairs map to
    kernel_g (flattened to (O,)) / kernel_v; 2-D linear weights become
    (in, out); 1-D 'weight's become norm 'scale's or PReLU 'alpha's.
    BatchNorm running stats land in the 'batch_stats' collection.
    Returns {'params': tree[, 'batch_stats': tree]}.
    """
    has_bn = any(
        k.endswith("running_mean") and not any(p.search(k) for p in _DROP_KEYS)
        for k in sd
    )
    flat_params, flat_stats = {}, {}
    for key, w in sd.items():
        if key.endswith("num_batches_tracked"):
            continue
        if any(p.search(key) for p in _DROP_KEYS):
            continue
        path = torch_key_to_flax_path(key, model=model)
        if has_bn:
            path = tuple("bn" if p == "gn" else p for p in path)
        arr = np.asarray(w)
        is_deconv = any(_path_hit(path, h) for h in _DECONV_HINTS)
        is_prelu = any(_path_hit(path, h) for h in _PRELU_HINTS)
        leaf = path[-1]
        if leaf == "depth_kernel" and arr.ndim == 4 and transpose_conv:
            arr = arr.transpose(2, 3, 1, 0)
        elif leaf == "kernel_g":
            arr = arr.reshape(-1)  # (O,1,1,..) -> (O,)
        elif leaf in ("kernel", "kernel_v") and arr.ndim == 5 and transpose_conv:
            # Conv3d OIDHW -> DHWIO; ConvTranspose3d IODHW -> (kd,kh,kw,I,O)
            arr = (arr.transpose(2, 3, 4, 0, 1) if is_deconv
                   else arr.transpose(2, 3, 4, 1, 0))
        elif leaf in ("kernel", "kernel_v") and arr.ndim == 4 and transpose_conv:
            # Conv2d OIHW -> HWIO; ConvTranspose2d IOHW -> (k,k,I,O)
            arr = (arr.transpose(2, 3, 0, 1) if is_deconv
                   else arr.transpose(2, 3, 1, 0))
        elif leaf == "kernel" and arr.ndim == 2:
            arr = arr.T
        elif leaf == "kernel" and arr.ndim == 1:
            path = path[:-1] + (("alpha" if is_prelu else "scale"),)
        if path[-1] in ("running_mean", "running_var"):
            stat = "mean" if path[-1] == "running_mean" else "var"
            flat_stats[path[:-1] + (stat,)] = arr
        else:
            flat_params[path] = arr
    out = {"params": _nest(flat_params)}
    if flat_stats:
        out["batch_stats"] = _nest(flat_stats)
    return out


def load_torch_vgg19(path):
    """Load a user-supplied torchvision ``vgg19*.pth`` (state_dict or
    whole-module pickle) -> flax variables for ``models.vgg.VGG19``.

    Completes the reference's stage-1 "VGGSAM" perceptual recipe
    (AE.py:551-604) in a zero-egress environment: the user provides the
    weights file, we convert it."""
    sd = load_state_dict(path)
    return state_dict_to_flax(sd)


def load_torch_gae(path):
    """Load a shipped GAE .pth -> (flax_params, config dict).

    The returned params drop into ``models.gae.GAE`` with matching
    (n_subs, n_ovls, n_colors, n_feats).
    """
    mod = load_torch_module(path)
    cfg = gae_config_from_module(mod)
    sd = {k: np.asarray(v.detach().cpu().numpy())
          for k, v in mod.state_dict().items()}
    return state_dict_to_flax(sd), cfg
