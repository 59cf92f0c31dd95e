"""VGG19 (torchvision layout) for the stage-1 perceptual loss.

The reference's optional "VGGSAM" stage-1 recipe feeds 3 random bands of
the reconstruction and target through a pretrained torchvision
``vgg19`` — the FULL network including classifier logits — and takes an
L1 between the outputs, weighted 1e-3 (reference AE.py:551-604,
610-615). Zero egress blocks the torchvision download, so the weights
come from a *user-supplied* ``vgg19*.pth`` via
``io.convert_torch.load_torch_vgg19``.

Param names are chosen so torchvision keys map 1:1 through
``torch_key_to_flax_path`` (features.0.weight -> features_0/kernel).
NHWC; the pre-classifier flatten transposes to channel-major to match
torch's NCHW flatten order exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.blocks import Conv2d, Dense

# torchvision cfg "E": conv channel widths, 'M' = 2x2/2 max-pool.
_CFG_E = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
          512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]


def _adaptive_avg_pool(x, out_hw=(7, 7)):
    """torch AdaptiveAvgPool2d semantics on NHWC with static shapes:
    bin i covers [floor(i*In/Out), ceil((i+1)*In/Out)) — exact for any
    In/Out ratio, including Out > In (small crops)."""
    b, h, w, c = x.shape
    oh, ow = out_hw

    def pool_axis(a, size, out, axis):
        slabs = []
        for i in range(out):
            s = (i * size) // out
            e = -(-((i + 1) * size) // out)
            slabs.append(jnp.mean(
                jax.lax.slice_in_dim(a, s, e, axis=axis),
                axis=axis, keepdims=True,
            ))
        return jnp.concatenate(slabs, axis=axis)

    return pool_axis(pool_axis(x, h, oh, axis=1), w, ow, axis=2)


class VGG19(nn.Module):
    """Full torchvision vgg19: features -> adaptive 7x7 pool ->
    classifier logits. Use ``extract='features'`` for the conv stack
    output instead of logits."""

    num_classes: int = 1000
    extract: str = "logits"  # 'logits' | 'features'

    @nn.compact
    def __call__(self, x):
        li = 0
        for v in _CFG_E:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                li += 1
            else:
                x = Conv2d(v, 3, name=f"features_{li}")(x)
                x = nn.relu(x)
                li += 2
        if self.extract == "features":
            return x
        x = _adaptive_avg_pool(x, (7, 7))
        # torch flattens NCHW -> (B, C*7*7); NHWC must transpose first
        b = x.shape[0]
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        x = nn.relu(Dense(4096, name="classifier_0")(x))
        x = nn.relu(Dense(4096, name="classifier_3")(x))
        return Dense(self.num_classes, name="classifier_6")(x)
