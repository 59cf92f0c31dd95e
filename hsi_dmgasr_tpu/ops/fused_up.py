"""Exact fusion of nearest-x2 upsample + 3x3 SAME conv (the SR3 UNet
up-path boundary, reference model/sr3_modules/unet.py:146-152).

``conv3x3(nearest_up2(x))`` never needs the upsampled tensor: because
nearest-x2 repeats each source pixel 2x2, every output pixel's 3x3
window covers only a 2x2 block of SOURCE pixels, with tap weights that
are sums of the original 3x3 taps. Per output phase (p, q) in {0,1}^2:

  rows: p=0 reads source rows (i-1, i) weighted (K[0], K[1]+K[2])
        p=1 reads source rows (i, i+1) weighted (K[0]+K[1], K[2])
  (columns identical with the kernel's second axis)

So the whole op is ONE VALID 2x2 conv over the once-padded source with
the four phase kernels stacked on the output channels, then a phase
interleave (pixel-shuffle reshape). vs the unfused path this cuts conv
FLOPs 9/4x and reads the source at 1x instead of writing+reading the
4x nearest-upsampled intermediate — the up-path boundary at 512^2 is
one of the last HBM-bound unfused ops in the sampler.

Exact math (not an approximation): parity-tested against
resize+conv in tests/test_fused_conv.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _phase_kernels(kernel):
    """(3, 3, C, Cout) -> (2, 2, C, 4*Cout) phase-packed 2x2 kernels.

    Output channel block 2*p+q holds phase (p, q).
    """
    k0, k1, k2 = kernel[0], kernel[1], kernel[2]
    # row-tap pairs per phase p: [weight(source row a), weight(row a+1)]
    rows = {
        0: (k0, k1 + k2),          # window (i-1, i)
        1: (k0 + k1, k2),          # window (i, i+1)
    }

    def col_pair(k):               # k: (3, C, Cout) -> per-q 2-tuples
        return {
            0: (k[0], k[1] + k[2]),
            1: (k[0] + k[1], k[2]),
        }

    blocks = []
    for p in range(2):
        for q in range(2):
            r0, r1 = rows[p]
            c0 = col_pair(r0)[q]
            c1 = col_pair(r1)[q]
            # (2, 2, C, Cout): [[r0c0, r0c1], [r1c0, r1c1]]
            blocks.append(jnp.stack([jnp.stack(c0, 0), jnp.stack(c1, 0)], 0))
    return jnp.concatenate(blocks, axis=-1)


def up2_conv3x3(x, kernel, bias=None):
    """nearest-x2 upsample then 3x3 SAME conv, as one 2x2 conv.

    x: (B, H, W, C); kernel: (3, 3, C, Cout) HWIO (the ORIGINAL conv3x3
    params); bias: (Cout,). Returns (B, 2H, 2W, Cout), bitwise the same
    math as ``conv3x3(jax.image.resize(x, nearest))`` up to float
    summation order.
    """
    b, h, w, c = x.shape
    cout = kernel.shape[-1]
    pk = _phase_kernels(kernel).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    conv = jax.lax.conv_general_dilated(
        xp, pk, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H+1, W+1, 4*Cout)
    # out[:, 2i+p, 2j+q] = conv[:, i+p, j+q, (2p+q) block]
    phases = [
        conv[:, p:p + h, q:q + w, (2 * p + q) * cout:(2 * p + q + 1) * cout]
        for p in range(2) for q in range(2)
    ]
    out = jnp.stack(phases, axis=3).reshape(b, h, w, 2, 2, cout)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
