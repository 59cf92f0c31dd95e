"""MATLAB-compatible ``imresize`` (antialiased bicubic/bilinear).

This defines the LR degradation used throughout the framework; it must be
bit-accurate with the reference's port of MATLAB's imresize
(``imsize.py:116-158``) for PSNR parity. Implemented from the MATLAB
algorithm spec:

  * cubic kernel with a=-0.5; when downscaling, the kernel is stretched
    for antialiasing: ``h(x) = s * k(s*x)`` with support ``4/s``.
  * sample positions ``u = (x+1)/s + 0.5*(1 - 1/s)`` (1-based MATLAB x).
  * mirrored boundary handling via the [0..n-1, n-1..0] reflection trick.
  * per-row weight normalization, zero-weight column pruning.
  * dims are processed in order of increasing scale factor.

Also provides a JAX variant whose gather/weights are precomputed on host
for static shapes, so the degradation can run fused on device.
"""

from __future__ import annotations

import math

import numpy as np


def cubic(x):
    """MATLAB bicubic kernel (a = -0.5). Matches imsize.py:25-32."""
    x = np.asarray(x, dtype=np.float64)
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    inner = (1.5 * ax3 - 2.5 * ax2 + 1.0) * (ax <= 1)
    outer = (-0.5 * ax3 + 2.5 * ax2 - 4.0 * ax + 2.0) * ((ax > 1) & (ax <= 2))
    return inner + outer


def triangle(x):
    """Bilinear kernel. Matches imsize.py:17-22."""
    x = np.asarray(x, dtype=np.float64)
    return (x + 1.0) * ((x >= -1) & (x < 0)) + (1.0 - x) * ((x >= 0) & (x <= 1))


_KERNELS = {"bicubic": (cubic, 4.0), "bilinear": (triangle, 2.0)}


def _contributions(in_length, out_length, scale, kernel, k_width):
    """Weight/index tables for one dimension (imsize.py:35-59 semantics)."""
    if scale < 1:
        def h(x):
            return scale * kernel(scale * x)

        kernel_width = k_width / scale
    else:
        h = kernel
        kernel_width = k_width

    x = np.arange(1, out_length + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1.0 - 1.0 / scale)
    left = np.floor(u - kernel_width / 2.0)
    P = int(math.ceil(kernel_width)) + 2
    # 0-based candidate source indices per output sample
    ind = left[:, None] + np.arange(P) - 1
    indices = ind.astype(np.int64)
    weights = h(u[:, None] - indices - 1)
    weights = weights / np.sum(weights, axis=1, keepdims=True)
    # mirror boundary: indices reflected into [0, in_length)
    aux = np.concatenate(
        (np.arange(in_length), np.arange(in_length - 1, -1, -1))
    ).astype(np.int64)
    indices = aux[np.mod(indices, aux.size)]
    # prune columns that contribute nothing for any output sample
    keep = np.nonzero(np.any(weights != 0, axis=0))[0]
    return weights[:, keep], indices[:, keep]


try:  # native C++ kernel (native/imresize_ext.cpp); numpy fallback below
    from . import _imresize_native
except ImportError:
    import warnings

    _imresize_native = None
    # the fallback is bit-identical but ~17x slower, enough to make the
    # training data loader the bottleneck (BENCHMARKS.md) — warn once so
    # a missing `bash native/build.sh` can't silently slow a run
    warnings.warn(
        "hsi_dmgasr_tpu: native imresize extension not built; using the "
        "17x-slower numpy fallback. Run `bash native/build.sh`.",
        stacklevel=1,
    )


def _resize_along_dim(A, dim, weights, indices):
    """Apply one dim's weighted gather: out[o] = sum_p w[o,p] * A[idx[o,p]]."""
    if (
        _imresize_native is not None
        and A.ndim == 3
        and dim in (0, 1)
        and A.dtype in (np.float32, np.float64)
        and A.flags.c_contiguous
    ):
        w = np.ascontiguousarray(weights, dtype=np.float64)
        ind = np.ascontiguousarray(indices, dtype=np.int64)
        buf = _imresize_native.resize_along_dim(A, w, ind, dim)
        out_shape = list(A.shape)
        out_shape[dim] = w.shape[0]
        return np.frombuffer(bytes(buf), dtype=np.float64).reshape(out_shape)
    gathered = np.take(A, indices, axis=dim).astype(np.float64)
    # gathered has shape A.shape[:dim] + (out, P) + A.shape[dim+1:]
    w = weights.reshape((1,) * dim + weights.shape + (1,) * (A.ndim - dim - 1))
    return np.sum(gathered * w, axis=dim + 1)


def resize_plan(in_shape, scalar_scale=None, output_shape=None, method="bicubic"):
    """Compute (output_size, per-dim (dim, weights, indices) apply order)."""
    kernel, k_width = _KERNELS[method]
    if (scalar_scale is None) == (output_shape is None):
        raise ValueError("exactly one of scalar_scale / output_shape required")
    if scalar_scale is not None:
        s = float(scalar_scale)
        scale = [s, s]
        output_size = [int(math.ceil(s * in_shape[k])) for k in range(2)]
    else:
        output_size = list(output_shape)
        scale = [output_size[k] / in_shape[k] for k in range(2)]

    tables = []
    for k in range(2):
        w, ind = _contributions(in_shape[k], output_size[k], scale[k], kernel, k_width)
        tables.append((w, ind))
    order = np.argsort(np.array(scale), kind="stable")
    plan = [(int(d), tables[d][0], tables[d][1]) for d in order]
    return output_size, plan


def imresize(I, scalar_scale=None, method="bicubic", output_shape=None):
    """MATLAB-compatible resize of an (H, W) or (H, W, C) array.

    Drop-in equivalent of the reference ``imresize`` (imsize.py:116-158):
    float inputs pass through in float64; uint8 is clipped+rounded.
    """
    I = np.asarray(I)
    _, plan = resize_plan(I.shape[:2], scalar_scale, output_shape, method)
    B = I
    squeeze = False
    if B.ndim == 2:
        B = B[:, :, None]
        squeeze = True
    for dim, w, ind in plan:
        B = _resize_along_dim(B, dim, w, ind)
        # MATLAB (and the reference, imsize.py:101-105) quantizes uint8
        # after EVERY dimension pass, not only at the end.
        if I.dtype == np.uint8:
            B = np.around(np.clip(B, 0, 255)).astype(np.uint8)
    if squeeze:
        B = B[:, :, 0]
    return B


def make_imresize_jax(in_shape, scalar_scale=None, output_shape=None, method="bicubic"):
    """Build a jittable resize fn for a static (H, W) input spatial shape.

    Returns ``f(x)`` operating on (..., H, W, C)-shaped jnp arrays (spatial
    dims at -3/-2), with the two weighted gathers expressed as matmuls that
    XLA maps onto the MXU. Weight tables are float32 constants baked at
    trace time; matches the numpy ``imresize`` to ~1e-6 (float32).
    """
    import jax.numpy as jnp

    _, plan = resize_plan(in_shape, scalar_scale, output_shape, method)

    # Densify each dim's (weights, indices) table into a (out, in) matrix:
    # contributions are sparse but in/out lengths here are small (<=512),
    # and a dense matmul is the MXU-friendly formulation.
    mats = []
    for dim, w, ind in plan:
        n_in = in_shape[dim]
        dense = np.zeros((w.shape[0], n_in), dtype=np.float64)
        for o in range(w.shape[0]):
            np.add.at(dense[o], ind[o], w[o])
        mats.append((dim, jnp.asarray(dense, dtype=jnp.float32)))

    import jax

    def f(x):
        # x: (..., H, W, C); dim 0 -> axis -3, dim 1 -> axis -2
        # HIGHEST precision: the degradation defines PSNR parity, so the
        # MXU's default bf16 accumulation is not acceptable here.
        for dim, m in mats:
            axis = -3 if dim == 0 else -2
            x = jnp.moveaxis(x, axis, -1)
            x = jnp.einsum("...i,oi->...o", x, m, precision=jax.lax.Precision.HIGHEST)
            x = jnp.moveaxis(x, -1, axis)
        return x

    return f
