"""Analytic roofline model of the fused SR3 UNet sampler step.

XLA's ``compiled.cost_analysis()`` treats pallas_call custom calls as
opaque (0 flops / only operand bytes), so once the network runs on the
fused kernels (kernels/fused_conv.py) the compiler's own numbers no
longer describe the computation. This module recomputes them
analytically from the UNet config: it walks the exact op sequence of
``models.unet.UNet.__call__`` (same topology as the reference
sr3_modules/unet.py:162-263) and, per op, counts

  * ``flops``  — matmul/conv multiply-adds x2 (activation/norm VPU work
    is not MXU work and is excluded; it is orders of magnitude below
    the conv FLOPs at every level), and
  * ``bytes``  — the MINIMAL HBM traffic of the op under the fused
    kernel boundaries: every activation tensor crossing a kernel
    boundary counted once (bf16), weights once. This is the quantity a
    perfect implementation of the SAME fusion structure would move —
    the denominator of "%% of attainable".

Peak numbers per device kind are tabulated below; ``step_roofline``
returns per-op and total {flops, bytes, mxu_s, hbm_s} so callers
(bench.py --profile, BENCHMARKS.md) can report achieved TFLOP/s,
achieved GB/s, and %%-of-roofline against the measured step time.
"""

from __future__ import annotations

from dataclasses import dataclass

# (bf16 TFLOP/s, HBM GB/s) per jax device_kind. v5e: 197 bf16 TFLOP/s,
# 819 GB/s HBM (public v5e spec). Fallback = v5e.
DEVICE_PEAKS = {
    "TPU v5 lite": (197.0, 819.0),
    "TPU v5e": (197.0, 819.0),
    "TPU v4": (275.0, 1228.0),
    "TPU v5p": (459.0, 2765.0),
    "TPU v6 lite": (918.0, 1640.0),
}


def device_peaks(device_kind: str):
    for k, v in DEVICE_PEAKS.items():
        if device_kind.lower().startswith(k.lower()):
            return v
    return DEVICE_PEAKS["TPU v5 lite"]


@dataclass
class Op:
    name: str
    flops: float
    bytes: float


def _conv(B, res_in, cin, cout, stride=1, k=3):
    out_px = B * (res_in // stride) ** 2
    return (2.0 * out_px * k * k * cin * cout,
            2.0 * (B * res_in * res_in * cin + out_px * cout)
            + 2.0 * k * k * cin * cout)


def _resblock(B, res, cin, c2, cout):
    """Fused resblock: block1 = GN+swish+conv3x3 [cin+c2 -> cout] with
    in-pass 1x1 res projection when channels change; block2 =
    GN+swish+conv3x3 [cout -> cout] + residual add.

    HBM: block1 reads [x, x2] once (res proj shares the read), writes h
    (+ the res projection when emitted); block2 reads h (+ residual),
    writes out. Stats chaining keeps GroupNorm moments out of HBM.
    """
    ct = cin + c2
    px = B * res * res
    proj = ct != cout
    flops = (2.0 * px * 9 * ct * cout          # block1 conv
             + (2.0 * px * ct * cout if proj else 0.0)  # 1x1 res proj
             + 2.0 * px * 9 * cout * cout)     # block2 conv
    b1 = 2.0 * (px * ct + px * cout + (px * cout if proj else 0.0))
    b2 = 2.0 * (px * cout + (px * cout if proj else px * ct) + px * cout)
    wts = 2.0 * (9 * ct * cout + 9 * cout * cout + (ct * cout if proj else 0))
    return flops, b1 + b2 + wts


def _up2conv(B, res, c):
    """Fused nearest-x2 + conv3x3 as one lhs_dilation=2 conv
    (ops/fused_up.py): each output pixel touches a 2x2 window of real
    inputs through the composed 4x4 kernel."""
    out_px = B * (2 * res) ** 2
    return (2.0 * out_px * 4 * c * c,
            2.0 * (B * res * res * c + out_px * c) + 2.0 * 16 * c * c)


def _attention(B, res, c):
    px = B * res * res
    n = res * res
    flops = (3 * 2.0 * px * c * c          # qkv 1x1
             + 2 * 2.0 * B * n * n * c     # scores + weighted sum
             + 2.0 * px * c * c)           # out 1x1
    return flops, 2.0 * 6 * px * c + 2.0 * 4 * c * c


def unet_step_ops(B, size, inner=64, mults=(1, 2, 4, 8, 8), res_blocks=2,
                  attn_res=(16,), in_channel=6, out_channel=3):
    """Op list (name, flops, min HBM bytes) for ONE fused UNet forward
    at (B, size, size, in_channel) — mirrors UNet.__call__."""
    ops = []

    def add(name, fb):
        ops.append(Op(name, *fb))

    now = size
    add(f"downs_0[{now}^2 {in_channel}->{inner}]",
        _conv(B, now, in_channel, inner))
    feats = [inner]
    ch_in = inner
    for ind, m in enumerate(mults):
        ch = inner * m
        for _ in range(res_blocks):
            add(f"rb[{now}^2 {ch_in}->{ch}]", _resblock(B, now, ch_in, 0, ch))
            if now in attn_res:
                add(f"attn[{now}^2x{ch}]", _attention(B, now, ch))
            feats.append(ch)
            ch_in = ch
        if ind != len(mults) - 1:
            add(f"ds[{now}^2 {ch}]", _conv(B, now, ch, ch, stride=2))
            feats.append(ch)
            now //= 2

    add(f"mid_attn_rb[{now}^2x{ch_in}]", _resblock(B, now, ch_in, 0, ch_in))
    add(f"mid_attn[{now}^2x{ch_in}]", _attention(B, now, ch_in))
    add(f"mid_rb[{now}^2x{ch_in}]", _resblock(B, now, ch_in, 0, ch_in))

    for ind in reversed(range(len(mults))):
        ch = inner * mults[ind]
        for _ in range(res_blocks + 1):
            c2 = feats.pop()
            add(f"rb_up[{now}^2 {ch_in}+{c2}->{ch}]",
                _resblock(B, now, ch_in, c2, ch))
            if now in attn_res:
                add(f"attn[{now}^2x{ch}]", _attention(B, now, ch))
            ch_in = ch
        if ind >= 1:
            add(f"up2conv[{now}^2x{ch}]", _up2conv(B, now, ch))
            now *= 2

    add(f"final[{now}^2 {ch_in}->{out_channel}]",
        _conv(B, now, ch_in, out_channel))
    # sampler posterior math: ~6 f32 elementwise passes over the state
    st = B * size * size * out_channel * 4.0
    ops.append(Op("posterior_math", 0.0, 12.0 * st))
    return ops


def step_roofline(B, size, device_kind="TPU v5 lite", **kw):
    """Roofline table for one denoise step: per-op + totals."""
    tflops, gbps = device_peaks(device_kind)
    ops = unet_step_ops(B, size, **kw)
    rows = []
    for op in ops:
        mxu_s = op.flops / (tflops * 1e12)
        hbm_s = op.bytes / (gbps * 1e9)
        rows.append({
            "op": op.name, "gflop": op.flops / 1e9, "mb": op.bytes / 1e6,
            "mxu_ms": mxu_s * 1e3, "hbm_ms": hbm_s * 1e3,
            "bound": "mxu" if mxu_s > hbm_s else "hbm",
            "attainable_ms": max(mxu_s, hbm_s) * 1e3,
        })
    tot_f = sum(o.flops for o in ops)
    tot_b = sum(o.bytes for o in ops)
    return {
        "device_kind": device_kind,
        "peak_tflops": tflops, "peak_gbps": gbps,
        "ops": rows,
        "total_gflop": tot_f / 1e9,
        "total_gb": tot_b / 1e9,
        "mxu_s": tot_f / (tflops * 1e12),
        "hbm_s": tot_b / (gbps * 1e9),
        # sum of per-op attainable: every op individually at its own
        # roofline (tighter than max(total mxu, total hbm) when ops
        # alternate between the two bounds)
        "attainable_s": sum(r["attainable_ms"] for r in rows) / 1e3,
    }
