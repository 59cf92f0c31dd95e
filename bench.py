"""Flagship benchmark: full DMGASR x4 inference on a 512x512x102 Pavia cube.

Measures the end-to-end pipeline of the reference's `sr_gae.py -p val`
path (GAE-encode -> G-group-batched T-step reverse diffusion -> GAE-decode)
on one chip, with the real converted GAE_4_Pav weights when available.

Prints ONE JSON line:
  {"metric": "dmgasr_x4_512x512x102_cube_seconds", "value": <s>,
   "unit": "s", "vs_baseline": <north_star_30s / value>}

The BASELINE.json north-star is <30 s on v5e-8 (8 chips); vs_baseline
uses that 30 s budget, so >1.0 on a single chip means the 8-chip goal is
comfortably beaten.

The HEADLINE row is the production quality setting (t_start=4 truncated
cond-initialized sampling, configs/pavia_x4_r3.json — the setting that
scores MPSNR_cc 27.04); the same JSON line embeds a 'full_chain' subrow
timing the reference-semantics full T=20 ancestral chain. --t_start 0
benches the full chain only.

Flags: --small (CPU-friendly miniature), --dtype {bf16,f32}, --repeats N.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_SECONDS = 30.0
GAE_CKPT = os.environ.get(
    "GAE_PRETRAINED", "/root/reference/GAE_pretrained/GAE_4_Pav.pth"
)


def build(args):
    import jax
    import jax.numpy as jnp

    from hsi_dmgasr_tpu.models import GAE
    from hsi_dmgasr_tpu.models.networks import init_weights

    if args.small:
        size, channels, inner, mults, attn, n_sub, n_ovl, feats = (
            64, 31, 16, [1, 2], [16], 8, 2, 16
        )
    else:
        size, channels, inner, mults, attn, n_sub, n_ovl, feats = (
            512, 102, 64, [1, 2, 4, 8, 8], [16], 16, 4, 64
        )

    opt = {
        "model": {
            "which_model_G": "sr3",
            "unet": {
                "in_channel": 6, "out_channel": 3, "inner_channel": inner,
                "norm_groups": 16 if args.small else 32,
                "channel_multiplier": mults, "attn_res": attn,
                "res_blocks": 2, "dropout": 0.0,
            },
            "beta_schedule": {
                "val": {"schedule": "cosine", "n_timestep": args.timesteps,
                        "linear_start": 1e-6, "linear_end": 1e-2},
            },
            "diffusion": {"image_size": size, "channels": 3,
                          "conditional": True},
        },
    }

    key = jax.random.PRNGKey(0)
    gae_loaded = False
    if not args.small and os.path.exists(GAE_CKPT):
        from hsi_dmgasr_tpu.io import load_torch_gae

        gae_vars, cfg = load_torch_gae(GAE_CKPT)
        gae = GAE(n_subs=cfg["n_subs"], n_ovls=cfg["n_ovls"],
                  n_colors=cfg["n_colors"], n_feats=cfg["n_feats"])
        channels = cfg["n_colors"]
        gae_loaded = True
    else:
        gae = GAE(n_subs=n_sub, n_ovls=n_ovl, n_colors=channels,
                  n_feats=feats)
        gae_vars = gae.init(
            key, jnp.zeros((1, 32, 32, channels), jnp.float32)
        )

    from hsi_dmgasr_tpu.models.networks import diffusion_for_phase
    from hsi_dmgasr_tpu.models.unet import UNet

    u = opt["model"]["unet"]
    unet = UNet(
        in_channel=u["in_channel"], out_channel=u["out_channel"],
        inner_channel=u["inner_channel"], norm_groups=u["norm_groups"],
        channel_mults=tuple(u["channel_multiplier"]),
        attn_res=tuple(u["attn_res"]), res_blocks=u["res_blocks"],
        image_size=size,
        # fused Pallas GN+swish+conv resblocks (kernels/fused_conv.py);
        # the kernels compute in bf16 internally, so an f32 run stays
        # unfused to keep the label honest
        fuse_blocks=not args.no_fuse and args.dtype == "bf16",
        fuse_skip=False if args.no_fuse_skip else "auto",
        fuse_stats=not args.no_fuse_stats,
    )
    diffusion = diffusion_for_phase(opt, "val")
    unet_vars = unet.init(
        key, jnp.zeros((1, 64, 64, 6), jnp.float32), jnp.zeros((1, 1))
    )
    unet_vars = {"params": init_weights(unet_vars["params"], key)}

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if dtype != jnp.float32:
        gae_vars = jax.tree.map(lambda x: x.astype(dtype), gae_vars)
        unet_vars = jax.tree.map(lambda x: x.astype(dtype), unet_vars)

    # params are jit ARGUMENTS, not closure constants — baking ~100M f32
    # params into the serialized HLO blows up remote-compile payloads.
    def super_resolve(gv, uv, key, sr_cube):
        z = gae.apply(gv, sr_cube.astype(dtype), method=GAE.encode)
        b, g, h, w, c = z.shape
        cond = z.reshape(b * g, h, w, c)

        def denoise_fn(x, t):
            return unet.apply(uv, x.astype(dtype), t.astype(dtype))

        # --t_start: truncated cond-initialized chain (the production
        # quality setting, configs/pavia_x4_r3.json) — t_start UNet
        # steps instead of the full T
        ts = args.t_start or None
        n = cond.shape[0]
        if args.chunk and n > args.chunk and n % args.chunk == 0:
            # chunk the (B*G) latent batch through the reverse chain:
            # sampler temporaries scale with the chunk, so batch 4
            # (36 latent images at 512^2) fits single-chip HBM
            conds = cond.reshape(n // args.chunk, args.chunk, h, w, c)
            keys = jax.random.split(key, n // args.chunk)
            z_out = jax.lax.map(
                lambda kc: diffusion.sample_loop(denoise_fn, kc[0],
                                                 cond=kc[1], t_start=ts),
                (keys, conds),
            ).reshape(n, h, w, c)
        else:
            z_out = diffusion.sample_loop(denoise_fn, key, cond=cond,
                                          t_start=ts)
        y = gae.apply(
            gv, z_out.reshape(b, g, h, w, c).astype(dtype),
            method=GAE.decode,
        )
        return jnp.clip(y.astype(jnp.float32), 0.0, 1.0)

    def encode_decode(gv, sr_cube):
        # the fixed non-sampler cost of a cube: GAE encode + decode.
        # Timed separately so per-step telemetry can subtract it —
        # at t_start=4 it is ~19% of the wall time and dividing the
        # whole call by 4 steps misattributed it to the UNet
        # (VERDICT r4 weak #2).
        z = gae.apply(gv, sr_cube.astype(dtype), method=GAE.encode)
        y = gae.apply(gv, z, method=GAE.decode)
        return jnp.clip(y.astype(jnp.float32), 0.0, 1.0)

    return (super_resolve, encode_decode, (gae_vars, unet_vars), size,
            channels, gae_loaded, gae.n_subs, gae.n_ovls)


def measure(args):
    """Build + jit + time one configuration; returns (out, info)."""
    import jax
    import jax.numpy as jnp

    (fn, encdec_fn, (gae_vars, unet_vars), size, channels, gae_loaded,
     n_subs, n_ovls) = build(args)
    run = jax.jit(fn)
    gae_vars = jax.device_put(gae_vars)
    unet_vars = jax.device_put(unet_vars)

    rng = np.random.RandomState(0)
    cube = jnp.asarray(rng.rand(args.batch, size, size, channels), jnp.float32)

    # compile + warmup
    t0 = time.time()
    run(gae_vars, unet_vars, jax.random.PRNGKey(0), cube).block_until_ready()
    compile_s = time.time() - t0

    times = []
    for i in range(args.repeats):
        t0 = time.time()
        run(gae_vars, unet_vars, jax.random.PRNGKey(i + 1),
            cube).block_until_ready()
        times.append(time.time() - t0)
    secs = float(np.median(times))

    # BASELINE.json metric axes: denoise steps/sec/chip + cubes/min
    from hsi_dmgasr_tpu.models.gae import group_indices

    # group geometry comes from the actual GAE (GAE_PRETRAINED env can
    # swap in GAE_4_Chi / GAE_4_Cav, whose n_subs/n_ovls differ)
    n_groups = group_indices(channels, n_subs, n_ovls).shape[0]
    eff_steps = args.t_start or args.timesteps  # UNet forwards actually run
    info = {
        "device": str(jax.devices()[0]),
        "compile_s": round(compile_s, 2),
        "times": [round(t, 3) for t in times],
        "dtype": args.dtype,
        "timesteps": args.timesteps,
        "gae_ckpt": gae_loaded,
        "size": size,
        "channels": channels,
        "batch": args.batch,
        "t_start": args.t_start or None,
        "denoise_steps_per_sec_per_chip": round(
            eff_steps * n_groups * args.batch / secs, 2
        ),
        "cubes_per_min": round(60.0 * args.batch / secs, 2),
    }
    print(json.dumps(info), file=sys.stderr)
    per_cube = secs / args.batch
    out = {
        "metric": f"dmgasr_x4_{size}x{size}x{channels}_cube_seconds",
        "value": round(per_cube, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / per_cube, 3),
        "t_start": args.t_start or None,
    }
    if args.profile and not args.cpu:
        # analytic roofline (utils/roofline.py): XLA cost_analysis is
        # blind inside pallas custom calls, so FLOPs/bytes come from the
        # op-walk model of the fused UNet. The fixed GAE encode+decode
        # cost is timed separately and subtracted, so step_measured_ms
        # describes the UNet step at ANY t_start (at t_start=4 the
        # encode/decode is ~19% of the wall time; dividing the raw call
        # by 4 steps printed 36% where the kernels run ~46%).
        from hsi_dmgasr_tpu.utils.roofline import step_roofline

        encdec = jax.jit(encdec_fn)
        encdec(gae_vars, cube).block_until_ready()  # compile
        ed_times = []
        for _ in range(args.repeats):
            t0 = time.time()
            encdec(gae_vars, cube).block_until_ready()
            ed_times.append(time.time() - t0)
        ed_secs = float(np.median(ed_times))
        sampler_secs = max(secs - ed_secs, 1e-9)

        dk = getattr(jax.devices()[0], "device_kind", "TPU v5 lite")
        n_lat = n_groups * args.batch
        eff_b = min(n_lat, args.chunk) if args.chunk else n_lat
        rl = step_roofline(eff_b, size,
                           inner=64 if not args.small else 16,
                           mults=(1, 2, 4, 8, 8) if not args.small
                           else (1, 2),
                           device_kind=dk)
        n_seq = max(1, n_lat // eff_b)  # sequential chunks per call
        step_s = sampler_secs / eff_steps
        att = rl["attainable_s"] * n_seq
        out["profile"] = {
            "device_kind": dk,
            "encode_decode_ms": round(ed_secs * 1e3, 2),
            "peak_bf16_tflops": rl["peak_tflops"],
            "peak_hbm_gbps": rl["peak_gbps"],
            "step_gflop": round(rl["total_gflop"] * n_seq, 1),
            "step_min_hbm_gb": round(rl["total_gb"] * n_seq, 3),
            "step_measured_ms": round(step_s * 1e3, 2),
            "step_attainable_ms": round(att * 1e3, 2),
            "achieved_tflops": round(
                rl["total_gflop"] * n_seq / step_s / 1e3, 1),
            "achieved_min_gbps": round(
                rl["total_gb"] * n_seq / step_s, 1),
            "pct_of_attainable": round(100.0 * att / step_s, 1),
        }
    return out, info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    ap.add_argument("--timesteps", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1,
                    help="cubes per inference call (throughput mode)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-fuse", action="store_true",
                    help="disable the fused Pallas resblocks")
    ap.add_argument("--no-fuse-skip", action="store_true",
                    help="materialize up-path skip concats instead of "
                         "riding them through the fused kernel")
    ap.add_argument("--no-fuse-stats", action="store_true",
                    help="disable GroupNorm stats chaining")
    ap.add_argument("--profile", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="add MFU/roofline telemetry to the JSON line "
                         "(analytic model: utils/roofline.py — XLA "
                         "cost_analysis cannot see inside pallas calls); "
                         "on by default so every recorded bench carries "
                         "%%-of-attainable next to the seconds")
    ap.add_argument("--t_start", type=int, default=4,
                    help="truncated cond-initialized chain: run only the "
                         "last N reverse steps from init_from_cond "
                         "(model.diffusion.t_start=4 is the production "
                         "quality setting, configs/pavia_x4_r3.json, and "
                         "the headline; 0 = full T chain only)")
    ap.add_argument("--full_row", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="when t_start > 0, also time the full-T chain "
                         "and embed it as the 'full_chain' subrow for "
                         "reference-semantics comparability")
    ap.add_argument("--chunk", type=int, default=0,
                    help="latent images per sampler chunk (0 = whole "
                         "B*G batch in one scan); bounds sampler "
                         "temporaries so large batches fit HBM")
    ap.add_argument("--yield_tpu", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="if a supervised training child (experiments/*/"
                         "train_child.pid) holds the chip, stop its "
                         "supervisor+child before timing (it resumes from "
                         "its last checkpoint later); --no-yield_tpu "
                         "times anyway and labels the JSON 'contended'")
    args = ap.parse_args()

    import copy

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    preempted = False
    if not args.cpu:
        contender = _live_training_child()
        if contender and args.yield_tpu:
            preempted = _preempt_training(contender)
            contender = _live_training_child()
        if contender:
            print(f"[bench] WARNING: training child pid {contender} is "
                  "live — timings are contended", file=sys.stderr)

    out, info = measure(args)
    if preempted:
        out["preempted_training"] = True
    elif not args.cpu and _live_training_child():
        out["contended_by_pid"] = _live_training_child()
    if args.t_start and args.full_row:
        # secondary row: the reference's own full-T ancestral chain
        args2 = copy.copy(args)
        args2.t_start = 0
        args2.profile = False
        out2, _ = measure(args2)
        out["full_chain"] = {
            "timesteps": args.timesteps,
            "value": out2["value"],
            "vs_baseline": out2["vs_baseline"],
        }
    print(json.dumps(out))


def _live_training_child():
    """PID of a live supervised training child, if any (experiments/*/
    train_child.pid written by cli/sr_gae.py's supervisor). A zombie
    (SIGTERMed but not yet reaped) is dead for contention purposes —
    same rule as _preempt_training's _alive."""
    import glob

    for p in glob.glob(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "experiments", "*", "train_child.pid")):
        try:
            pid = int(open(p).read().strip())
            os.kill(pid, 0)
            with open(f"/proc/{pid}/stat") as f:
                if f.read().rsplit(")", 1)[1].split()[0] == "Z":
                    continue
            return pid
        except (ValueError, OSError):
            continue
    return None


def _preempt_training(child_pid, wait_s=30.0):
    """Stop a supervised training run for a clean bench: SIGTERM the
    supervisor FIRST (else it relaunches the child), then the child.
    Targets only the exact PIDs from the pid file and its verified
    parent — never name patterns. The run resumes from its newest
    checkpoint on the next supervised launch (docs/runs/README.md)."""
    import signal

    def _alive(pid):
        try:
            os.kill(pid, 0)
        except OSError:
            return False
        try:  # a zombie is dead for our purposes (parent not yet reaped)
            with open(f"/proc/{pid}/stat") as f:
                return f.read().rsplit(")", 1)[1].split()[0] != "Z"
        except OSError:
            return False

    try:
        with open(f"/proc/{child_pid}/stat") as f:
            ppid = int(f.read().rsplit(")", 1)[1].split()[1])
        with open(f"/proc/{ppid}/cmdline", "rb") as f:
            parent_cmd = f.read().decode(errors="replace")
    except OSError:
        ppid, parent_cmd = 0, ""
    victims = []
    if ppid > 1 and "--supervise" in parent_cmd:
        victims.append(ppid)
    victims.append(child_pid)
    for pid in victims:
        try:
            os.kill(pid, signal.SIGTERM)
        except OSError:
            pass
    deadline = time.time() + wait_s
    while time.time() < deadline and any(_alive(p) for p in victims):
        time.sleep(0.5)
    stopped = not any(_alive(p) for p in victims)
    print(f"[bench] preempted training (supervisor {ppid or '?'}, child "
          f"{child_pid}) for a clean timing: "
          f"{'stopped' if stopped else 'STILL ALIVE after timeout'}",
          file=sys.stderr)
    return stopped


if __name__ == "__main__":
    main()
