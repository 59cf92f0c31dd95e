"""Compose the from-noise full-chain A/B table (VERDICT r3 item 2).

Side A (reference): tools/ab_fullchain_torch.py trains the reference
modules in-process and logs from-noise vs t_start MPSNR_cc per val
checkpoint to a JSON file.

Side B (rebuild): configs/ab_fullchain.json trains the rebuild at the
identical scale; this tool loads its final checkpoint and evaluates the
same 32x32 val crops BOTH ways — the full from-noise chain
(model.diffusion.t_start absent) and the truncated t_start entry —
through the production validate() path (3 chains averaged).

Prints a markdown table + one JSON line for BENCHMARKS.md.

Usage:
    python tools/ab_fullchain_summary.py \
        --torch_json /tmp/ab_torch.json \
        --config configs/ab_fullchain.json \
        --experiments_root experiments/AB_fullchain --platform cpu
"""

import argparse
import copy
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def eval_rebuild(config, experiments_root, t_start, platform, chains=3,
                 resume_name=None):
    from hsi_dmgasr_tpu import config as config_mod
    from hsi_dmgasr_tpu.cli.common import force_platform
    from hsi_dmgasr_tpu.data import DataLoader
    from hsi_dmgasr_tpu.train import stage2_driver

    force_platform(platform)
    opt = config_mod.parse(config, phase="val",
                           experiments_root=experiments_root)
    opt = copy.deepcopy(opt)
    if t_start:
        opt["model"]["diffusion"]["t_start"] = t_start
    if resume_name:
        opt["path"]["resume_state"] = os.path.join(
            opt["path"]["checkpoint"], resume_name)
    else:
        best = stage2_driver._read_best(opt["path"]["checkpoint"])
        if best:
            opt["path"]["resume_state"] = os.path.join(
                opt["path"]["checkpoint"], best["name"])
    pipeline = stage2_driver.build_pipeline(opt, seed=0)
    scale = opt.get("scale") or 4
    val_opt = opt["datasets"]["val"]
    val_set = stage2_driver._limit(
        stage2_driver.build_dataset(val_opt, "val", scale),
        val_opt.get("data_len"))
    loader = DataLoader(val_set, batch_size=1)
    res = stage2_driver.validate(pipeline, loader, opt, result_path=None,
                                 save_outputs=False, ratio=scale,
                                 n_chains=chains)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch_json", default="/tmp/ab_torch.json")
    ap.add_argument("--config", default="configs/ab_fullchain.json")
    ap.add_argument("--experiments_root", default="experiments/AB_fullchain")
    ap.add_argument("--t_start", type=int, default=4)
    ap.add_argument("--chains", type=int, default=3)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--resume_name", default=None,
                    help="checkpoint dir name (e.g. I900_E57) instead of "
                         "the best-val snapshot — use the FINAL step for "
                         "apples-to-apples with the torch side's curve")
    args = ap.parse_args()

    with open(args.torch_json) as f:
        torch_side = json.load(f)
    tcurve = torch_side["curve"]

    full = eval_rebuild(args.config, args.experiments_root, None,
                        args.platform, args.chains, args.resume_name)
    trunc = eval_rebuild(args.config, args.experiments_root, args.t_start,
                         args.platform, args.chains, args.resume_name)

    def cc(res):
        return float(res["indices_cc"]["MPSNR"])

    summary = {
        "reference_torch": {
            "outer_steps": tcurve[-1]["outer_step"],
            "from_noise_mpsnr_cc": tcurve[-1]["mpsnr_cc_from_noise"],
            "t_start_mpsnr_cc": tcurve[-1]["mpsnr_cc_t_start"],
            "curve": [
                {k: r[k] for k in ("outer_step", "mpsnr_cc_from_noise",
                                   "mpsnr_cc_t_start")}
                for r in tcurve
            ],
        },
        "rebuild_jax": {
            "from_noise_mpsnr_cc": cc(full),
            "t_start_mpsnr_cc": cc(trunc),
            "from_noise_std": full.get("mpsnr_cc_std"),
            "t_start_std": trunc.get("mpsnr_cc_std"),
        },
    }
    print("\n| side | from-noise T=20 | t_start=4 | gap |")
    print("|---|---|---|---|")
    r = summary["reference_torch"]
    print(f"| reference (torch, its own p_sample_loop) | "
          f"{r['from_noise_mpsnr_cc']:.2f} | {r['t_start_mpsnr_cc']:.2f} | "
          f"{r['t_start_mpsnr_cc'] - r['from_noise_mpsnr_cc']:+.2f} |")
    b = summary["rebuild_jax"]
    print(f"| rebuild (jax, lax.scan sampler) | "
          f"{b['from_noise_mpsnr_cc']:.2f} | {b['t_start_mpsnr_cc']:.2f} | "
          f"{b['t_start_mpsnr_cc'] - b['from_noise_mpsnr_cc']:+.2f} |")
    print()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
