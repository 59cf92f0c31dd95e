"""DMGASR stage-2 entry point (reference sr_gae.py).

Usage: python -m hsi_dmgasr_tpu.cli.sr_gae -c configs/pavia_x4.json -p train

``--supervise N``: process-level elastic recovery. The remote-TPU
backend can drop the connection mid-run (and with the replay journal
compacted the process cannot recover in place), so the supervisor
relaunches training in a fresh process, resuming from the newest orbax
checkpoint in a pinned experiments root. The reference has no recovery
beyond manual ``resume_state`` editing (model/model.py:177-202).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
import time

from ..train import stage2_driver
from .common import base_parser, force_platform, parse_opt


def _latest_checkpoint(ckpt_dir):
    """Newest I{iter}_E{epoch} or best_I{iter}_E{epoch} orbax dir under
    ckpt_dir, or None. Best-val snapshots hold the full train state and
    are often newer than the last periodic save (val_freq <
    save_checkpoint_freq), so resuming from them loses less work after
    a crash (observed: PavT200_r4 redid 2000→2500 on every restart)."""
    best, best_iter = None, -1
    if not os.path.isdir(ckpt_dir):
        return None
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"(?:best_)?I(\d+)_E(\d+)", name)
        if m and int(m.group(1)) > best_iter:
            best_iter = int(m.group(1))
            best = os.path.join(ckpt_dir, name)
    return best


def supervise(args, max_restarts):
    """Relaunch the train process on failure, resuming from the newest
    checkpoint. Aborts after 3 consecutive immediate (<120 s) failures —
    that is a broken config, not a flaky backend."""
    from .. import config as config_mod

    root = args.experiments_root
    if root is None:
        opt_name = config_mod.parse(args.config, phase=args.phase)["name"]
        root = os.path.join(
            "experiments", f"{opt_name}_{config_mod.get_timestamp()}"
        )
    # resolve the checkpoint dir through the config (a config with a
    # non-default path.checkpoint would otherwise make every restart
    # silently find no checkpoint and lose progress)
    ckpt_dir = config_mod.parse(
        args.config, phase=args.phase, experiments_root=root
    )["path"]["checkpoint"]

    base_cmd = [sys.executable, "-m", "hsi_dmgasr_tpu.cli.sr_gae",
                "-c", args.config, "-p", args.phase,
                "--seed", str(args.seed), "--experiments_root", root]
    if args.gpu_ids:
        base_cmd += ["-gpu", args.gpu_ids]
    if args.debug:
        base_cmd += ["-debug"]
    if args.platform:
        base_cmd += ["--platform", args.platform]

    streak = 0
    for attempt in range(max_restarts + 1):
        cmd = list(base_cmd)
        ckpt = _latest_checkpoint(ckpt_dir)
        if ckpt:
            cmd += ["--resume", ckpt]
        elif args.resume:
            cmd += ["--resume", args.resume]
        print(f"[supervisor] attempt {attempt}: {' '.join(cmd)}",
              flush=True)
        t0 = time.time()
        # record the child PID so operators can SIGSTOP/SIGCONT it (e.g.
        # to pause training while benchmarking the single TPU chip)
        # without pattern-matching process names
        proc = subprocess.Popen(cmd)
        pid_file = os.path.join(root, "train_child.pid")
        try:
            with open(pid_file, "w") as f:
                f.write(str(proc.pid))
        except OSError:
            pass
        rc = proc.wait()
        if rc == 0:
            print("[supervisor] training completed", flush=True)
            return 0
        streak = streak + 1 if time.time() - t0 < 120 else 0
        print(f"[supervisor] attempt {attempt} failed rc={rc} "
              f"after {time.time() - t0:.0f}s (streak {streak})",
              flush=True)
        if streak >= 3:
            raise RuntimeError(
                "3 consecutive immediate failures — not a transient "
                "backend drop; aborting"
            )
        time.sleep(min(60.0, 5.0 * 2 ** streak))
    raise RuntimeError(f"exhausted {max_restarts} restarts")


def main(argv=None):
    p = base_parser("configs/pavia_x4.json")
    p.add_argument("--supervise", type=int, default=0, metavar="N",
                   help="relaunch training up to N times on backend "
                        "failure, resuming from the newest checkpoint")
    args = p.parse_args(argv)
    if args.supervise and args.phase == "train":
        return supervise(args, args.supervise)
    force_platform(args.platform)
    opt = parse_opt(args)
    if args.phase == "train":
        stage2_driver.train(opt, seed=args.seed)
    else:
        stage2_driver.run_val_phase(opt, seed=args.seed)


if __name__ == "__main__":
    main()
