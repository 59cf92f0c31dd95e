"""bench.py TPU-yield guard: preempting a supervised training run.

The driver benches on the single TPU chip at round end; a live
device-resident training child would contend the timings (CLAUDE.md:
one TPU consumer at a time). bench._preempt_training must stop the
supervisor FIRST (else it relaunches the child), then the child, and
touch only the exact PIDs involved.
"""

import os
import subprocess
import sys
import threading

import bench


def _alive(pid):
    """Zombies count as dead (the container's init may reap slowly)."""
    try:
        os.kill(pid, 0)
    except OSError:
        return False
    try:
        with open(f"/proc/{pid}/stat") as f:
            return f.read().rsplit(")", 1)[1].split()[0] != "Z"
    except OSError:
        return False


def test_preempt_kills_supervisor_then_child():
    # parent whose cmdline carries --supervise, blocking on a child wait
    code = (
        "import subprocess,sys;"
        "p=subprocess.Popen([sys.executable,'-c','import time;time.sleep(300)']);"
        "print(p.pid,flush=True); p.wait()"
    )
    parent = subprocess.Popen(
        [sys.executable, "-c", code, "--supervise", "40"],
        stdout=subprocess.PIPE, text=True,
    )
    try:
        child_pid = int(parent.stdout.readline())
        # reap the parent on exit as init would (else it lingers as a
        # zombie and the liveness poll never sees it die)
        threading.Thread(target=parent.wait, daemon=True).start()
        assert bench._preempt_training(child_pid, wait_s=15)
        assert parent.poll() is not None
        assert not _alive(child_pid)
    finally:
        for pid in (parent.pid,):
            try:
                os.kill(pid, 9)
            except OSError:
                pass


def test_preempt_without_supervisor_parent_kills_only_child():
    # child whose parent is NOT a supervisor: parent must survive
    child = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(300)"]
    )
    try:
        assert bench._preempt_training(child.pid, wait_s=15)
        child.wait(timeout=5)
        assert not _alive(child.pid) or child.poll() is not None
    finally:
        try:
            child.kill()
        except OSError:
            pass


def test_live_training_child_ignores_dead_pids(tmp_path, monkeypatch):
    # point the scan at a scratch experiments tree with a dead pid
    exp = tmp_path / "experiments" / "fake"
    exp.mkdir(parents=True)
    (exp / "train_child.pid").write_text("999999999")
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda p: str(tmp_path)
    )
    assert bench._live_training_child() is None
