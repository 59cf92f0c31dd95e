"""Multi-host layer exercised for REAL: 2 jax.distributed CPU processes.

Launches two subprocesses that rendezvous through a local coordinator,
run initialize()/synchronize()/all_gather_objects()/per_host_slice(),
and execute one jitted cross-process reduction over a global 2-device
mesh (the collective the data-parallel gradient all-reduce rides).
Replaces the reference's mp.spawn + NCCL smoke (distributed/launch.py,
distributed/distributed.py:12-143) at the capability level.
"""

import os
import socket
import subprocess
import sys

import numpy as np

_CHILD = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])

from hsi_dmgasr_tpu.parallel import multihost

multihost.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert multihost.get_world_size() == 2, multihost.get_world_size()
assert multihost.get_rank() == pid
assert multihost.is_primary() == (pid == 0)

multihost.synchronize()

ranks = multihost.all_gather_objects(multihost.get_rank())
assert sorted(int(r) for r in ranks) == [0, 1], ranks

start, stop = multihost.per_host_slice(10, 1)
assert (start, stop) == ((0, 5) if pid == 0 else (5, 10)), (start, stop)

# a real cross-process collective: global mean over a 2-device mesh
import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()), ("data",))
local = np.full((4, 8), pid + 1.0, np.float32)
garr = multihost_utils.host_local_array_to_global_array(
    local, mesh, P("data")
)
out = jax.jit(
    jnp.mean, in_shardings=NamedSharding(mesh, P("data")),
    out_shardings=None,
)(garr)
val = float(np.asarray(out.addressable_data(0)))
assert abs(val - 1.5) < 1e-6, val

# distributed DataLoader: this process sees only its dataset shard
from hsi_dmgasr_tpu.data import DataLoader

class DS:
    def __len__(self):
        return 10

    def __getitem__(self, i):
        return np.full((2,), i, np.float32)

batches = list(DataLoader(DS(), batch_size=5, distributed=True, prefetch=0))
got = sorted(int(v) for b in batches for v in b[:, 0])
assert got == (list(range(5)) if pid == 0 else list(range(5, 10))), got

print(f"CHILD{pid} OK", flush=True)
"""


_CHILD_2LEVEL = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
port, pid = sys.argv[1], int(sys.argv[2])

import numpy as np
from hsi_dmgasr_tpu.parallel import multihost

multihost.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2
assert jax.local_device_count() == 4, jax.local_device_count()
assert jax.device_count() == 8, jax.device_count()

# two-level ('data','space') mesh: the data axis SPANS the two
# processes (the DCN axis on a real pod-slice pair), the space axis is
# process-local (ICI) — the layout a v5e multi-slice deployment uses
from hsi_dmgasr_tpu.parallel.mesh import data_parallel_mesh, dmgasr_mesh

mesh2 = dmgasr_mesh(2, 4)
for row, procs in enumerate(mesh2.devices):
    owners = {d.process_index for d in procs}
    assert owners == {row}, (row, owners)

import __graft_entry__ as ge
from hsi_dmgasr_tpu.models import GAE
from hsi_dmgasr_tpu.pipeline import DMGASRPipeline
from hsi_dmgasr_tpu.train.ddpm_model import DDPMModel

opt = ge._tiny_opt()
gae = GAE(n_subs=8, n_ovls=2, n_colors=31, n_feats=16)
gae_vars = gae.init(jax.random.PRNGKey(0), np.zeros((1, 16, 16, 31), np.float32))
cfg = {"n_subs": 8, "n_ovls": 2, "n_colors": 31, "n_feats": 16, "G": 5}

# train step over the full 8-device (2 proc x 4 dev) data mesh: the
# gradient all-reduce crosses the process boundary
mesh1 = data_parallel_mesh(8)
ddpm = DDPMModel(opt, mesh=mesh1, seed=0)
pipe = DMGASRPipeline(opt, gae_vars, cfg, ddpm=ddpm)
rng = np.random.RandomState(0)  # same seed -> same global batch everywhere
batch = {
    "HR": rng.rand(8, 16, 16, 31).astype(np.float32),
    "SR": rng.rand(8, 16, 16, 31).astype(np.float32),
}
loss = pipe.train_step(batch, key=jax.random.PRNGKey(1))
lv = float(np.asarray(loss.addressable_data(0)))
assert np.isfinite(lv), lv

# fused spatial-sharded inference across the two-level mesh, with the
# noise replayed so it must agree with the plain sharded sampler
import jax.numpy as jnp

out2 = pipe.super_resolve_spatial(
    batch["SR"][:1], mesh2, key=jax.random.PRNGKey(3),
    fused=True, replay_noise=True,
)
assert out2.shape == (1, 16, 16, 31)
want = pipe.super_resolve(batch["SR"][:1], key=jax.random.PRNGKey(3))
err = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(out2, want)
ev = float(np.asarray(err.addressable_data(0)))
# cross-process all-reduces order f32 reductions differently than the
# single-partitioning run, so GroupNorm stats drift at ~1e-6 and the
# chain amplifies it; 5e-3 on a [0,1] cube is replay-level agreement
# (the bitwise 1e-4 bound is asserted for the single-process 2-D mesh
# in __graft_entry__.dryrun_multichip / test_spatial_fused.py)
assert ev < 5e-3, ev

multihost.synchronize()
print(f"CHILD{pid} OK loss={lv:.4f} err={ev:.2e}", flush=True)
"""


def test_two_process_two_level_mesh(tmp_path):
    """2 processes x 4 local devices: a ('data','space') mesh whose data
    axis crosses the process (DCN) boundary drives one pipeline train
    step and one fused spatial-sharded inference — the configuration a
    real v5e pod-slice pair would run (SURVEY §5's multi-slice claim,
    exercised)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "child2l.py"
    script.write_text(_CHILD_2LEVEL)
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=540)
        outs.append(out)
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
    assert "CHILD0 OK" in outs[0]
    assert "CHILD1 OK" in outs[1]


def test_two_process_distributed(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one CPU device per process
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(port), str(pid)],
            env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
    assert "CHILD0 OK" in outs[0]
    assert "CHILD1 OK" in outs[1]
