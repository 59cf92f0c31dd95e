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
