"""Device mesh + data-parallel sharding.

Replaces the reference's THREE parallelism mechanisms — nn.DataParallel
(model/networks.py:113-115), DDP+NCCL (SSPSR.py:208-245, GAE/AEddp.py),
and the mp.spawn launcher (distributed/launch.py) — with one mesh:

  * ``data_parallel_mesh()`` builds a 1-D jax.sharding.Mesh over all
    (or N) devices; multi-host / multi-slice topologies come for free
    through jax.distributed + DCN-aware device order.
  * Batches are sharded on axis 0 (NamedSharding P('data')); params are
    replicated. Under jit, XLA inserts the gradient all-reduce over ICI
    automatically — the NCCL all_reduce/broadcast utilities of
    distributed/distributed.py:12-143 have no hand-written equivalent
    because the compiler owns the collectives.

Every entry point works unchanged on 1 device (mesh of size 1).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(n_devices: Optional[int] = None, axis: str = "data"):
    """1-D device mesh over the first n_devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def with_data_sharding(mesh: Mesh, axis: str = "data"):
    """(batch_sharding, replicated_sharding) pair for jit in/out specs."""
    return NamedSharding(mesh, P(axis)), NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch (pytree, leading batch axis) onto the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def dmgasr_mesh(n_data: int, n_space: int = 1):
    """2-D ('data', 'space') mesh: band groups / cubes ride 'data',
    the image height rides 'space'.

    Spatial sharding is the single-cube LATENCY axis the reference has
    no equivalent for (DataParallel only splits the batch,
    model/networks.py:113-115): under jit, XLA partitions every conv
    over the H dimension and inserts halo exchanges / GroupNorm
    all-reduces over ICI automatically."""
    devs = jax.devices()[: n_data * n_space]
    if len(devs) < n_data * n_space:
        raise ValueError(
            f"need {n_data * n_space} devices, have {len(devs)}"
        )
    return Mesh(np.array(devs).reshape(n_data, n_space),
                ("data", "space"))


def shard_spatial(mesh: Mesh, x, batch_axis="data", space_axis="space"):
    """Place (B, H, W, C) arrays with B over 'data' and H over 'space'."""
    sh = NamedSharding(mesh, P(batch_axis, space_axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), x)


def local_batch_size(global_batch: int, mesh: Mesh, axis: str = "data"):
    n = mesh.shape[axis]
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by mesh axis "
            f"'{axis}' size {n}"
        )
    return global_batch // n
