"""Device mesh + GSPMD sharding -- the TPU replacement for DDP/NCCL.

The reference's only parallelism is data parallelism over NCCL (DDP wrap,
SyncBatchNorm, DistributedSampler; reference: movedepth/trainer.py:48-49,
69-135,170-198, utils.py:51-87). Here the same strategy is expressed as a
``jax.sharding.Mesh`` with a ``data`` axis:

  * the batch is sharded over ``data`` -- XLA inserts the gradient
    all-reduce over ICI automatically (no backward hooks);
  * BatchNorm sees the global batch under GSPMD, so cross-replica (Sync)
    BN statistics come for free;
  * an optional ``model`` axis additionally shards the plane-sweep cost
    volume's depth-hypothesis axis (a form of tensor parallelism the
    reference cannot express), activated through sharding constraints in
    the pipeline via :func:`constrain`.
"""

from __future__ import annotations

import contextlib
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, data: Optional[int] = None,
              model: int = 1) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on ``data``."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


_ACTIVE_MESH: Optional[Mesh] = None


@contextlib.contextmanager
def activate_mesh(mesh: Optional[Mesh]):
    """Make ``mesh`` visible to :func:`constrain` inside traced code."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield mesh
    finally:
        _ACTIVE_MESH = prev


def constrain(x, *axes):
    """Apply a sharding constraint if a mesh is active; identity otherwise.

    ``axes`` name mesh axes per array dimension (None = replicated dim).
    Axes whose mesh size is 1 still constrain validly.
    """
    mesh = _ACTIVE_MESH
    if mesh is None:
        return x
    spec = P(*[a if (a in mesh.axis_names) else None for a in axes])
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for batch pytrees."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def is_multiprocess(mesh: Mesh) -> bool:
    """True when the mesh spans devices owned by other processes (the
    torch.distributed.launch N-rank regime; reference:
    train_movedepth.sh:15). Placement must then go through
    ``jax.make_array_from_process_local_data`` -- ``device_put`` can only
    target this process's addressable devices."""
    if jax.process_count() == 1:
        return False
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def _place(x, mesh: Mesh, s: NamedSharding):
    if is_multiprocess(mesh):
        return jax.make_array_from_process_local_data(s, np.asarray(x))
    return jax.device_put(x, s)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch onto the mesh, sharded over ``data``.

    Single process: the batch is the global batch. Multi-process: each
    process passes its LOCAL loader rows (rank-strided shard, the
    DistributedSampler contract) and the global array is assembled across
    processes (global batch = world_size x local batch).
    """
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: _place(x, mesh, s), batch)


def shard_stacked_batch(batches, mesh: Mesh):
    """Place a (K, B, ...) stacked multi-step batch pytree onto the mesh:
    the step axis K is replicated (scanned over on every device), the
    batch axis is sharded over ``data``."""
    s = NamedSharding(mesh, P(None, "data"))
    return jax.tree.map(lambda x: _place(x, mesh, s), batches)


def replicate(tree, mesh: Mesh):
    """Replicate params/state/scalars across the mesh (multi-process: every
    process must hold an identical host copy, e.g. same-seed init)."""
    s = replicated(mesh)
    return jax.tree.map(lambda x: _place(x, mesh, s), tree)


def local_array(x) -> np.ndarray:
    """Host view of an array: this process's rows.

    Fully-addressable arrays (single process, or host numpy) convert
    directly. Global multi-process arrays: replicated values return the
    local copy; leading-axis ``data``-sharded values return the
    concatenation of this process's shards -- exactly the rows this
    host's loader produced. (Only leading-axis or fully-replicated
    shardings are supported; that covers every logged tensor.)
    """
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    by_index = {}
    for sh in x.addressable_shards:
        key = tuple((sl.start or 0) for sl in sh.index)
        by_index.setdefault(key, sh.data)
    shards = [np.asarray(d) for _, d in sorted(by_index.items())]
    if len(shards) == 1:
        return shards[0]
    return np.concatenate(shards, axis=0)


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host initialization (the torch.distributed.launch equivalent;
    reference: train_movedepth.sh:15, trainer.py:48-49).

    On TPU pods the arguments are discovered from the environment; pass
    them explicitly elsewhere. After this, jax.devices() spans all hosts
    and make_mesh() builds a global mesh; each host feeds its local batch
    shard (Loader rank=jax.process_index(), world=jax.process_count()).
    """
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index(), jax.process_count()
