"""Device mesh + sharding utilities — the distributed runtime (L1).

TPU-native replacement for the reference's NCCL/DDP stack
(reference util/distributed.py): no hand-written collectives anywhere — XLA
emits grad all-reduces over ICI from the sharding annotations on the jitted
train step; eval gathers are ``jax.lax.all_gather``/process_allgather.

Default topology is a 1-D ``data`` axis (the reference's only parallelism is
DDP, SURVEY.md §2.2); the helpers accept richer shapes (e.g. ('data',
'model')) for scaling beyond parity.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None, num_processes: int = 1,
                     process_id: int = 0) -> None:
    """Multi-host init over DCN (reference init_distributed_mode equivalent,
    util/distributed.py:66-100). No-op for single-host."""
    if num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(
    shape: Optional[dict[str, int]] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a Mesh. Default: all devices on one 'data' axis."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = {"data": len(devices)}
    axes = tuple(shape.keys())
    dims = tuple(shape.values())
    assert int(np.prod(dims)) == len(devices), (dims, len(devices))
    return Mesh(np.asarray(devices).reshape(dims), axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Host arrays → device arrays sharded along the batch dimension."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def host_gather(tree):
    """Concatenate host-local numpy arrays across processes along axis 0.

    The cross-process eval gather (reference ``concat_all_gather``,
    util/distributed.py:114-127, used at eval_linprobe.py:242-246 and
    util/knn_probe.py:108-111): every eval entry shards its val set per host
    (data/loader.py), so predictions/features/labels must be gathered over
    DCN before scoring, or each host would silently score its own shard.
    No-op on single-process jobs.
    """
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(tree, tiled=True)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_device_count() -> int:
    return jax.local_device_count()
