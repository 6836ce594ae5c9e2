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
    """Host arrays → device arrays sharded along the batch dimension.

    Single-process: ``device_put`` of the full batch. Multi-process: each
    host holds only its loader shard (data/loader.py host sharding), so the
    global array is assembled from per-process local data — the TPU-native
    equivalent of the reference's per-rank DistributedSampler batches
    feeding DDP (util/data.py:10-12)."""
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Replicate host values onto every device. Multi-process: every host
    must hold identical values (same-seed init / same checkpoint) — they
    become the single logical replicated array."""
    sh = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            tree)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def _is_scanned_path(path: str) -> bool:
    # scan-over-layers trunk leaves carry a leading stacked-depth axis
    # (models/deepavfusion.py ScanLayer, name='layers')
    return path.startswith("layers/") or "/layers/" in path


def tp_param_spec(path: str, v, model_axis: str = "model",
                  model_size: int = 1) -> P:
    """PartitionSpec for one parameter leaf under tensor parallelism.

    Megatron-style column sharding via GSPMD: ≥2-D kernels shard their last
    dimension over the model axis when divisible (qkv/mlp/proj kernels, conv
    patch embeds, pos embeds); 1-D leaves (bias/scale) and non-divisible
    shapes replicate. Scanned-trunk leaves ignore the leading depth axis.
    XLA inserts the all-gathers/reduce-scatters — no hand-written
    collectives (SURVEY §7 'room for a model axis').
    """
    start = 1 if _is_scanned_path(path) else 0
    if v.ndim - start < 2:
        return P()
    d = v.ndim - 1
    if v.shape[d] % model_size == 0 and v.shape[d] >= 2 * model_size:
        spec = [None] * v.ndim
        spec[d] = model_axis
        return P(*spec)
    return P()


def tp_shard_params(params, mesh: Mesh, model_axis: str = "model"):
    """Place a parameter pytree with tensor-parallel shardings.

    Use with a ≥2-D mesh (e.g. {'data': 2, 'model': 4}) and an
    inferred-sharding train step: jit propagates these placements through
    grads, the optimizer update, and the new state, so optimizer state is
    sharded identically (per-chip param+optimizer memory drops ~model_size x).

    FSDP / ZeRO-3 falls out of the same machinery: pass
    ``model_axis='data'`` on a 1-D data mesh — params (and the optimizer
    state jit propagates from them) shard over the data axis and XLA
    all-gathers each weight at its use site.
    """
    model_size = mesh.shape[model_axis]
    multi = jax.process_count() > 1

    def place(path, v):
        p = "/".join(getattr(k, "key", str(getattr(k, "idx", k))) for k in path)
        sh = NamedSharding(mesh, tp_param_spec(p, v, model_axis, model_size))
        if multi:
            # device_put cannot target non-addressable devices; every host
            # holds the full array (same-seed init / restored checkpoint),
            # so each process contributes its addressable shards by slicing
            # its local copy.
            va = np.asarray(v)
            return jax.make_array_from_callback(va.shape, sh,
                                                lambda idx: va[idx])
        return jax.device_put(v, sh)

    return jax.tree_util.tree_map_with_path(place, params)


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


def host_gather_objects(obj):
    """Gather arbitrary picklable python objects from every process.

    The reference's ``all_gather`` of objects (util/distributed.py:130-133,
    torch ``all_gather_object``) — unused by any reference entry point but
    part of its distributed surface. Returns ``[obj_rank0, obj_rank1, ...]``.
    Implementation: pickle → uint8 array padded to the global max length
    (one scalar allgather for lengths, one tiled allgather for payloads over
    DCN) → unpickle per rank. No-op ``[obj]`` on single-process jobs.
    """
    import pickle

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    lengths = multihost_utils.process_allgather(
        np.asarray([payload.size], np.int64), tiled=True)
    buf = np.zeros(int(lengths.max()), np.uint8)
    buf[: payload.size] = payload
    gathered = multihost_utils.process_allgather(buf[None], tiled=False)
    gathered = np.asarray(gathered).reshape(jax.process_count(), -1)
    return [pickle.loads(gathered[r, : int(lengths[r])].tobytes())
            for r in range(jax.process_count())]


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_device_count() -> int:
    return jax.local_device_count()
