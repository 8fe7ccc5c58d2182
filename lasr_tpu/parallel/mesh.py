"""Device mesh + sharding rules.

TPU-native replacement for the reference's Lightning-DDP/NCCL story
(SURVEY.md §2.8): a ``jax.sharding.Mesh`` over (data, model) axes; batches
shard on ``data``, parameters replicate (round-1 parity — the reference has
DP only) with the ``model`` axis held open for tensor-parallel partitioning
of the stretch 1B config.  Gradient all-reduce is inserted by XLA's SPMD
partitioner and rides ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None, seq: int = 1,
              pipe: int = 1) -> Mesh:
    """(data, pipe, seq, model) mesh.  ``seq`` and ``pipe`` (default 1 —
    no-op axes) hold sequence and pipeline parallelism for the stretch
    configs: encoder activations shard their time dim over ``seq`` (see
    ``seq_sharding`` and ConformerEncoderLayer.act_sharding); stage-stacked
    encoder blocks shard over ``pipe`` (modules/pipeline.py).  XLA's SPMD
    partitioner inserts the halo exchanges (conv), gathers (attention) and
    stage-shift collective-permutes over ICI."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // (model * seq * pipe)
    n = data * model * seq * pipe
    if n > len(devices):
        raise ValueError(f"mesh {data}x{pipe}x{seq}x{model} needs {n} "
                         f"devices, have {len(devices)}")
    if n <= 0:
        raise ValueError(
            f"mesh {data}x{pipe}x{seq}x{model} is empty — model*seq*pipe "
            f"({model * seq * pipe}) exceeds the {len(devices)} available "
            f"devices?")
    arr = np.asarray(devices[:n]).reshape(data, pipe, seq, model)
    return Mesh(arr, axis_names=("data", "pipe", "seq", "model"))


def pipe_sharding(mesh: Mesh) -> Optional[NamedSharding]:
    """[stages, mb, T, D] pipeline-buffer sharding: stages over 'pipe',
    microbatch rows over 'data'.  None when the mesh has no pipe axis."""
    if mesh.shape.get("pipe", 1) <= 1:
        return None
    return NamedSharding(mesh, P("pipe", "data"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def seq_sharding(mesh: Mesh) -> Optional[NamedSharding]:
    """(B, T, ...) activation sharding: batch over 'data', time over
    'seq'.  None when the mesh has no seq axis (or it is trivial)."""
    if mesh.shape.get("seq", 1) <= 1:
        return None
    return NamedSharding(mesh, P("data", "seq"))


def seq_axis_size(sharding: Optional[NamedSharding]) -> int:
    """Mesh extent of the sharding's dim-1 (time) axis; 1 if unsharded."""
    if sharding is None or len(sharding.spec) < 2 or sharding.spec[1] is None:
        return 1
    name = sharding.spec[1]
    if isinstance(name, tuple):
        n = 1
        for a in name:
            n *= sharding.mesh.shape[a]
        return n
    return sharding.mesh.shape[name]


def constrain_divisible(x, sharding: NamedSharding):
    """with_sharding_constraint, dropping per-dim axes the shape cannot
    honour (pjit requires divisibility; e.g. the 1-row init_state batch
    cannot shard 2-way on dim 0 — those dims replicate instead; encoders
    pad their time dim to a seq multiple so dim 1 never drops there)."""
    mesh = sharding.mesh
    names = list(sharding.spec) + [None] * (x.ndim - len(sharding.spec))

    def axis_size(name):
        if isinstance(name, tuple):
            n = 1
            for a in name:
                n *= mesh.shape[a]
            return n
        return mesh.shape[name]

    spec = P(*[(n if n is not None and x.shape[i] % axis_size(n) == 0
                else None) for i, n in enumerate(names)])
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_batch_leaf(v: np.ndarray, sh: NamedSharding):
    """Host batch array → mesh-sharded jax.Array.

    Single-process: a plain device_put.  Multi-process: each host holds a
    DIFFERENT local batch (scp order is sharded round-robin by host), so
    the global batch is assembled with make_array_from_process_local_data —
    host h's rows land on host h's devices and the global leading dim is
    the concatenation over hosts (every host's local shape must match,
    which dataset.batches() guarantees via cross-host shape agreement)."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sh, np.asarray(v))
    return jax.device_put(v, sh)


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put array leaves of a host batch with batch-dim sharding.

    Accepts numpy leaves AND jax.Array leaves: a leaf already committed to
    a single device (e.g. by an upstream prefetcher without the mesh
    sharding) is re-put with the data-axis NamedSharding rather than passed
    through, so data parallelism is never silently lost."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1:
            out[k] = put_batch_leaf(v, sh)
        elif isinstance(v, jax.Array) and v.ndim >= 1:
            out[k] = v if v.sharding.is_equivalent_to(sh, v.ndim) \
                else jax.device_put(v, sh)
        else:
            out[k] = v
    return out
