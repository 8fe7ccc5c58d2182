"""Tensor-parallel and FSDP parameter partitioning over the mesh.

The reference has data parallelism only (SURVEY.md §2.8); this module is the
scale-out path for the stretch 1B-param config (BASELINE.json configs[4]):
Megatron-style sharding specs per parameter, applied as NamedShardings so
XLA's SPMD partitioner runs the attention/FFN matmuls model-parallel and
inserts the ICI collectives.

Tensor-parallel rules (path-suffix matched, biases/norms replicated):
  - attention q/k/v projections: kernel (d, d) → P(None, 'model')   (col)
  - attention out projection:    kernel (d, d) → P('model', None)   (row)
  - FFN Dense_0 (d → 4d):        P(None, 'model')                   (col)
  - FFN Dense_1 (4d → d):        P('model', None)                   (row)
  - token embedding (V, d):      P('model', None)    (vocab-sharded)
  - decoder output / CTC head (d, V): P(None, 'model')
  - everything else: replicated P()

FSDP (``fsdp=True``): additionally shards every ≥2-D leaf's first
still-unsharded divisible dim over the ``data`` axis — the ZeRO pattern:
parameters, gradients, optimizer moments and the MultiSteps grad
accumulator (all ``zeros_like``-inherited) each live 1/dp-sharded in HBM,
and XLA's SPMD partitioner inserts the weight all-gathers at use and
reduce-scatters on the gradients over ICI.  Per-leaf sharding means no
stage graph and no layout change for checkpoints (orbax saves/restores by
global shape; ``average_checkpoints`` already restores topology-free).
"""

from __future__ import annotations

from typing import Tuple

import jax
from flax.traverse_util import flatten_dict, unflatten_dict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_COL = ("linear_q/kernel", "linear_k/kernel", "linear_v/kernel",
        "linear_pos/kernel", "feed_forward/Dense_0/kernel",
        "feed_forward_macaron/Dense_0/kernel",
        "output_layer/kernel", "ctc/Dense_0/kernel")
_ROW = ("linear_out/kernel", "feed_forward/Dense_1/kernel",
        "feed_forward_macaron/Dense_1/kernel")
_VOCAB = ("embed_tok/embedding",)


def param_spec(path: Tuple[str, ...], leaf) -> P:
    joined = "/".join(path)
    if leaf.ndim < 2:
        return P()
    # right-align on the trailing (in, out) dims: scan_layers / pipeline
    # stacking prepends [num_blocks] / [stages, layers_per_stage] axes
    lead = (None,) * (leaf.ndim - 2)
    for suffix in _COL:
        if joined.endswith(suffix):
            return P(*lead, None, "model")
    for suffix in _ROW:
        if joined.endswith(suffix):
            return P(*lead, "model", None)
    for suffix in _VOCAB:
        if joined.endswith(suffix):
            return P(*lead, "model", None)
    return P()


# FSDP leaves smaller than this stay replicated: sharding a 10k-element
# depthwise-conv kernel saves nothing and forces the SPMD partitioner into
# awkward reshardings around the conv halo exchanges; the memory lives in
# the FFN/attention/embedding matrices, which are all far above this.
FSDP_MIN_SIZE = 32768


def _leaf_spec(path: Tuple[str, ...], leaf, mesh: Mesh,
               tp: bool, fsdp: bool, fsdp_min_size: int) -> P:
    """Resolved per-leaf PartitionSpec: pipeline stage axis (dim 0 under a
    ``pipe_stages`` path), TP rules (divisibility-checked), then the FSDP
    'data' dim on the first still-free divisible dim."""
    model_size = mesh.shape.get("model", 1)
    spec = param_spec(path, leaf) if tp else P()
    for dim, axis in enumerate(spec):
        if axis == "model" and leaf.shape[dim] % model_size != 0:
            spec = P()
            break
    names = list(spec) + [None] * (leaf.ndim - len(spec))
    # pipeline-parallel stage placement is structural, not a TP option:
    # whenever the mesh has a pipe axis, stage-stacked leaves (marked by
    # the pipe_stages path component, modules/pipeline.py) split dim 0
    pipe_size = mesh.shape.get("pipe", 1)
    if pipe_size > 1 and "pipe_stages" in path and leaf.ndim >= 1 \
            and names[0] is None and leaf.shape[0] % pipe_size == 0:
        names[0] = "pipe"
    data_size = mesh.shape.get("data", 1)
    if fsdp and data_size > 1 and leaf.ndim >= 2 \
            and leaf.size >= fsdp_min_size:
        for dim in range(leaf.ndim):
            if names[dim] is None and leaf.shape[dim] % data_size == 0:
                names[dim] = "data"
                break
    return P(*names)


def param_shardings(params, mesh: Mesh, tp: bool = True, fsdp: bool = False,
                    fsdp_min_size: int = FSDP_MIN_SIZE):
    """Tree of NamedShardings matching ``params`` (same treedef)."""
    flat = flatten_dict(params)
    out = {path: NamedSharding(mesh, _leaf_spec(path, leaf, mesh, tp, fsdp,
                                                fsdp_min_size))
           for path, leaf in flat.items()}
    return unflatten_dict(out)


def shard_params(params, mesh: Mesh, tp: bool = True, fsdp: bool = False,
                 fsdp_min_size: int = FSDP_MIN_SIZE):
    """device_put every param leaf with its TP/FSDP sharding over ``mesh``.

    Dimensions not divisible by the owning axis size fall back to
    replication (correctness first; pad-to-multiple is the perf follow-up).
    """
    return jax.tree.map(jax.device_put, params,
                        param_shardings(params, mesh, tp=tp, fsdp=fsdp,
                                        fsdp_min_size=fsdp_min_size))


def shard_state_params(state, mesh: Mesh, tp: bool = True,
                       fsdp: bool = False,
                       fsdp_min_size: int = FSDP_MIN_SIZE):
    """Shard a TrainState's params (and EMA shadow) over the mesh;
    everything else replicates. Call before ``tx.init`` so optimizer moments
    inherit the placement."""
    new_params = shard_params(state.params, mesh, tp=tp, fsdp=fsdp,
                              fsdp_min_size=fsdp_min_size)
    new_ema = None
    if state.ema is not None:
        new_ema = dict(state.ema)
        new_ema["shadow"] = shard_params(state.ema["shadow"], mesh,
                                         tp=tp, fsdp=fsdp,
                                         fsdp_min_size=fsdp_min_size)
    return state.replace(params=new_params, ema=new_ema)
