"""Tensor-parallel parameter partitioning over the ``model`` mesh axis.

The reference has data parallelism only (SURVEY.md §2.8); this module is the
scale-out path for the stretch 1B-param config (BASELINE.json configs[4]):
Megatron-style sharding specs per parameter, applied as NamedShardings so
XLA's SPMD partitioner runs the attention/FFN matmuls model-parallel and
inserts the ICI collectives.

Rules (path-suffix matched, biases/norms replicated):
  - attention q/k/v projections: kernel (d, d) → P(None, 'model')   (col)
  - attention out projection:    kernel (d, d) → P('model', None)   (row)
  - FFN Dense_0 (d → 4d):        P(None, 'model')                   (col)
  - FFN Dense_1 (4d → d):        P('model', None)                   (row)
  - token embedding (V, d):      P('model', None)    (vocab-sharded)
  - decoder output / CTC head (d, V): P(None, 'model')
  - everything else: replicated P()
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
    for suffix in _COL:
        if joined.endswith(suffix):
            return P(None, "model")
    for suffix in _ROW:
        if joined.endswith(suffix):
            return P("model", None)
    for suffix in _VOCAB:
        if joined.endswith(suffix):
            return P("model", None)
    return P()


def shard_params(params, mesh: Mesh):
    """device_put every param leaf with its TP sharding over ``mesh``.

    Dimensions not divisible by the model-axis size fall back to
    replication (correctness first; pad-to-multiple is the perf follow-up).
    """
    model_size = mesh.shape.get("model", 1)
    flat = flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        spec = param_spec(path, leaf)
        for dim, axis in enumerate(spec):
            if axis == "model" and leaf.shape[dim] % model_size != 0:
                spec = P()
                break
        out[path] = jax.device_put(leaf, NamedSharding(mesh, spec))
    return unflatten_dict(out)


def shard_state_params(state, mesh: Mesh):
    """Shard a TrainState's params (and EMA shadow) over the model axis;
    everything else replicates. Call before ``tx.init`` so optimizer moments
    inherit the placement."""
    new_params = shard_params(state.params, mesh)
    new_ema = None
    if state.ema is not None:
        new_ema = dict(state.ema)
        new_ema["shadow"] = shard_params(state.ema["shadow"], mesh)
    return state.replace(params=new_params, ema=new_ema)
