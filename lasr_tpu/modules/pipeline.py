"""GPipe-style pipeline parallelism over a homogeneous encoder stack.

Beyond-reference scale-out (the reference is DP-only, SURVEY.md §2.8): the
stretch-config story already has TP ('model' axis), sequence parallelism
('seq') and FSDP (ZeRO over 'data'); this module adds the 'pipe' mesh axis.

TPU-native formulation — no per-stage processes, no send/recv framework:
the schedule is expressed as SPMD array programs and XLA's partitioner
lowers it to ICI collectives (the "pipelining via vmap" recipe):

  * the N identical blocks are stacked [stages, layers_per_stage, ...] —
    an ``nn.vmap`` over stages of an ``nn.scan`` over the layers within a
    stage.  Sharding the leading stage axis over the mesh 'pipe' axis
    (parallel/sharding.py matches the ``pipe_stages`` path marker) places
    each stage's weights on its own devices.
  * one pipeline *tick* runs every stage in parallel on its current
    microbatch (the vmap — compute batched over the stage dim, which is
    sharded, so each pipe group computes only its own stage), then shifts
    the buffer one stage down with ``jnp.roll`` on the stage axis — which
    XLA lowers to a CollectivePermute over ICI.  Stage 0's slot is
    refilled with the next microbatch.
  * the tick loop is a function-level ``nn.scan`` with broadcast params,
    so the whole schedule is one differentiable jitted program; gradients
    flow through the roll (its transpose is the reverse permute) and
    accumulate into the stage-sharded parameter gradients — the backward
    pipeline needs no separate machinery.

Schedule: microbatch k enters stage 0 at tick k and leaves stage P-1 at
tick k+P-1; M microbatches drain in M+P-1 ticks (bubble fraction
(P-1)/(M+P-1), the GPipe bound).  Warm-up/drain slots cycle the microbatch
stream (tick t feeds microbatch t mod M) rather than zeros so BatchNorm
running statistics never average padding garbage; train-mode OUTPUTS are
unaffected (BN normalizes with current-microbatch statistics), the
running-stats EMA just sees M+P-1 instead of M updates per step — the
same per-shard flavor as the reference's sync_batchnorm=False
(train_lighting.py:207).

Numerics: each microbatch passes through all layers in order with the
same weights, so a pipelined forward equals the unpipelined forward run
per-microbatch (exactly — tests/test_pipeline.py), and equals the
full-batch forward wherever no cross-batch op intervenes (BatchNorm in
train mode is per-microbatch — the same effect gradient accumulation
already has in the reference).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct


class PipeState(struct.PyTreeNode):
    """Pipeline buffer pytree (leading dim = stages for the carry,
    = microbatches for the stream the carry is refilled from)."""
    x: jnp.ndarray                       # [P|M, mb, T, D] activations
    mask: Optional[jnp.ndarray] = None   # [P|M, mb, ...] attention mask
    czm: Optional[jnp.ndarray] = None    # [P|M, mb, T] conv zero mask
    tick: Optional[jnp.ndarray] = None   # scalar int32 (carry only)


def make_stage_stack(layer_cls, layer_kwargs: dict, num_layers: int,
                     stages: int, name: str = "pipe_stages"):
    """Stage-stacked layer module: vmap over stages of scan over the
    layers within a stage (params [stages, layers_per_stage, ...]).

    ``layer_cls`` is a scan-adapter module ``(carry, mask, pos_emb, czm,
    pos_table) -> (carry, ())`` with carry = (x, static deterministic) —
    e.g. conformer._ScanConformerLayer.  Call from a parent's setup();
    drive with :func:`run_pipeline`.
    """
    if num_layers % stages != 0:
        raise ValueError(f"pipeline: num_layers={num_layers} not divisible "
                         f"by stages={stages}")
    stage = nn.scan(
        layer_cls,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=(nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
        length=num_layers // stages,
        metadata_params={nn.PARTITION_NAME: "layers"})
    vstage = nn.vmap(
        stage,
        variable_axes={"params": 0, "batch_stats": 0},
        split_rngs={"params": True, "dropout": True},
        # (carry, mask, pos_emb, czm, pos_table): pos_emb/pos_table are
        # shared tables (no batch dim) — broadcast; mask/czm ride the
        # buffer.  A None arg has no leaves, so its spec is vacuous.
        in_axes=(0, 0, None, 0, None),
        metadata_params={nn.PARTITION_NAME: "pipe_stages"})
    return vstage(name=name, **layer_kwargs)


def pipeline_variables_from_scan(variables, stages: int,
                                 scan_name: str = "layers",
                                 pipe_name: str = "pipe_stages"):
    """Reshape a scan_layers variable tree into the pipeline's layout.

    scan_layers stacks block leaves [num_blocks, ...] under a ``layers``
    component; the pipeline stacks [stages, num_blocks/stages, ...] under
    ``pipe_stages`` — stage p holds blocks p·Lps … (p+1)·Lps−1, exactly a
    leading-dim reshape.  Converts params AND batch_stats; use for
    topology-converting checkpoint loads and parity tests.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict
    out = {}
    for path, leaf in flatten_dict(variables).items():
        path = list(path)
        if scan_name in path:
            i = path.index(scan_name)
            path[i] = pipe_name
            if leaf.shape[0] % stages != 0:
                raise ValueError(f"{'/'.join(path)}: leading dim "
                                 f"{leaf.shape[0]} not divisible by "
                                 f"stages={stages}")
            leaf = leaf.reshape(
                (stages, leaf.shape[0] // stages) + leaf.shape[1:])
        out[tuple(path)] = leaf
    return unflatten_dict(out)


def pick_microbatches(batch: int, requested: int) -> int:
    """Largest divisor of ``batch`` <= ``requested`` (static per bucket
    shape; a 1-row decode degenerates to sequential stage execution)."""
    m = max(1, min(requested, batch))
    while batch % m != 0:
        m -= 1
    return m


def run_pipeline(mdl, stack_attr: str, carry_cls, h, mask, czm, pos_emb,
                 pos_table, stages: int, microbatches: int,
                 deterministic: bool, buf_sharding=None):
    """Drive the GPipe tick schedule over (B, T, D) activations.

    ``mdl``: the parent module (inside whose setup ``make_stage_stack``
    created the submodule named by ``stack_attr``); the tick loop is a
    function-level nn.scan so its length (M + P - 1) can follow the
    call-time batch size.  ``microbatches`` is clamped to a divisor of B.
    Extra activation cost vs unpipelined: the emit buffer holds
    B·(1 + (P-1)/M) rows.
    """
    B = h.shape[0]
    M = pick_microbatches(B, microbatches)
    mb = B // M

    def split(a):
        return None if a is None else a.reshape((M, mb) + a.shape[1:])

    stream = PipeState(x=split(h), mask=split(mask), czm=split(czm))
    zeros = lambda a: None if a is None else \
        jnp.zeros((stages,) + a.shape[1:], a.dtype)
    state = PipeState(x=zeros(stream.x), mask=zeros(stream.mask),
                      czm=zeros(stream.czm),
                      tick=jnp.zeros((), jnp.int32))

    def constrain(a):
        if buf_sharding is None:
            return a
        from lasr_tpu.parallel.mesh import constrain_divisible
        return constrain_divisible(a, buf_sharding)

    def tick(m, state, _):
        t = state.tick
        idx = jax.lax.rem(t, jnp.int32(M))
        take = lambda a: jax.lax.dynamic_index_in_dim(a, idx, 0,
                                                      keepdims=False)
        buf_x = constrain(state.x.at[0].set(take(stream.x)))
        buf_mask = None if stream.mask is None \
            else state.mask.at[0].set(take(stream.mask))
        buf_czm = None if stream.czm is None \
            else state.czm.at[0].set(take(stream.czm))

        carry, _ = getattr(m, stack_attr)(
            carry_cls(buf_x, deterministic), buf_mask, pos_emb, buf_czm,
            pos_table)
        out_x = constrain(carry.x)
        emit = out_x[-1]                   # last stage's finished mb
        # shift every slot one stage down (stage i feeds stage i+1);
        # slot 0 is dead until the next refill
        roll = lambda a: None if a is None else jnp.roll(a, 1, axis=0)
        new = PipeState(x=roll(out_x), mask=roll(buf_mask),
                        czm=roll(buf_czm), tick=t + 1)
        return new, emit

    if mdl.is_initializing():
        # variables cannot be created inside a variable_carry scan: run a
        # single tick directly (creates every param / BN stat — all ticks
        # share them) and fabricate the output shape for downstream init
        _, e = tick(mdl, state, None)
        return jnp.broadcast_to(e[None], (M,) + e.shape) \
            .reshape((B,) + e.shape[1:])
    n_ticks = M + stages - 1
    # batch_stats: carried (threaded tick-to-tick) when mutable (train
    # step under mutable=['batch_stats']), broadcast when frozen (eval)
    if mdl.is_mutable_collection("batch_stats"):
        var_kwargs = dict(variable_broadcast="params",
                          variable_carry="batch_stats")
    else:
        var_kwargs = dict(variable_broadcast=("params", "batch_stats"))
    scan_fn = nn.scan(tick, length=n_ticks,
                      split_rngs={"params": False, "dropout": True},
                      **var_kwargs)
    _, emits = scan_fn(mdl, state, None)
    # tick P-1+k emitted microbatch k
    out = emits[stages - 1:]
    return out.reshape((B,) + out.shape[2:])
