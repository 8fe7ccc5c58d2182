"""1-D convolution expressed as tap-wise matmul/FMA accumulation.

Exists for one reason: XLA's SPMD partitioner miscompiles a convolution
whose vmapped (batched) dimension is sharded inside the pipeline tick
scan — `lax.scan` over ticks of `vmap` over stages of a conv, with the
stage dim sharded over the mesh 'pipe' axis, returns values ~O(1) wrong
while the identical program with `dot_general` in place of the conv is
bit-exact (minimal repro: tools/spmd_conv_repro.py; observed on jax 0.9.0
CPU SPMD).  The pipelined conformer stack (modules/pipeline.py) therefore
routes every in-stack conv through this formulation; `dot_general`
partitions correctly under every sharding we use.

Cost note: a stride-1 length-K conv IS K shifted matmuls (dense) or K
shifted elementwise FMAs (depthwise) — same FLOPs and, after XLA fusion,
the same HBM traffic; on TPU the depthwise conv is VPU work in either
formulation.  The non-pipelined paths keep `nn.Conv` so the single-chip
production program is unchanged.

`TapConv1d` is drop-in param-compatible with `flax.linen.Conv`: identical
param names (kernel/bias), shapes ((K, Cin//groups, Cout), (Cout,)) and
initializers, so checkpoints trained either way are interchangeable and
pipeline_variables_from_scan conversions keep working.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn


class TapConv1d(nn.Module):
    """`nn.Conv`-compatible stride-1 1-D conv as tap-wise accumulation.

    Supports feature_group_count in {1, Cin with features == Cin}
    (dense and depthwise) — the two forms the conformer stack uses.
    """
    features: int
    kernel_size: Union[int, Sequence[int]]
    padding: Union[Tuple[int, int], Sequence[Tuple[int, int]]] = (0, 0)
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        K = self.kernel_size
        if not isinstance(K, int):
            (K,) = K
        pad = self.padding
        if pad and not isinstance(pad[0], int):
            (pad,) = pad
        lo, hi = pad
        cin = x.shape[-1]
        groups = self.feature_group_count
        depthwise = groups > 1
        if depthwise and not (groups == cin == self.features):
            raise NotImplementedError(
                f"TapConv1d: feature_group_count={groups} with cin={cin}, "
                f"features={self.features} (dense or depthwise only)")
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (K, cin // groups, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), self.param_dtype) \
            if self.use_bias else None
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias,
                                                  dtype=self.dtype)
        if lo or hi:
            x = jnp.pad(x, ((0, 0),) * (x.ndim - 2) + ((lo, hi), (0, 0)))
        t_out = x.shape[-2] - (K - 1)
        y = None
        for k in range(K):
            xs = x[..., k:k + t_out, :]
            if depthwise:
                term = xs * kernel[k, 0]
            else:
                term = jnp.einsum("...tc,co->...to", xs, kernel[k])
            y = term if y is None else y + term
        if bias is not None:
            y = y + bias
        return y
