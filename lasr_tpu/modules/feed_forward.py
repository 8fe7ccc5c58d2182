"""Position-wise feed-forward variants (Flax).

Ports of ``positionwise_feed_forward.py`` and ``multi_layer_conv.py``:
linear FFN, FastSpeech-style two-conv FFN, and conv+linear hybrid.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn


class PositionwiseFeedForward(nn.Module):
    idim: int
    hidden_units: int
    dropout_rate: float = 0.1
    activation: Callable = nn.relu
    # int8 MXU path for both GEMMs (ops/quant.py) — same param tree and
    # flax paths (explicit name="Dense_k"), so checkpoints interop with
    # the bf16 build; opt-in, gated by tools/probe_ff_int8.py A/Bs
    int8: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.int8:
            from lasr_tpu.ops.quant import QuantDense
            dense = lambda feats, name: QuantDense(  # noqa: E731
                feats, dtype=self.dtype, name=name)
        else:
            dense = lambda feats, name: nn.Dense(  # noqa: E731
                feats, dtype=self.dtype, name=name)
        h = dense(self.hidden_units, "Dense_0")(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return dense(self.idim, "Dense_1")(h)


def _conv1d(matmul_form: bool, features: int, kernel_size: int, pad: int,
            dtype, name=None):
    """nn.Conv, or its tap-matmul twin when the caller sits inside a
    pipeline stage whose vmapped dim is sharded (see modules/convops.py —
    the SPMD partitioner miscompiles lax.conv there).  Param trees are
    identical either way."""
    if matmul_form:
        from lasr_tpu.modules.convops import TapConv1d
        return TapConv1d(features, kernel_size, padding=[(pad, pad)],
                         dtype=dtype, name=name)
    return nn.Conv(features, (kernel_size,), padding=[(pad, pad)],
                   dtype=dtype, name=name)


class MultiLayeredConv1d(nn.Module):
    """Two SAME-padded 1-D convs with ReLU (multi_layer_conv.py:12-61)."""

    idim: int
    hidden_units: int
    kernel_size: int = 1
    dropout_rate: float = 0.1
    matmul_form: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        pad = (self.kernel_size - 1) // 2
        # explicit nn.Conv-style names: flax auto-naming is by class, so
        # TapConv1d would otherwise land under TapConv1d_0 and break the
        # param-tree compatibility between the two forms
        h = _conv1d(self.matmul_form, self.hidden_units, self.kernel_size,
                    pad, self.dtype, name="Conv_0")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return _conv1d(self.matmul_form, self.idim, self.kernel_size,
                       pad, self.dtype, name="Conv_1")(h)


class Conv1dLinear(nn.Module):
    """Conv1d then linear (multi_layer_conv.py:64-105)."""

    idim: int
    hidden_units: int
    kernel_size: int = 1
    dropout_rate: float = 0.1
    matmul_form: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        pad = (self.kernel_size - 1) // 2
        h = _conv1d(self.matmul_form, self.hidden_units, self.kernel_size,
                    pad, self.dtype, name="Conv_0")(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate)(h, deterministic=deterministic)
        return nn.Dense(self.idim, dtype=self.dtype)(h)
