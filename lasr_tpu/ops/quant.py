"""Int8 quantized matmul for the MXU (AQT-style), and a Dense drop-in.

Why: TPU v5e's MXU runs int8×int8→int32 at 2x its bf16 FLOP rate
(394 vs 197 T(FL)OPS). The conformer recipe step's FLOPs are dominated
by the feed-forward GEMMs (320↔2048; the macaron block has two FFs per
layer), which the round-3 roofline prices at the single largest matmul
slice — so quantizing JUST the FF path attacks the one cost category
that is already at its bf16 attainable (BASELINE.md round-3 posture).

Scheme (symmetric, per-contraction-constant scales — the textbook
AQT recipe):

- forward  y = x@w:   x rows scaled over K (one f32 scale per row),
  w columns scaled over K (one per output channel); int8 dot with int32
  accumulation; dequant `* sx * sw` fuses into the epilogue.
- backward dx = dy@wT: dy rows over N, w rows over N.
- backward dw = xT@dy: x columns over M, dy columns over M.
  (scales must be constant along the contracted axis to factor out of
  the sum — each of the three GEMMs therefore re-quantizes its operands
  along its own contraction.)
- straight-through estimator: the vjp differentiates the *unquantized*
  map (round/clip treated as identity), the standard QAT gradient.
- master weights stay f32 in the param tree (``QuantDense`` has the
  same {kernel, bias} tree as ``nn.Dense``, so checkpoints interop both
  ways); quantization is transient per step.

``bwd_int8=False`` computes exact bf16/f32 gradients from the master
tensors (fwd-only quantization — safest, forfeits the bwd 2/3 of the
MXU win); ``True`` quantizes all three GEMMs.

This is an OPT-IN training/serving mode (``encoder_ff_int8`` on the
conformer model): the reference has no int8 path at all
(/root/reference/lasr/modules/net/transformer/positionwise_feed_forward.py
runs plain fp32 Linear), so this is a beyond-reference TPU feature and
ships gated by loss-trajectory and WER A/Bs (tools/probe_ff_int8.py),
not by default.
"""

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def absmax_scale(x, axis):
    """Symmetric per-slice scale: max|x| along ``axis`` mapped to 127."""
    m = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    return jnp.maximum(m, 1e-8) / 127.0


def quantize_int8(x, scale):
    """Round-to-nearest-even int8 with symmetric clip at ±127."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                    -127, 127).astype(jnp.int8)


def _int8_dot(a2, sa, b2, sb):
    """(M,K)x(K,N) int8 dot with int32 accumulation, dequantized.

    ``sa`` is (M,1) (constant over K per row), ``sb`` (1,N) (constant
    over K per column); both factor exactly out of the K-sum.
    """
    y = lax.dot(quantize_int8(a2, sa), quantize_int8(b2, sb),
                preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * sa * sb


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def int8_matmul(x, w, bwd_int8: bool = True):
    """``x @ w`` with int8 MXU arithmetic; STE gradients.

    x: (..., K) any leading shape; w: (K, N). Returns f32 (callers cast).
    """
    y, _ = _int8_matmul_fwd(x, w, bwd_int8)
    return y


def _int8_matmul_fwd(x, w, bwd_int8):
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    sx = absmax_scale(x2, 1)
    sw = absmax_scale(w, 0)
    y = _int8_dot(x2, sx, w, sw)
    return y.reshape(*lead, w.shape[1]), (x, w)


def _int8_matmul_bwd(bwd_int8, res, g):
    x, w = res
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    g2 = g.reshape(-1, g.shape[-1]).astype(jnp.float32)
    wf = w.astype(jnp.float32)
    if bwd_int8:
        # dx = g @ w.T (contract N): g rows over N, w.T columns == w rows
        wt = wf.T
        dx = _int8_dot(g2, absmax_scale(g2, 1), wt, absmax_scale(wt, 0))
        # dw = x.T @ g (contract M): x.T rows == x columns over M
        xt = x2.T
        dw = _int8_dot(xt, absmax_scale(xt, 1), g2, absmax_scale(g2, 0))
    else:
        dx = g2 @ wf.T
        dw = x2.T @ g2
    return dx.reshape(*lead, x.shape[-1]).astype(x.dtype), dw.astype(w.dtype)


int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


class QuantDense(nn.Module):
    """``nn.Dense`` drop-in with an int8-MXU matmul.

    Identical param tree (f32 master ``kernel``/``bias``, same
    initializers), so checkpoints move freely between QuantDense and
    nn.Dense builds of the same model. Callers pass ``name="Dense_k"``
    when swapping an auto-named inline nn.Dense so the flax path is
    preserved too.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    bwd_int8: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32)
        y = int8_matmul(x, kernel, self.bwd_int8).astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y
