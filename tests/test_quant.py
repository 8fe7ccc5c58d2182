"""Int8 MXU matmul (lasr_tpu/ops/quant.py): quantization error bounds,
gradient contracts (exact bf16 grads when bwd_int8=False; bounded-error
STE grads when True), nn.Dense param-tree interop, and the ff_int8
plumbing through the conformer encoder (checkpoint-compatible trees,
trainable loss).

Beyond-reference feature: the reference FF is plain fp32 Linear
(/root/reference/lasr/modules/net/transformer/
positionwise_feed_forward.py:12-35); int8 is an opt-in TPU MXU mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from lasr_tpu.ops.quant import (QuantDense, absmax_scale, int8_matmul,
                                quantize_int8)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    s = absmax_scale(x, 1)
    xq = quantize_int8(x, s).astype(jnp.float32) * s
    # symmetric RTNE: per-element error <= scale/2
    assert float(jnp.max(jnp.abs(xq - x) / s)) <= 0.5 + 1e-6


@pytest.mark.parametrize("shape", [(32, 64, 48), (128, 96)])
def test_int8_matmul_close_to_f32(shape):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((shape[-1], 80)), jnp.float32)
    y = int8_matmul(x, w)
    ref = x @ w
    # K-sum of two ~N(0, (s/2)^2) rounding errors: relative error well
    # under 2% at these sizes
    rel = float(jnp.linalg.norm(y - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_grads_exact_when_bwd_f32():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 24)), jnp.float32)
    co = jnp.asarray(rng.standard_normal((16, 24)), jnp.float32)
    # STE with f32 bwd: grads computed from the MASTER tensors — equal
    # to plain-matmul grads exactly
    gx, gw = jax.grad(
        lambda x, w: jnp.sum(int8_matmul(x, w, False) * co), (0, 1))(x, w)
    rx, rw = jax.grad(lambda x, w: jnp.sum((x @ w) * co), (0, 1))(x, w)
    assert jnp.allclose(gx, rx, atol=1e-5) and jnp.allclose(gw, rw, atol=1e-5)


def test_grads_bounded_when_bwd_int8():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((96, 48)), jnp.float32)
    co = jnp.asarray(rng.standard_normal((64, 48)), jnp.float32)
    gx, gw = jax.grad(
        lambda x, w: jnp.sum(int8_matmul(x, w, True) * co), (0, 1))(x, w)
    rx, rw = jax.grad(lambda x, w: jnp.sum((x @ w) * co), (0, 1))(x, w)
    for g, r in ((gx, rx), (gw, rw)):
        rel = float(jnp.linalg.norm(g - r) / jnp.linalg.norm(r))
        assert rel < 0.02, rel


def test_quantdense_tree_matches_dense_and_interop():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((8, 40)), jnp.float32)
    vd = nn.Dense(24).init(jax.random.PRNGKey(0), x)
    vq = QuantDense(24).init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(vd) == jax.tree.structure(vq)
    assert all(a.shape == b.shape and a.dtype == b.dtype for a, b in zip(
        jax.tree.leaves(vd), jax.tree.leaves(vq)))
    # a Dense checkpoint loads into QuantDense: outputs agree to quant err
    yd = nn.Dense(24).apply(vd, x)
    yq = QuantDense(24).apply(vd, x)
    rel = float(jnp.linalg.norm(yq - yd) / jnp.linalg.norm(yd))
    assert rel < 0.02, rel


def _tiny_conformer(ff_int8):
    from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC
    return E2E_Conformer_CTC(
        idim=8, odim=11, encoder_attention_dim=16,
        encoder_attention_heads=2, encoder_linear_units=32,
        encoder_num_blocks=2, decoder_attention_dim=16,
        decoder_attention_heads=2, decoder_linear_units=32,
        decoder_num_block=1, encoder_pos_enc_layer_type="rel_pos",
        encoder_selfattention_layer_type="rel_selfattn",
        encoder_cnn_kernel=7, encoder_ff_int8=ff_int8)


def test_ff_int8_conformer_checkpoint_compatible_and_trains():
    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.standard_normal((2, 37, 8)), jnp.float32)
    feat_len = jnp.asarray([37, 30], jnp.int32)
    ys = jnp.asarray(rng.integers(3, 11, (2, 5)))

    m8, mf = _tiny_conformer(True), _tiny_conformer(False)
    v8 = m8.init(jax.random.PRNGKey(0), feats, feat_len, ys)
    vf = mf.init(jax.random.PRNGKey(0), feats, feat_len, ys)
    assert jax.tree.structure(v8) == jax.tree.structure(vf)

    # bf16-trained params load into the int8 build; encoder outputs agree
    # to quantization error
    def enc_sum(model, variables):
        out = model.apply(variables, feats, feat_len, ys,
                          mutable=["batch_stats"])[0]
        return out

    o8 = enc_sum(m8, vf)
    of = enc_sum(mf, vf)
    for a, b in zip(jax.tree.leaves(o8), jax.tree.leaves(of)):
        if a.size and jnp.issubdtype(a.dtype, jnp.floating):
            denom = float(jnp.linalg.norm(b.astype(jnp.float32))) or 1.0
            rel = float(jnp.linalg.norm(
                (a - b).astype(jnp.float32))) / denom
            assert rel < 0.2, rel

    # gradients flow through every param (training viability)
    def loss(params):
        out = m8.apply({**vf, "params": params}, feats, feat_len, ys,
                       mutable=["batch_stats"],
                       rngs={"dropout": jax.random.PRNGKey(1)},
                       deterministic=False)[0]
        leaves = [x for x in jax.tree.leaves(out)
                  if jnp.issubdtype(x.dtype, jnp.floating)]
        return sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                   for x in leaves)

    grads = jax.grad(loss)(vf["params"])
    gnorms = [float(jnp.linalg.norm(g.astype(jnp.float32)))
              for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(gnorms))
    # the FF kernels specifically must receive nonzero grads
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    ff = [float(jnp.linalg.norm(g.astype(jnp.float32)))
          for path, g in flat
          if "feed_forward" in jax.tree_util.keystr(path)]
    assert ff and all(n > 0 for n in ff)
