"""Fused rotated-fold attention kernel: interpret-mode parity vs the XLA
reference, gradient parity vs autodiff, and in-model parity vs the
rotated-fold XLA path (same weights, same mask)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lasr_tpu.ops.rot_attention import (
    _rot_attention_pallas, _xla_reference, rot_attention_context)


def _case(B=2, H=2, T=150, dk=40, M=64, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    BH = B * H
    q_u = jnp.asarray(rng.standard_normal((BH, T, dk)), dtype)
    u = jnp.asarray(rng.standard_normal((BH, T, M)) * 0.3, dtype)
    k = jnp.asarray(rng.standard_normal((BH, T, dk)), dtype)
    v = jnp.asarray(rng.standard_normal((BH, T, dk)), dtype)
    vt = jnp.asarray(rng.standard_normal((T, M)) * 0.3, dtype)
    lens = rng.integers(T // 2, T + 1, size=B)
    kv_len = jnp.asarray(np.repeat(lens, H), jnp.int32)
    return q_u, u, k, v, vt, kv_len


def test_rot_kernel_matches_xla_reference_interpret():
    args = _case()
    want = np.asarray(_xla_reference(*args))
    got, lse = _rot_attention_pallas(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)
    T = want.shape[1]
    assert np.all(np.isfinite(np.asarray(lse[:, :T])))


def test_rot_kernel_backward_matches_autodiff_interpret():
    q_u, u, k, v, vt, kv_len = _case(T=100, M=48, seed=3)
    g = jnp.asarray(np.random.default_rng(9).standard_normal(q_u.shape),
                    q_u.dtype)

    def via_kernel(q_u, u, k, v):
        return jnp.vdot(rot_attention_context(q_u, u, k, v, vt, kv_len), g)

    def via_xla(q_u, u, k, v):
        return jnp.vdot(_xla_reference(q_u, u, k, v, vt, kv_len), g)

    got = jax.grad(via_kernel, argnums=(0, 1, 2, 3))(q_u, u, k, v)
    want = jax.grad(via_xla, argnums=(0, 1, 2, 3))(q_u, u, k, v)
    for name, a, b in zip(("dq_u", "du", "dk", "dv"), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, err_msg=name)


@pytest.mark.parametrize("deterministic", [True, False])
def test_rot_fold_pallas_matches_xla_fold_in_model(deterministic):
    """RelPositionMultiHeadedAttention with rot_fold_pallas must equal the
    XLA rotated-fold path on identical weights — deterministic, and in
    training mode with attention dropout 0 (rotated positional dropout
    disabled here so both paths are deterministic in u)."""
    from lasr_tpu.modules.attention import RelPositionMultiHeadedAttention
    from lasr_tpu.modules.embedding import RelPositionalEncoding
    B, H, T, D = 2, 2, 90, 32
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    pe = RelPositionalEncoding(D, dropout_rate=0.0)
    pe_vars = pe.init(jax.random.PRNGKey(0), jnp.zeros((1, T, D)))
    _, pos = pe.apply(pe_vars, jnp.zeros((1, T, D)))
    kv_len = jnp.asarray([T, T - 17], jnp.int32)
    mask = (jnp.arange(T)[None, None, :] < kv_len[:, None, None])

    kw = dict(n_head=H, n_feat=D, dropout_rate=0.0, rot_fold=True,
              rot_fold_train=True)
    att_k = RelPositionMultiHeadedAttention(rot_fold_pallas=True, **kw)
    att_x = RelPositionMultiHeadedAttention(rot_fold_pallas=False, **kw)
    vars_ = att_x.init(jax.random.PRNGKey(2), x, x, x, pos, mask)
    got = att_k.apply(vars_, x, x, x, pos, mask,
                      deterministic=deterministic)
    want = att_x.apply(vars_, x, x, x, pos, mask,
                       deterministic=deterministic)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5)


def test_rot_fold_pallas_conformer_encoder_forward():
    """Encoder-level smoke: rot_fold_pallas on == off (deterministic),
    through subsampling, conv modules and padding masks."""
    from lasr_tpu.modules.conformer import ConformerEncoder
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 37, 12)), jnp.float32)
    lens = jnp.asarray([37, 20])
    outs = []
    for pallas in (False, True):
        enc = ConformerEncoder(
            idim=12, attention_dim=16, attention_heads=2, linear_units=32,
            num_blocks=2, dropout_rate=0.0, pos_enc_layer_type="rel_pos",
            selfattention_layer_type="rel_selfattn", use_cnn_module=True,
            cnn_module_kernel=7, rot_fold_pallas=pallas)
        vars_ = enc.init(jax.random.PRNGKey(1), x, lens)
        h, hl = enc.apply(vars_, x, lens, deterministic=True)
        outs.append(np.asarray(h))
    np.testing.assert_allclose(outs[0], outs[1], atol=3e-5)
