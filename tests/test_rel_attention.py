"""Fused rel-pos attention kernel: interpret-mode parity vs XLA reference
and vs the RelPositionMultiHeadedAttention module math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lasr_tpu.ops.rel_attention import (
    _rel_attention_pallas, _xla_reference, rel_attention_context)


def _case(B=2, H=2, T=150, dk=40, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    BH = B * H
    q_u = jnp.asarray(rng.standard_normal((BH, T, dk)), dtype)
    q_v = jnp.asarray(rng.standard_normal((BH, T, dk)), dtype)
    k = jnp.asarray(rng.standard_normal((BH, T, dk)), dtype)
    v = jnp.asarray(rng.standard_normal((BH, T, dk)), dtype)
    p = jnp.asarray(rng.standard_normal((H, 2 * T - 1, dk)), dtype)
    lens = rng.integers(T // 2, T + 1, size=B)
    kv_len = jnp.asarray(np.repeat(lens, H), jnp.int32)
    return q_u, q_v, k, v, p, kv_len


def test_kernel_matches_xla_reference_interpret():
    args = _case()
    want = np.asarray(_xla_reference(*args))
    got, lse = _rel_attention_pallas(*args, H=2, interpret=True)
    got = np.asarray(got)
    kv = np.asarray(args[5])
    T = want.shape[1]
    for bh in range(want.shape[0]):
        np.testing.assert_allclose(got[bh], want[bh], atol=2e-5)
    assert np.all(np.isfinite(np.asarray(lse[:, :T])))


def test_kernel_matches_module_math_interpret():
    """The kernel must reproduce RelPositionMultiHeadedAttention exactly
    (same weights, same mask)."""
    from lasr_tpu.modules.attention import RelPositionMultiHeadedAttention
    B, H, T, D = 2, 2, 90, 32
    dk = D // H
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((1, 2 * T - 1, D)), jnp.float32)
    kv_len = jnp.asarray([T, T - 17], jnp.int32)
    mask = (jnp.arange(T)[None, None, :] <
            kv_len[:, None, None])                    # (B, 1, T)

    mha = RelPositionMultiHeadedAttention(n_head=H, n_feat=D)
    params = mha.init(jax.random.PRNGKey(0), x, x, x, pos, mask)
    want = np.asarray(mha.apply(params, x, x, x, pos, mask))

    # build kernel inputs from the same projections
    pp = params["params"]
    def dense(name, y):
        return y @ pp[name]["kernel"] + pp[name]["bias"]
    q = dense("linear_q", x).reshape(B, T, H, dk)
    kk = dense("linear_k", x).reshape(B, T, H, dk)
    vv = dense("linear_v", x).reshape(B, T, H, dk)
    p_proj = (pos[0] @ pp["linear_pos"]["kernel"]).reshape(2 * T - 1, H, dk)
    q_u = q + pp["pos_bias_u"][None, None]
    q_v = q + pp["pos_bias_v"][None, None]

    def bh(y):  # (B,T,H,dk) → (B*H, T, dk)
        return jnp.moveaxis(y, 2, 1).reshape(B * H, T, dk)

    ctx, _ = _rel_attention_pallas(
        bh(q_u), bh(q_v), bh(kk), bh(vv),
        jnp.moveaxis(p_proj, 1, 0), jnp.repeat(kv_len, H),
        H=H, interpret=True)
    ctx = np.asarray(ctx).reshape(B, H, T, dk)
    ctx = np.moveaxis(ctx, 1, 2).reshape(B, T, D)
    out = ctx @ np.asarray(pp["linear_out"]["kernel"]) + \
        np.asarray(pp["linear_out"]["bias"])
    # compare valid query rows (padded rows attend over masked keys
    # identically in both, but module output is defined everywhere)
    np.testing.assert_allclose(out, want, atol=3e-5)


def test_custom_vjp_grads_finite():
    args = _case(B=1, H=2, T=70, dk=16, seed=2)

    def loss(q_u, q_v, k, v, p):
        # interpret path via the pallas fn is exercised above; for grad we
        # only check the custom_vjp wiring using the XLA bwd
        out = _xla_reference(q_u, q_v, k, v, p, args[5])
        return (out.astype(jnp.float32) ** 2).sum()

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*args[:5])
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


def test_bwd_kernel_matches_xla_grads_interpret():
    from lasr_tpu.ops.rel_attention import (
        _rel_attention_pallas, _rel_attention_pallas_bwd)
    args = _case(B=2, H=2, T=100, dk=24, seed=3)
    q_u, q_v, k, v, p, kv_len = args

    def loss(q_u, q_v, k, v, p):
        out = _xla_reference(q_u, q_v, k, v, p, kv_len)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    want = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q_u, q_v, k, v, p)

    out, lse = _rel_attention_pallas(*args, H=2, interpret=True)
    g = jnp.cos(out.astype(jnp.float32)).astype(out.dtype)
    got = _rel_attention_pallas_bwd(q_u, q_v, k, v, p, kv_len, out, lse, g,
                                    H=2, interpret=True)
    names = ("dq_u", "dq_v", "dk", "dv", "dp")
    for n, a, b in zip(names, got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4,
                                   err_msg=n)


def test_conformer_model_pallas_flag_matches_xla():
    """E2E_Conformer_CTC with encoder_use_pallas_attention=True must produce
    the same outputs as the XLA path (interpret mode on CPU)."""
    from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC

    kw = dict(idim=20, odim=9,
              encoder_attention_dim=32, encoder_attention_heads=2,
              encoder_linear_units=64, encoder_num_blocks=2,
              decoder_attention_dim=32, decoder_attention_heads=2,
              decoder_linear_units=64, decoder_num_block=1,
              encoder_pos_enc_layer_type="rel_pos",
              encoder_selfattention_layer_type="rel_selfattn",
              encoder_cnn_kernel=7,
              encoder_dropout_rate=0.0, decoder_dropout_rate=0.0,
              ctc_dropout=0.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 60, 20)), jnp.float32)
    xlen = jnp.asarray([60, 41], jnp.int32)
    ys = jnp.asarray(rng.integers(1, 9, (2, 4)))

    ref_model = E2E_Conformer_CTC(**kw)
    variables = ref_model.init(jax.random.PRNGKey(0), x, xlen, ys)
    want = ref_model.apply(variables, x, xlen, ys)

    pl_model = E2E_Conformer_CTC(**kw, encoder_use_pallas_attention=True)
    got = pl_model.apply(variables, x, xlen, ys)  # CPU → auto-interpret
    np.testing.assert_allclose(np.asarray(got["att_out"]),
                               np.asarray(want["att_out"]), atol=2e-4)
    n = int(want["hs_len"][1])
    np.testing.assert_allclose(np.asarray(got["ctc_out"][1, :n]),
                               np.asarray(want["ctc_out"][1, :n]), atol=2e-4)

    # and gradients flow through the kernel path
    def loss(p):
        out = pl_model.apply({"params": p,
                              "batch_stats": variables["batch_stats"]},
                             x, xlen, ys)
        return (out["att_out"].astype(jnp.float32) ** 2).sum()
    g = jax.grad(loss)(variables["params"])
    leaf = g["encoder"]["layers_0"]["self_attn"]["linear_pos"]["kernel"]
    assert np.all(np.isfinite(np.asarray(leaf)))
    assert float(np.abs(np.asarray(leaf)).sum()) > 0
