"""Model + loss tests: dict contract, shapes, label smoothing vs torch."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch

from lasr_tpu.models.e2e_ctc_att import E2E_Transformer_CTC, E2E_Conformer_CTC
from lasr_tpu.models.losses import (
    E2E_Loss, LabelSmoothingLoss, att_accuracy, ctc_greedy_cer)


def _tiny_transformer(odim=11):
    return E2E_Transformer_CTC(
        idim=20, odim=odim,
        encoder_attention_dim=16, encoder_attention_heads=2,
        encoder_linear_units=32, encoder_num_blocks=2,
        decoder_attention_dim=16, decoder_attention_heads=2,
        decoder_linear_units=32, decoder_num_block=2,
        encoder_dropout_rate=0.1, decoder_dropout_rate=0.1)


def _batch(B=2, T=45, D=20, L=6, odim=11, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, D)), dtype=jnp.float32)
    xlen = jnp.asarray([T, T - 10], dtype=jnp.int32)
    ys_in = jnp.asarray(rng.integers(1, odim, (B, L)))
    return x, xlen, ys_in


def test_e2e_transformer_forward_dict():
    model = _tiny_transformer()
    x, xlen, ys_in = _batch()
    vars_ = model.init(jax.random.PRNGKey(0), x, xlen, ys_in)
    out = model.apply(vars_, x, xlen, ys_in)
    assert set(out) == {"att_out", "ctc_out", "hs_len"}
    B, L = ys_in.shape
    assert out["att_out"].shape == (B, L, 11)
    assert out["ctc_out"].shape[0] == B and out["ctc_out"].shape[2] == 11
    assert out["ctc_out"].shape[1] >= int(out["hs_len"][0])


def test_e2e_transformer_train_mode_runs():
    model = _tiny_transformer()
    x, xlen, ys_in = _batch()
    vars_ = model.init(jax.random.PRNGKey(0), x, xlen, ys_in)
    out = model.apply(vars_, x, xlen, ys_in, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.all(np.isfinite(np.asarray(out["att_out"])))


def test_e2e_conformer_forward():
    model = E2E_Conformer_CTC(
        idim=20, odim=11,
        encoder_attention_dim=16, encoder_attention_heads=2,
        encoder_linear_units=32, encoder_num_blocks=2,
        decoder_attention_dim=16, decoder_attention_heads=2,
        decoder_linear_units=32, decoder_num_block=2,
        encoder_pos_enc_layer_type="rel_pos",
        encoder_selfattention_layer_type="rel_selfattn",
        encoder_cnn_kernel=7)
    x, xlen, ys_in = _batch()
    vars_ = model.init(jax.random.PRNGKey(0), x, xlen, ys_in)
    out, mutated = model.apply(vars_, x, xlen, ys_in, deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(1)},
                               mutable=["batch_stats"])
    assert out["att_out"].shape == (2, 6, 11)
    assert "batch_stats" in mutated


def test_label_smoothing_matches_torch():
    B, L, V = 3, 5, 7
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, L, V)).astype(np.float32)
    tgt = rng.integers(0, V, (B, L))
    tgt[1, 3:] = -1
    tgt[2, 1:] = -1

    got = float(LabelSmoothingLoss(V, -1, 0.1)(jnp.asarray(x), jnp.asarray(tgt)))

    # torch replica of the reference implementation (cross_entropy.py:55-97)
    tx = torch.from_numpy(x).view(-1, V)
    tt = torch.from_numpy(tgt).view(-1)
    true_dist = torch.full_like(tx, 0.1 / (V - 1))
    ignore = tt == -1
    tt2 = tt.masked_fill(ignore, 0)
    true_dist.scatter_(1, tt2.unsqueeze(1), 0.9)
    kl = torch.nn.KLDivLoss(reduction="none")(
        torch.log_softmax(tx, dim=1), true_dist)
    want = float(kl.masked_fill(ignore.unsqueeze(1), 0).sum() / B)
    assert abs(got - want) < 1e-4, (got, want)


def test_e2e_loss_dict_contract():
    B, T, L, V = 2, 12, 5, 9
    rng = np.random.default_rng(1)
    data = {
        "att_out": jnp.asarray(rng.standard_normal((B, L, V)), jnp.float32),
        "ctc_out": jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32),
        "att_label": jnp.asarray([[1, 2, 3, 2, -1], [4, 5, -1, -1, -1]]),
        "ctc_label": jnp.asarray([[1, 2, 3, 2, -1], [4, 5, -1, -1, -1]]),
        "hs_len": jnp.asarray([12, 10], jnp.int32),
    }
    crit = E2E_Loss(size=V, padding_idx=-1, smoothing=0.1, rate=0.3)
    out = crit.train_forward(data)
    assert set(out) == {"loss_main", "att_loss", "ctc_loss",
                    "att_corr", "ctc_cer"}
    main = float(out["loss_main"])
    assert np.isfinite(main)
    np.testing.assert_allclose(
        main, 0.7 * float(out["att_loss"]) + 0.3 * float(out["ctc_loss"]),
        rtol=1e-6)


def test_att_accuracy():
    att = jnp.asarray([[[0.1, 0.9], [0.9, 0.1]]])  # preds: 1, 0
    label = jnp.asarray([[1, -1]])
    assert float(att_accuracy(att, label)) == 1.0


def test_ctc_greedy_cer():
    V = 4
    out = np.zeros((1, 6, V), np.float32)
    # emit: blank,1,1,blank,2,blank → [1,2]
    for t, v in enumerate([0, 1, 1, 0, 2, 0]):
        out[0, t, v] = 5.0
    label = np.asarray([[1, 2, -1]])
    assert ctc_greedy_cer(out, label, np.asarray([6])) == 0.0
    label2 = np.asarray([[1, 3, -1]])
    assert ctc_greedy_cer(out, label2, np.asarray([6])) == 0.5


def test_decode_hooks():
    model = _tiny_transformer()
    x, xlen, ys_in = _batch()
    vars_ = model.init(jax.random.PRNGKey(0), x, xlen, ys_in)
    hs, hs_len = model.apply(vars_, x, xlen, method=model.encode)
    ctc = model.apply(vars_, hs, method=model.ctc_logits)
    assert ctc.shape[:2] == hs.shape[:2]
    prob = model.apply(vars_, x, xlen, method=model.get_ctc_prob)
    np.testing.assert_allclose(np.asarray(prob), np.asarray(ctc), atol=1e-5)


def test_ctc_greedy_cer_device_matches_host():
    """The in-graph per-step CER (vectorized Levenshtein over frames) must
    equal the host groupby+editdistance proxy on random posteriors."""
    from lasr_tpu.models.losses import (ctc_greedy_cer,
                                        ctc_greedy_cer_device)
    rng = np.random.default_rng(7)
    B, T, V, L = 5, 37, 12, 9
    for trial in range(5):
        ctc_out = rng.standard_normal((B, T, V)).astype(np.float32)
        # peaky posteriors so collapses/repeats actually occur
        peaks = rng.integers(0, V, (B, T))
        for b in range(B):
            ctc_out[b, np.arange(T), peaks[b]] += 3.0
        hs_len = rng.integers(1, T + 1, (B,)).astype(np.int32)
        label = rng.integers(1, V, (B, L)).astype(np.int32)
        lens = rng.integers(0, L + 1, (B,))
        for b in range(B):
            label[b, lens[b]:] = -1
        want = ctc_greedy_cer(ctc_out, label, hs_len)
        got = float(ctc_greedy_cer_device(
            jnp.asarray(ctc_out), jnp.asarray(label), jnp.asarray(hs_len)))
        # host returns errs/total; device the same ratio
        assert got == pytest.approx(want, abs=1e-6), (trial, got, want)
