"""Aux module tests: VGG2L, RNN/RNNLM, wav2vec, fillier, distances,
upsampling, ctc_bs decoder, attention plotting harvest."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from lasr_tpu.decode.ctc_bs import CTC_Decoder
from lasr_tpu.models.distances import (
    SeqCEDistance, SeqCosineSimilarity, SeqCrossEntropy, SeqKLDistance,
    SeqPairwiseDistance)
from lasr_tpu.modules.fillier import Classification, ConvBlock, EmbeddingModel
from lasr_tpu.modules.rnn import LSTMStack, RNNCellStack, RNNLM
from lasr_tpu.modules.subsampling import Conv2dUpsampling
from lasr_tpu.modules.vgg import VGG2L, vgg2l_sub_len
from lasr_tpu.modules.wav2vec import (
    ConvAggegator, ConvFeatureExtractionModel, Wav2VecPredictionsModel,
    cpc_loss)
from lasr_tpu.utils.plot import calculate_all_attentions


def test_vgg2l_shapes_and_mask():
    m = VGG2L(idim=80, odim=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 61, 80))
    x_len = jnp.asarray([61, 40])
    vars_ = m.init(jax.random.PRNGKey(1), x, x_len)
    out, new_len = m.apply(vars_, x, x_len)
    # torch: maxpool (3,2) then (2,2): T=61→20→10; F=80→40→20
    assert out.shape == (2, 10, 32)
    # mask: 61→ ::3 of first 60 → 20 → ::2 of 20 → 10
    assert int(new_len[0]) == 10
    ref = np.ones(61, bool); ref[40:] = False
    t1 = ref[:60][::3]; t2 = t1[:20][::2]
    assert int(new_len[1]) == t2.sum()


def test_vgg2l_domain_tag():
    m = VGG2L(idim=80, odim=32, domain_dim=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 80))
    tag = jnp.ones((2, 4))
    vars_ = m.init(jax.random.PRNGKey(1), x, jnp.asarray([24, 24]), tag)
    out, _ = m.apply(vars_, x, jnp.asarray([24, 24]), tag)
    assert out.shape[-1] == 32


def test_lstm_stack():
    m = LSTMStack(input_size=8, hidden_size=16, num_layers=2, dropout=0.0,
                  bidirectional=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 8))
    vars_ = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(vars_, x)
    assert out.shape == (2, 7, 32)


def test_rnnlm_stepwise_matches_sequence():
    m = RNNCellStack(input_dim=11, output_dim=11, n_layers=2, n_units=16,
                     dropout_rate=0.0)
    tok = jnp.asarray([[1, 5, 3, 2]])
    vars_ = m.init(jax.random.PRNGKey(0), None, tok[:, 0])
    seq = m.apply(vars_, tok, method=RNNCellStack.score_sequence)
    state = None
    for t in range(4):
        state, y = m.apply(vars_, state, tok[:, t])
        np.testing.assert_allclose(np.asarray(y), np.asarray(seq[:, t]),
                                   atol=1e-5)
    # predict wrapper returns log-probs
    lm = RNNLM(m, vars_)
    st, lp = lm.predict(np.asarray([1]), None)
    assert lp.shape == (1, 11)
    np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(), 1.0, rtol=1e-5)


def test_wav2vec_stack():
    enc = ConvFeatureExtractionModel(
        conv_layers=((32, 10, 5), (32, 4, 2)), dropout=0.0,
        log_compression=True, skip_connections=True, residual_scale=0.5,
        non_affine_group_norm=False)
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 800))
    vars_e = enc.init(jax.random.PRNGKey(1), wav)
    z = enc.apply(vars_e, wav)
    assert z.shape[0] == 2 and z.shape[2] == 32

    agg = ConvAggegator(conv_layers=((32, 3, 1), (32, 3, 1)), embed=32,
                        dropout=0.0, skip_connections=True,
                        residual_scale=0.5, non_affine_group_norm=False,
                        conv_bias=True, zero_pad=False)
    vars_a = agg.init(jax.random.PRNGKey(2), z)
    c = agg.apply(vars_a, z)
    assert c.shape == z.shape

    pred = Wav2VecPredictionsModel(in_dim=32, out_dim=32, prediction_steps=3,
                                   n_negatives=2, dropout=0.0, offset=1)
    vars_p = pred.init({"params": jax.random.PRNGKey(3),
                        "negatives": jax.random.PRNGKey(4)}, c, z)
    logits, labels, valid = pred.apply(
        vars_p, c, z, rngs={"negatives": jax.random.PRNGKey(5)})
    assert logits.shape == (3, 2, 3, z.shape[1])
    loss = float(cpc_loss(logits, labels, valid))
    assert np.isfinite(loss) and loss > 0


def test_fillier_stack():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 196, 32, 1))
    emb = EmbeddingModel(dropout_rate=0.0)
    vars_ = emb.init(jax.random.PRNGKey(1), x)
    y = emb.apply(vars_, x)
    assert y.shape[-1] == 96  # channels last (NHWC)
    # classification head over channel-major layout
    feat = jnp.moveaxis(y, -1, 1)[..., :1]  # (B, C, E, 1)
    head = Classification(embedding_channel=96, embedding_size=feat.shape[2],
                          output_size=5, dropout_rate=0.0)
    vars_h = head.init(jax.random.PRNGKey(2), feat)
    out = head.apply(vars_h, feat)
    assert out.shape == (1, 5)


def test_distances_match_torch():
    rng = np.random.default_rng(0)
    a = np.abs(rng.standard_normal((3, 2, 5)).astype(np.float32)) + 0.1
    b = np.abs(rng.standard_normal((3, 2, 5)).astype(np.float32)) + 0.1
    pa, pb = a / a.sum(-1, keepdims=True), b / b.sum(-1, keepdims=True)

    got = float(SeqKLDistance()(jnp.asarray(pa), jnp.asarray(pb)))
    ta, tb = torch.from_numpy(pa), torch.from_numpy(pb)
    d1 = torch.nn.KLDivLoss(reduction="batchmean")(
        torch.log(ta).view(-1, 5).t(), tb.view(-1, 5).t())
    d2 = torch.nn.KLDivLoss(reduction="batchmean")(
        torch.log(tb).view(-1, 5).t(), ta.view(-1, 5).t())
    assert got == pytest.approx(float((d1 + d2) / 2), rel=1e-4)

    got_ce = float(SeqCEDistance()(jnp.asarray(pa), jnp.asarray(pb)))
    want_ce = float((-tb * torch.log(ta)).sum(-1).mean())
    assert got_ce == pytest.approx(want_ce, rel=1e-4)

    got_cos = float(SeqCosineSimilarity()(jnp.asarray(a), jnp.asarray(b)))
    want_cos = float(torch.nn.CosineEmbeddingLoss()(
        tb.view(-1, 5), ta.view(-1, 5), torch.ones(6)))
    # note: reference computes loss(f2, f1, 1) = mean(1 - cos)
    assert got_cos == pytest.approx(
        float(torch.nn.CosineEmbeddingLoss()(
            torch.from_numpy(b).view(-1, 5), torch.from_numpy(a).view(-1, 5),
            torch.ones(6))), rel=1e-4)

    got_pd = float(SeqPairwiseDistance()(jnp.asarray(a), jnp.asarray(b)))
    want_pd = float(torch.nn.PairwiseDistance()(
        torch.from_numpy(a).view(-1, 5), torch.from_numpy(b).view(-1, 5)
    ).mean())
    assert got_pd == pytest.approx(want_pd, rel=1e-3)

    ce = SeqCrossEntropy()
    logits = jnp.asarray(rng.standard_normal((2, 3, 5)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 5, (2, 3)))
    want = float(torch.nn.CrossEntropyLoss()(
        torch.from_numpy(np.asarray(logits)).view(-1, 5),
        torch.from_numpy(np.asarray(y).astype(np.int64)).view(-1)))
    assert float(ce(logits, y)) == pytest.approx(want, rel=1e-5)


def test_conv2d_upsampling_shape():
    m = Conv2dUpsampling(idim=80, odim=16, dropout_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
    vars_ = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(vars_, x)
    assert out.shape[0] == 2 and out.shape[2] == 80
    assert out.shape[1] >= 40  # ~4x upsampled


def test_ctc_bs_decoder_greedyish():
    """On a sharply peaked posterior the prefix search must recover the
    greedy collapse."""
    V, T = 5, 8
    path = [0, 1, 1, 0, 2, 0, 3, 3]  # → [1, 2, 3]
    probs = np.full((T, V), 1e-4)
    for t, s in enumerate(path):
        probs[t, s] = 1.0
    probs /= probs.sum(-1, keepdims=True)
    dec = CTC_Decoder(beam_size=4, ctc_beam=5, blank=0, sos=0)
    nbest = dec.decode_problike(probs, do_log=True)
    best_prefix = nbest[0][0]
    assert list(best_prefix[1:]) == [1, 2, 3]


def test_calculate_all_attentions_harvest():
    from lasr_tpu.models.e2e_ctc_att import E2E_Transformer_CTC
    model = E2E_Transformer_CTC(
        idim=16, odim=9, encoder_attention_dim=16, encoder_attention_heads=2,
        encoder_linear_units=32, encoder_num_blocks=1,
        encoder_input_layer="linear",
        decoder_attention_dim=16, decoder_attention_heads=2,
        decoder_linear_units=32, decoder_num_block=1,
        encoder_dropout_rate=0.0, decoder_dropout_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 12, 16))
    xlen = jnp.asarray([12])
    ys = jnp.asarray([[1, 4, 5]])
    vars_ = model.init(jax.random.PRNGKey(1), x, xlen, ys)
    maps = calculate_all_attentions(model, vars_, x, xlen, ys)
    # 1 encoder self-attn + decoder self-attn + decoder src-attn
    assert len(maps) == 3
    for name, att in maps.items():
        assert att.ndim == 4 and att.shape[1] == 2  # heads
