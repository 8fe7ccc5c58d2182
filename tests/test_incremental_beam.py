"""Incremental (resumable) online beam search == the from-scratch search.

VERDICT round-3 item 3: the serving path used to re-decode the whole
prefix at every beam-partial refresh.  The incremental session persists
the search carry and extends it over only the new frames; these tests pin
the exactness contract: finalizing through ANY sequence of mid-stream
refreshes yields exactly the from-scratch full-utterance online search
(reference decode_feat_online semantics, ctc_att_decoder.py:336-519)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lasr_tpu.decode.beam import CTCAttBeamDecoder
from lasr_tpu.decode.online import IncrementalBeamSession
from lasr_tpu.models.e2e_online import E2E_Transformer_CTC_Online


def _tiny_online_model(seed=0, odim=11):
    model = E2E_Transformer_CTC_Online(
        idim=80, odim=odim,
        encoder_attention_dim=16, encoder_attention_heads=2,
        encoder_left_chunk=16, encoder_center_chunk=16,
        encoder_right_chunk=16,
        encoder_linear_units=32, encoder_num_blocks=1,
        decoder_attention_dim=16, decoder_self_attention_heads=2,
        decoder_src_attention_heads=2, decoder_linear_units=32,
        decoder_num_block=1, encoder_dropout_rate=0.0,
        decoder_dropout_rate=0.0, ctc_dropout=0.0,
        decoder_src_attention_sigmoid_noise=0.0)
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.standard_normal((1, 120, 80)), jnp.float32)
    feat_len = jnp.asarray([120], jnp.int32)
    ys = jnp.asarray(rng.integers(3, odim, (1, 4)))
    vars_ = model.init(jax.random.PRNGKey(seed), feats, feat_len, ys)
    return model, vars_, feats, feat_len


@pytest.mark.parametrize("splits", [[1.0], [0.35, 0.7, 1.0],
                                    [0.2, 0.4, 0.6, 0.8, 1.0]])
def test_incremental_finalize_equals_from_scratch(splits):
    model, vars_, feats, feat_len = _tiny_online_model()
    dec = CTCAttBeamDecoder(model, vars_, beam=3, ctc_beam=5,
                            ctc_weight=0.5, online=True)
    full = dec(feats, feat_len)

    hs, hs_len, _ = dec._encode(feats, feat_len)
    hs_np = np.asarray(hs[0][: int(hs_len[0])], np.float32)
    T = len(hs_np)

    sess = IncrementalBeamSession(dec, bucket=16)
    for frac in splits[:-1]:
        toks, score, _live = sess.refresh(hs_np[: int(frac * T)],
                                          final=False)
        assert isinstance(toks, list) and np.isfinite(score)
    hyp = sess.refresh(hs_np, final=True)

    n_full = int(full.lengths[0, 0])
    n_inc = int(hyp.lengths[0, 0])
    assert n_inc == n_full
    assert hyp.tokens[0, 0, :n_inc].tolist() == \
        full.tokens[0, 0, :n_full].tolist()
    assert np.allclose(hyp.scores[0, 0], full.scores[0, 0], atol=1e-4)


def test_incremental_nbest_pool_matches():
    """The whole ended pool (not just the 1-best) survives resumption."""
    model, vars_, feats, feat_len = _tiny_online_model(seed=3)
    dec = CTCAttBeamDecoder(model, vars_, beam=3, ctc_beam=5,
                            ctc_weight=0.5, nbest=3, online=True)
    full = dec(feats, feat_len)
    hs, hs_len, _ = dec._encode(feats, feat_len)
    hs_np = np.asarray(hs[0][: int(hs_len[0])], np.float32)
    sess = IncrementalBeamSession(dec, bucket=16)
    sess.refresh(hs_np[: len(hs_np) // 2], final=False)
    hyp = sess.refresh(hs_np, final=True)
    for (ids_a, sc_a), (ids_b, sc_b) in zip(hyp.nbest_ids(0),
                                            full.nbest_ids(0)):
        assert ids_a == ids_b
        assert np.allclose(sc_a, sc_b, atol=1e-4)


def test_recognizer_incremental_finalize_matches_from_scratch():
    """End-to-end serving path: StreamingRecognizer with the incremental
    session finalizes to the same transcript as the from-scratch
    ``_run_beam`` mode on the same audio."""
    from lasr_tpu.decode.online import StreamingRecognizer
    model, vars_, _, _ = _tiny_online_model(seed=5)
    rng = np.random.default_rng(7)
    wav = (0.1 * rng.standard_normal(16000 * 3)).astype(np.float32)

    results = []
    for incremental in (False, True):
        dec = CTCAttBeamDecoder(model, vars_, beam=3, ctc_beam=5,
                                ctc_weight=0.5, online=True)
        rec = StreamingRecognizer(model, vars_, beam_decoder=dec,
                                  beam_interval=2, beam_bucket=16,
                                  beam_incremental=incremental)
        for off in range(0, len(wav), 4000):
            rec.accept_waveform(wav[off: off + 4000])
            rec.partial_result()
        results.append(rec.finalize()[0])
    assert results[0] == results[1]
