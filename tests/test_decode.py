"""Decode tests: greedy CTC and beam-search parity vs the golden replica."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lasr_tpu.decode.beam import CTCAttBeamDecoder
from lasr_tpu.decode.greedy import ctc_greedy_decode
from lasr_tpu.models.e2e_ctc_att import E2E_Transformer_CTC
from tests.ref_beam import ref_beam_search


@pytest.fixture(scope="module")
def tiny_model():
    odim = 12
    model = E2E_Transformer_CTC(
        idim=16, odim=odim,
        encoder_attention_dim=16, encoder_attention_heads=2,
        encoder_linear_units=32, encoder_num_blocks=2,
        encoder_input_layer="linear",
        decoder_attention_dim=16, decoder_attention_heads=2,
        decoder_linear_units=32, decoder_num_block=2,
        encoder_dropout_rate=0.0, decoder_dropout_rate=0.0, ctc_dropout=0.0)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 23, 16)), jnp.float32)
    feat_len = jnp.asarray([23, 17], jnp.int32)
    ys = jnp.asarray(rng.integers(1, odim, (2, 5)))
    variables = model.init(jax.random.PRNGKey(3), feats, feat_len, ys)
    return model, variables, feats, feat_len


def test_greedy_decode_shapes(tiny_model):
    model, variables, feats, feat_len = tiny_model
    hs, hs_len = model.apply(variables, feats, feat_len, method=model.encode)
    logits = model.apply(variables, hs, method=model.ctc_logits)
    hyps = ctc_greedy_decode(logits, hs_len)
    assert len(hyps) == 2
    assert all(isinstance(h, list) for h in hyps)
    assert all(0 not in h for h in hyps)  # no blanks survive


def test_beam_matches_reference_replica(tiny_model):
    """The fixed-shape while_loop search must produce the same best
    hypothesis (tokens and score) as the dict-based reference replica."""
    model, variables, feats, feat_len = tiny_model
    dec = CTCAttBeamDecoder(model, variables, beam=4, ctc_beam=6,
                            ctc_weight=0.4)
    out = dec(feats, feat_len)

    for b in range(2):
        ref = ref_beam_search(
            model, variables, feats[b:b + 1], feat_len[b:b + 1],
            beam=4, ctc_beam=6, ctc_weight=0.4)
        assert ref, "reference produced no hypotheses"
        want = ref[0]["yseq"]
        n = int(out.lengths[b, 0])
        got = out.tokens[b, 0, :n].tolist()
        assert got == want, (b, got, want)
        assert out.scores[b, 0] == pytest.approx(ref[0]["score"], abs=2e-3)


def test_beam_batch_invariance(tiny_model):
    """Decoding an utterance alone or in a batch must give the same best
    hypothesis."""
    model, variables, feats, feat_len = tiny_model
    dec = CTCAttBeamDecoder(model, variables, beam=3, ctc_beam=5,
                            ctc_weight=0.5)
    both = dec(feats, feat_len)
    solo = dec(feats[1:2, :17], feat_len[1:2])
    n = int(both.lengths[1, 0])
    m = int(solo.lengths[0, 0])
    assert both.tokens[1, 0, :n].tolist() == solo.tokens[0, 0, :m].tolist()
    # scores too: solo-pad encode semantics make batched decode equal to
    # one-at-a-time decode regardless of bucket padding
    assert abs(float(both.scores[1, 0]) - float(solo.scores[0, 0])) < 1e-5


def test_beam_with_rnnlm_matches_replica(tiny_model):
    """Shallow RNNLM fusion: joint += lm_weight*lm[cs], LM state rides the
    beam — must match the dict-based replica (tokens and scores)."""
    from lasr_tpu.modules.rnn import RNNCellStack, RNNLM
    model, variables, feats, feat_len = tiny_model
    lm_mod = RNNCellStack(input_dim=12, output_dim=12, n_layers=1,
                          n_units=8, dropout_rate=0.0)
    lm_vars = lm_mod.init(jax.random.PRNGKey(7), None,
                          jnp.zeros((1,), jnp.int32))
    lm = RNNLM(lm_mod, lm_vars)

    dec = CTCAttBeamDecoder(model, variables, beam=4, ctc_beam=6,
                            ctc_weight=0.4, lm_weight=0.3, lm=lm)
    out = dec(feats, feat_len)
    for b in range(2):
        ref = ref_beam_search(
            model, variables, feats[b:b + 1], feat_len[b:b + 1],
            beam=4, ctc_beam=6, ctc_weight=0.4, lm=lm, lm_weight=0.3)
        assert ref, "reference produced no hypotheses"
        want = ref[0]["yseq"]
        n = int(out.lengths[b, 0])
        got = out.tokens[b, 0, :n].tolist()
        assert got == want, (b, got, want)
        assert out.scores[b, 0] == pytest.approx(ref[0]["score"], abs=2e-3)


def test_ctc_prefix_parallel_scan_matches_sequential():
    """The associative-scan evaluation of the prefix recursion must equal
    the sequential scan (states, psi, and per-frame psi)."""
    from lasr_tpu.decode.beam import _ctc_prefix_step, _ctc_initial_state
    rng = np.random.default_rng(0)
    B, K, C, T, V = 2, 3, 4, 19, 9
    lpz = jnp.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T, V)), jnp.float32), -1))
    r_prev = jnp.broadcast_to(
        _ctc_initial_state(lpz, 0)[:, None], (B, K, T, 2))
    last = jnp.asarray(rng.integers(1, V, (B, K)), jnp.int32)
    cand = jnp.asarray(rng.integers(0, V, (B, K, C)), jnp.int32)
    for out_len in (0, 1, 3):
        seq = _ctc_prefix_step(lpz, r_prev, last, cand, out_len, 0,
                               want_psi_all=True, parallel_scan=False)
        par = _ctc_prefix_step(lpz, r_prev, last, cand, out_len, 0,
                               want_psi_all=True, parallel_scan=True)
        np.testing.assert_allclose(np.asarray(par[0]), np.asarray(seq[0]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(par[1]), np.asarray(seq[1]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(par[2]), np.asarray(seq[2]),
                                   atol=1e-4)


def _burst_utt(tokens, rng):
    """Feature stream of per-token bursts separated by silence."""
    pieces = []
    for t in tokens:
        b = np.zeros((24, 20), np.float32)
        b[:, (3 * t) % 20] = 2.0
        b += 0.2 * rng.standard_normal(b.shape).astype(np.float32)
        pieces += [b, np.zeros((20, 20), np.float32)]
    return np.concatenate(pieces, axis=0)


@pytest.fixture(scope="module")
def burst_model():
    """1-block E2E model briefly trained on burst utterances so posteriors
    are peaked and blanks mark silence (shared by the long-form tests)."""
    import optax
    from lasr_tpu.ops.ctc import ctc_forward_from_logits

    model = E2E_Transformer_CTC(
        idim=20, odim=12,
        encoder_attention_dim=32, encoder_attention_heads=2,
        encoder_linear_units=64, encoder_num_blocks=1,
        decoder_attention_dim=32, decoder_attention_heads=2,
        decoder_linear_units=64, decoder_num_block=1,
        encoder_dropout_rate=0.0, decoder_dropout_rate=0.0,
        ctc_dropout=0.0)
    rng = np.random.default_rng(5)

    utts = []
    for _ in range(24):
        toks = rng.integers(6, 12, rng.integers(2, 6))
        utts.append((_burst_utt(toks, rng), toks.astype(np.int32)))
    Tmax = max(x.shape[0] for x, _ in utts)
    B = len(utts)
    feats_tr = np.zeros((B, Tmax, 20), np.float32)
    flen_tr = np.zeros(B, np.int32)
    labels = np.zeros((B, 5), np.int32)
    llen = np.zeros(B, np.int32)
    ys_in = np.full((B, 6), 2, np.int32)
    att_lab = np.full((B, 6), -1, np.int32)
    for i, (x, t) in enumerate(utts):
        feats_tr[i, : len(x)] = x
        flen_tr[i] = len(x)
        labels[i, : len(t)] = t
        llen[i] = len(t)
        ys_in[i, 0] = 1
        ys_in[i, 1: 1 + len(t)] = t
        att_lab[i, : len(t)] = t
        att_lab[i, len(t)] = 2
    vars_ = model.init(jax.random.PRNGKey(0), jnp.asarray(feats_tr[:1]),
                       jnp.asarray(flen_tr[:1]), jnp.asarray(ys_in[:1]))
    params = vars_["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = model.apply({"params": p}, jnp.asarray(feats_tr),
                              jnp.asarray(flen_tr), jnp.asarray(ys_in),
                              deterministic=True)
            logp = jax.nn.log_softmax(out["att_out"], -1)
            mask = jnp.asarray(att_lab) != -1
            oh = jax.nn.one_hot(jnp.maximum(jnp.asarray(att_lab), 0), 12)
            ce = -jnp.sum(jnp.sum(logp * oh, -1) * mask) / jnp.sum(mask)
            ll = ctc_forward_from_logits(out["ctc_out"], out["hs_len"],
                                         jnp.asarray(labels),
                                         jnp.asarray(llen))
            return 0.5 * ce - 0.5 * jnp.mean(ll / jnp.maximum(llen, 1))
        loss, g = jax.value_and_grad(loss_fn)(params)
        u, new_opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), new_opt, loss
    for _ in range(120):
        params, opt, loss = step(params, opt)
    return model, {"params": params}, rng


def test_longform_segmented_decode_matches_full(burst_model):
    """Long-form mechanics: cut points land on the most blank-dominated
    frames, and every segment's result equals a direct fixed-shape search
    over the same encoder/CTC slice (bucket padding, dummy batch rows and
    token extraction included) — batched-vs-solo independence of the
    search itself is pinned separately by the bucketing tests."""
    from lasr_tpu.decode.beam import CTCAttBeamDecoder
    from lasr_tpu.decode.longform import LongFormCTCAttDecoder, \
        pick_cut_frames

    model, vars_, rng = burst_model
    long_toks = [6, 9, 11, 8, 10]
    feats = _burst_utt(long_toks, rng)[None]
    flen = np.asarray([feats.shape[1]], np.int64)

    dec = CTCAttBeamDecoder(model, vars_, beam=3, ctc_beam=5, ctc_weight=0.7)
    S = 24
    lf = LongFormCTCAttDecoder(dec, segment_frames=S, window_frames=6,
                               segment_batch=2)
    tokens, per_seg = lf(feats, flen)
    assert len(per_seg) >= 2                 # it actually segmented
    assert tokens == [t for seg in per_seg for t in seg]

    # reproduce the segmentation + per-segment searches independently
    hs, hs_len, lpz = dec._encode(jnp.asarray(feats), jnp.asarray(flen))
    hs = np.asarray(hs[0])
    lpz = np.asarray(lpz[0])
    T = int(np.asarray(hs_len)[0])
    cuts = pick_cut_frames(lpz[:T, dec.blank], T, S, 6)
    # cuts sit in silence: blank is the greedy symbol at every cut frame
    for c in cuts:
        assert int(np.argmax(lpz[c])) == dec.blank, c
    bounds = [0] + cuts + [T]
    segs = [(a, b) for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
    assert len(segs) == len(per_seg)
    V = lpz.shape[-1]
    for i, (a, b) in enumerate(segs):
        hp = np.zeros((1, S, hs.shape[-1]), hs.dtype)
        lp = np.full((1, S, V), -np.log(V), np.float32)
        hp[0, : b - a] = hs[a:b]
        lp[0, : b - a] = lpz[a:b]
        out = dec.search(jnp.asarray(hp), jnp.asarray([b - a], jnp.int32),
                         jnp.asarray(lp), max_len=S)
        want = np.asarray(out[0])[0, 0][1: int(np.asarray(out[1])[0, 0]) - 1]
        assert per_seg[i] == want.tolist(), (i, per_seg[i], want)


def test_longform_windowed_encoder_alignment(burst_model):
    """Windowed-encode mechanics: with a halo that covers the whole input,
    every window sees full context, so the stitched (hs, lpz) must equal
    the plain full forward exactly (window slicing, conv-stride alignment,
    batching, center extraction and tail handling all pinned)."""
    from lasr_tpu.decode.beam import CTCAttBeamDecoder
    from lasr_tpu.decode.longform import LongFormCTCAttDecoder, _enc_len

    model, vars_, rng = burst_model
    feats = _burst_utt([6, 9, 11, 8, 10, 7, 6, 11], rng)[None]
    flen = np.asarray([feats.shape[1]], np.int64)

    dec = CTCAttBeamDecoder(model, vars_, beam=3, ctc_beam=5, ctc_weight=0.7)
    hs_full, hs_len, lpz_full = dec._encode(jnp.asarray(feats),
                                            jnp.asarray(flen))
    T = int(np.asarray(hs_len)[0])
    assert T == _enc_len(int(flen[0]))

    halo_enc = (int(flen[0]) + 4) // 4          # halo >= whole input
    lf = LongFormCTCAttDecoder(dec, segment_frames=16,
                               encoder_window_frames=8,
                               encoder_halo_frames=halo_enc,
                               encoder_window_batch=3)
    hs_w, T_w, lpz_w = lf._encode_windowed(feats, flen)
    assert T_w == T and hs_w.shape[0] == T
    np.testing.assert_allclose(hs_w, np.asarray(hs_full[0])[:T],
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(lpz_w, np.asarray(lpz_full[0])[:T],
                               atol=2e-5, rtol=1e-5)


def test_longform_windowed_decode_close_to_full(burst_model):
    """Windowed-encoder regression guard: long-form decode through the
    windowed (linear-compute) encoder stays close to the full-forward
    decode for every halo (a stitching/alignment bug garbles the whole
    transcript; halo-truncation on this deliberately-global tiny model
    only flips near-ties).  Exact windowed==full agreement is gated on the
    recipe rel-pos conformer in tools/bench_longform.py (BASELINE.md) —
    this 1-block abs-PE model does not generalize past its training
    length, so even its full forward is unstable on long streams."""
    from lasr_tpu.decode.beam import CTCAttBeamDecoder
    from lasr_tpu.decode.longform import LongFormCTCAttDecoder
    from lasr_tpu.utils.text import edit_distance

    model, vars_, rng = burst_model
    long_toks = [6, 9, 11, 8, 10, 7, 9, 6, 10, 11, 8, 7]
    feats = _burst_utt(long_toks, rng)[None]
    flen = np.asarray([feats.shape[1]], np.int64)

    dec = CTCAttBeamDecoder(model, vars_, beam=3, ctc_beam=5, ctc_weight=0.7)
    full = LongFormCTCAttDecoder(dec, segment_frames=24, window_frames=6,
                                 encoder_window_frames=10 ** 6)  # full fwd
    tok_full, _ = full(feats, flen)
    assert tok_full  # decoded something
    for W, H in ((16, 32), (32, 32)):
        windowed = LongFormCTCAttDecoder(
            dec, segment_frames=24, window_frames=6,
            encoder_window_frames=W, encoder_halo_frames=H)
        tok_win, _ = windowed(feats, flen)
        d = edit_distance(tok_win, tok_full)
        assert d <= max(2, len(tok_full) // 4), (W, H, tok_win, tok_full)
