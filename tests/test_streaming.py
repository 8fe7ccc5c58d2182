"""Streaming stack tests: chunk encoder causality, dual encoders, stream
decoder online step, univ model + losses, forced alignment."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from lasr_tpu.models.e2e_online import (
    E2E_Transformer_CTC_Online, E2E_Transformer_CTC_Univ_Dynamic)
from lasr_tpu.models.losses_univ import (
    Align_Loss, CTC_CE_Univ_Loss, KL_Loss, ctc_force_align)
from lasr_tpu.modules.streaming import (
    ChunkEncoder, DualTransformerEncoder, ParallelDynamicDualEncoder,
    StreamDecoder, _chunk_grid)
from lasr_tpu.utils.masks import target_mask


def test_chunk_grid_matches_reference_iterator():
    def ref_n(T, cur, right, hop):
        chunk_len = cur + right
        padded = T + right + 6
        n, i = 0, 0
        while i + chunk_len < padded - 6 + hop:
            n += 1
            i += hop
        return n
    for T in (64, 100, 128, 257, 400):
        for cur, right in ((64, 64), (32, 16), (64, 0)):
            assert _chunk_grid(T, cur, right, cur) == ref_n(T, cur, right, cur)


def test_chunk_encoder_shapes_and_causality():
    enc = ChunkEncoder(idim=80, attention_dim=16, attention_heads=2,
                       linear_units=32, num_blocks=2, dropout_rate=0.0,
                       left_len=16, cur_len=16, right_len=16, hop_len=16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 200, 80)), jnp.float32)
    x_len = jnp.asarray([200], jnp.int32)
    vars_ = enc.init(jax.random.PRNGKey(0), x, x_len)
    hs, hs_len = enc.apply(vars_, x, x_len)
    assert hs.shape[2] == 16
    assert int(hs_len[0]) == 50  # ceil(200/4)

    # causality: changing input beyond cur+right of chunk 0 must not change
    # the first chunk's output (frames 0..3 depend on raw 0..16+16+6)
    x2 = x.at[:, 64:].set(rng.standard_normal((1, 136, 80)))
    hs2, _ = enc.apply(vars_, x2, x_len)
    np.testing.assert_allclose(np.asarray(hs[0, :4]), np.asarray(hs2[0, :4]),
                               atol=1e-5)
    # but distant future outputs do change
    assert not np.allclose(np.asarray(hs[0, 30:40]), np.asarray(hs2[0, 30:40]))


def test_dual_encoder_offline_equals_plain_view():
    enc = DualTransformerEncoder(idim=20, attention_dim=16, attention_heads=2,
                                 attention_chunk=4, linear_units=32,
                                 num_blocks=2, dropout_rate=0.0,
                                 input_layer="linear")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 20))
    x_len = jnp.asarray([24, 18], jnp.int32)
    vars_ = enc.init(jax.random.PRNGKey(1), x, x_len)
    off, on, h_len = enc.apply(vars_, x, x_len)
    off2, _ = enc.apply(vars_, x, x_len, method=enc.forward_offline)
    np.testing.assert_allclose(np.asarray(off), np.asarray(off2), atol=1e-6)
    assert not np.allclose(np.asarray(off), np.asarray(on))

    # online view is chunk-causal: frames in chunk 0 (first 4) must not see
    # future chunks
    x3 = x.at[:, 12:].set(0.0)
    _, on3, _ = enc.apply(vars_, x3, x_len)
    np.testing.assert_allclose(np.asarray(on[:, :4]), np.asarray(on3[:, :4]),
                               atol=1e-5)


def test_parallel_dynamic_dual_encoder():
    enc = ParallelDynamicDualEncoder(
        idim=20, attention_dim=16, attention_heads=2, attention_chunk=4,
        linear_units=32, num_blocks=2, dropout_rate=0.0, input_layer="linear")
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 20))
    x_len = jnp.asarray([16, 16], jnp.int32)
    vars_ = enc.init(jax.random.PRNGKey(1), x, x_len)
    off, on, h_len = enc.apply(vars_, x, x_len)
    assert off.shape == on.shape == (2, 16, 16)
    # train mode draws a random chunk size without error
    off_t, on_t, _ = enc.apply(vars_, x, x_len, deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.all(np.isfinite(np.asarray(on_t)))


def test_stream_decoder_forward_and_online_step():
    dec = StreamDecoder(odim=11, attention_dim=16, self_attention_heads=2,
                        src_attention_heads=2, linear_units=32, num_blocks=2,
                        dropout_rate=0.0, src_attention_sigmoid_noise=0.0)
    B, L, T = 2, 4, 10
    mem = jax.random.normal(jax.random.PRNGKey(0), (B, T, 16))
    ys = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, 11)
    mask = target_mask(ys)
    mem_mask = jnp.ones((B, 1, T), bool)
    vars_ = dec.init(jax.random.PRNGKey(2), ys, mask, mem, mem_mask)
    out = dec.apply(vars_, ys, mask, mem, mem_mask)
    assert out.shape == (B, L, 11)
    out2, attn = dec.apply(vars_, ys, mask, mem, mem_mask, collect_attn=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)
    assert attn.shape == (B, 2 * 2, L, T)

    cache = dec.apply(vars_, B, L, method=StreamDecoder.init_cache)
    logp, cache = dec.apply(vars_, ys[:, 0], 0, cache, mem,
                            method=StreamDecoder.forward_one_step_online)
    assert logp.shape == (B, 11)
    # endpoints advanced to valid frame indices
    assert np.all(np.asarray(cache["ep"]) >= -1)
    logp2, cache = dec.apply(vars_, ys[:, 1], 1, cache, mem,
                             method=StreamDecoder.forward_one_step_online)
    # monotonicity: endpoints never regress
    assert np.all(np.asarray(cache["ep"]) >= -1)


def test_e2e_online_model_forward():
    model = E2E_Transformer_CTC_Online(
        idim=80, odim=11,
        encoder_attention_dim=16, encoder_attention_heads=2,
        encoder_left_chunk=16, encoder_center_chunk=16,
        encoder_right_chunk=16,
        encoder_linear_units=32, encoder_num_blocks=2,
        decoder_attention_dim=16, decoder_self_attention_heads=2,
        decoder_src_attention_heads=2, decoder_linear_units=32,
        decoder_num_block=2, encoder_dropout_rate=0.0,
        decoder_dropout_rate=0.0, ctc_dropout=0.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 120, 80)), jnp.float32)
    xlen = jnp.asarray([120, 80], jnp.int32)
    ys = jnp.asarray(rng.integers(1, 11, (2, 5)))
    vars_ = model.init(jax.random.PRNGKey(0), x, xlen, ys)
    out = model.apply(vars_, x, xlen, ys)
    assert set(out) == {"att_out", "ctc_out", "hs_len"}
    out_t = model.apply(vars_, x, xlen, ys, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.all(np.isfinite(np.asarray(out_t["att_out"])))


def test_e2e_univ_dynamic_model_and_loss():
    model = E2E_Transformer_CTC_Univ_Dynamic(
        idim=80, odim=11,
        encoder_attention_dim=16, encoder_attention_heads=2,
        encoder_attention_chunk=4, encoder_linear_units=32,
        encoder_num_blocks=2,
        decoder_attention_dim=16, decoder_self_attention_heads=2,
        decoder_src_attention_heads=2, decoder_linear_units=32,
        decoder_num_block=2, encoder_dropout_rate=0.0,
        decoder_dropout_rate=0.0, ctc_dropout=0.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 60, 80)), jnp.float32)
    xlen = jnp.asarray([60, 44], jnp.int32)
    ys = jnp.asarray(rng.integers(1, 11, (2, 5)))
    vars_ = model.init(jax.random.PRNGKey(0), x, xlen, ys)
    out = model.apply(vars_, x, xlen, ys)
    assert {"att_out_on", "ctc_out_on", "ali_out", "att_out_off",
            "ctc_out_off", "hs_len"} <= set(out)

    crit = CTC_CE_Univ_Loss(size=11, padding_idx=-1, smoothing=0.1, rate=0.3,
                            kl_rate=1.0, ali_rate=0.0)
    data = dict(out)
    data["att_label"] = jnp.asarray([[5, 6, 7, 2, -1], [8, 2, -1, -1, -1]])
    data["ctc_label"] = jnp.asarray([[5, 6, 7, -1, -1], [8, -1, -1, -1, -1]])
    metrics = crit.train_forward(data)
    assert np.isfinite(float(metrics["loss_main"]))
    assert float(metrics["kl_loss"]) >= 0.0


def test_kl_loss_self_is_zero():
    kl = KL_Loss(size=7)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 7))
    mask = jnp.zeros((2, 5), bool)
    assert float(kl(x, x, mask)) == pytest.approx(0.0, abs=1e-6)
    assert float(kl(x, x * 2.0, mask)) > 0.0


def test_ctc_force_align_matches_torch_viterbi():
    """Check alignments are valid and consistent with a torch greedy check:
    the aligned frames must be increasing and within input_len."""
    rng = np.random.default_rng(0)
    B, T, V, L = 2, 12, 5, 3
    logits = rng.standard_normal((B, T, V)).astype(np.float32) * 2
    labels = np.array([[1, 2, 3], [2, 4, 0]], dtype=np.int32)
    label_len = np.array([3, 2], dtype=np.int32)
    input_len = np.array([12, 9], dtype=np.int32)
    lpz = jax.nn.log_softmax(jnp.asarray(logits), -1)
    align = np.asarray(ctc_force_align(
        lpz, jnp.asarray(labels), jnp.asarray(input_len),
        jnp.asarray(label_len)))
    for b in range(B):
        ls = align[b, : label_len[b]]
        assert np.all(ls >= 1) and np.all(ls <= input_len[b])
        assert np.all(np.diff(ls) > 0)  # monotone emission order


def test_align_loss_modes():
    B, layers, L1, T = 2, 3, 5, 10
    rng = np.random.default_rng(0)
    raw = jnp.asarray(np.abs(rng.standard_normal((B, layers, L1, T))),
                      jnp.float32)
    ali_out = raw / jnp.sum(raw, -1, keepdims=True)
    beg = jnp.asarray([[1, 3, 5, -1], [2, 4, -1, -1]])
    end = jnp.asarray([[2, 4, 7, -1], [3, 6, -1, -1]])
    enc_pad = jnp.zeros((B, T), bool)
    for mode in ("mid", "beg", "end", "norm", "qua", "google"):
        loss = Align_Loss(mode)(ali_out, beg, end, enc_pad)
        assert np.isfinite(float(loss)), mode


def test_online_model_beam_decode():
    """ctc_att_online: batched beam search over the streaming encoder."""
    from lasr_tpu.decode.beam import CTCAttBeamDecoder
    model = E2E_Transformer_CTC_Online(
        idim=80, odim=11,
        encoder_attention_dim=16, encoder_attention_heads=2,
        encoder_left_chunk=16, encoder_center_chunk=16,
        encoder_right_chunk=16,
        encoder_linear_units=32, encoder_num_blocks=1,
        decoder_attention_dim=16, decoder_self_attention_heads=2,
        decoder_src_attention_heads=2, decoder_linear_units=32,
        decoder_num_block=1, encoder_dropout_rate=0.0,
        decoder_dropout_rate=0.0, ctc_dropout=0.0,
        decoder_src_attention_sigmoid_noise=0.0)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 120, 80)), jnp.float32)
    feat_len = jnp.asarray([120, 80], jnp.int32)
    ys = jnp.asarray(rng.integers(1, 11, (2, 4)))
    vars_ = model.init(jax.random.PRNGKey(0), feats, feat_len, ys)
    dec = CTCAttBeamDecoder(model, vars_, beam=3, ctc_beam=5,
                            ctc_weight=0.5, online=True)
    out = dec(feats, feat_len)
    for b in range(2):
        seq = out.tokens[b, 0, : int(out.lengths[b, 0])].tolist()
        assert seq[0] == 1 and seq[-1] == 2  # sos ... eos
        assert np.isfinite(out.scores[b, 0])


def test_chunk_encoder_remat_matches():
    """remat=True must be numerics-identical (fwd and grads) — it only
    changes what the chunk scan saves for the backward pass."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 200, 80)), jnp.float32)
    x_len = jnp.asarray([200, 150], jnp.int32)
    kw = dict(idim=80, attention_dim=16, attention_heads=2,
              linear_units=32, num_blocks=2, dropout_rate=0.0,
              left_len=16, cur_len=16, right_len=16, hop_len=16)
    enc0 = ChunkEncoder(**kw)
    enc1 = ChunkEncoder(remat=True, **kw)
    vars_ = enc0.init(jax.random.PRNGKey(0), x, x_len)

    outs, grads = [], []
    for enc in (enc0, enc1):
        def loss(params):
            hs, _ = enc.apply({"params": params}, x, x_len)
            return jnp.sum(hs * hs)
        outs.append(np.asarray(enc.apply(vars_, x, x_len)[0]))
        grads.append(jax.grad(loss)(vars_["params"]))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)
    for path, (a, b) in zip(
            jax.tree_util.tree_flatten_with_path(grads[0])[0],
            zip(jax.tree_util.tree_leaves(grads[0]),
                jax.tree_util.tree_leaves(grads[1]))):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg=jax.tree_util.keystr(path[0]))


def test_chunk_encoder_incremental_equals_batch():
    """Serving API: feeding chunks one at a time reproduces the batch
    forward exactly (same weights, same memories)."""
    enc = ChunkEncoder(idim=80, attention_dim=16, attention_heads=2,
                       linear_units=32, num_blocks=2, dropout_rate=0.0,
                       left_len=16, cur_len=16, right_len=16, hop_len=16)
    rng = np.random.default_rng(0)
    T = 128
    x = jnp.asarray(rng.standard_normal((1, T, 80)), jnp.float32)
    x_len = jnp.asarray([T], jnp.int32)
    vars_ = enc.init(jax.random.PRNGKey(0), x, x_len)
    full, full_len = enc.apply(vars_, x, x_len)

    from lasr_tpu.modules.streaming import _chunk_grid
    n = _chunk_grid(T, 16, 16, 16)
    x_pad = jnp.pad(x, ((0, 0), (0, 16 + 6 + 16), (0, 0)))
    mems = enc.apply(vars_, 1, method=ChunkEncoder.init_stream_state)
    outs = []
    for c in range(n):
        chunk = x_pad[:, c * 16: c * 16 + 16 + 16 + 6]
        out, mems = enc.apply(vars_, chunk, c, mems, x_len,
                              method=ChunkEncoder.encode_chunk)
        outs.append(out)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc[0, : int(full_len[0])]),
                               np.asarray(full[0, : int(full_len[0])]),
                               atol=1e-5)


def test_dual_encoder_forward_per_chunk():
    """Per-chunk incremental inference: a single whole-utterance call equals
    forward_online exactly; multi-call streaming is consistent in shape and
    matches on all but the conv boundary frames (same artifact as the
    reference, which also convolves only the unseen tail)."""
    enc = DualTransformerEncoder(idim=20, attention_dim=16, attention_heads=2,
                                 attention_chunk=4, linear_units=32,
                                 num_blocks=2, dropout_rate=0.0,
                                 input_layer="conv2d")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 128, 20)), jnp.float32)
    x_len = jnp.asarray([128], jnp.int32)
    vars_ = enc.init(jax.random.PRNGKey(1), x, x_len)

    full_on, on_len = enc.apply(vars_, x, x_len, method=enc.forward_online)

    # single-shot per-chunk == forward_online
    once, caches = enc.apply(vars_, x, None, method=enc.forward_per_chunk)
    n = int(on_len[0])
    np.testing.assert_allclose(np.asarray(once[0, :n]),
                               np.asarray(full_on[0, :n]), atol=1e-5)

    # streaming in two calls: shapes add up, overlap region finite
    half, caches = enc.apply(vars_, x[:, :64], None,
                             method=enc.forward_per_chunk)
    rest, caches = enc.apply(vars_, x, caches, method=enc.forward_per_chunk)
    assert half.shape[1] + rest.shape[1] >= n
    assert np.all(np.isfinite(np.asarray(rest)))


def test_streaming_recognizer_matches_offline_greedy():
    """Feeding audio in small chunks must reproduce the full-utterance
    streaming-encoder greedy decode."""
    from lasr_tpu.decode.greedy import ctc_greedy_decode
    from lasr_tpu.decode.online import StreamingRecognizer
    from lasr_tpu.data.frontend import DeviceFrontend

    model = E2E_Transformer_CTC_Online(
        idim=80, odim=11,
        encoder_attention_dim=16, encoder_attention_heads=2,
        encoder_left_chunk=16, encoder_center_chunk=16,
        encoder_right_chunk=16,
        encoder_linear_units=32, encoder_num_blocks=1,
        decoder_attention_dim=16, decoder_self_attention_heads=2,
        decoder_src_attention_heads=2, decoder_linear_units=32,
        decoder_num_block=1, encoder_dropout_rate=0.0,
        decoder_dropout_rate=0.0, ctc_dropout=0.0)
    rng = np.random.default_rng(0)
    n = 16000
    wav = (0.2 * np.sin(2 * np.pi * 440 * np.arange(n) / 16000)
           + 0.02 * rng.standard_normal(n)).astype(np.float32)

    fe = DeviceFrontend(["fbank:80"])
    feats, feat_len = fe(jnp.asarray(wav[None]),
                         jnp.asarray([n], jnp.int32))
    vars_ = model.init(jax.random.PRNGKey(0), feats, feat_len,
                       jnp.ones((1, 3), jnp.int32))
    hs, hs_len = model.apply(vars_, feats, feat_len,
                             method=model.encode_online)
    logits = model.apply(vars_, hs, method=model.ctc_logits)
    want = ctc_greedy_decode(logits, hs_len)[0]

    rec = StreamingRecognizer(model, vars_)
    got = []
    for lo in range(0, n, 3333):  # ragged streaming chunks
        got += rec.accept_waveform(wav[lo: lo + 3333])
    tokens, _ = rec.finalize()
    assert tokens == want, (tokens, want)


def test_online_beam_matches_reference_tctc():
    """online=True must reproduce the reference decode_feat_online: the
    truncated (TCTC) CTC prefix scoring, online end detection, and the
    final full-length CTC rescore — tokens AND scores, validated against
    a dict-based replica driving the ACTUAL reference TCTCPrefixScore."""
    from lasr_tpu.decode.beam import CTCAttBeamDecoder
    from tests.ref_beam_online import ref_online_beam_search
    model = E2E_Transformer_CTC_Online(
        idim=80, odim=11,
        encoder_attention_dim=16, encoder_attention_heads=2,
        encoder_left_chunk=16, encoder_center_chunk=16,
        encoder_right_chunk=16,
        encoder_linear_units=32, encoder_num_blocks=1,
        decoder_attention_dim=16, decoder_self_attention_heads=2,
        decoder_src_attention_heads=2, decoder_linear_units=32,
        decoder_num_block=1, encoder_dropout_rate=0.0,
        decoder_dropout_rate=0.0, ctc_dropout=0.0,
        decoder_src_attention_sigmoid_noise=0.0)
    # random init gives near-uniform posteriors: every beam-length-maxlen
    # hypothesis is CTC-infeasible and the whole beam ties at ~w*LOG0 (the
    # reference's own numpy loop emits logaddexp-NaN warnings there), so
    # 1-best becomes tie-order noise.  Brief training makes the search
    # well-posed (peaked posteriors, real margins) — same rationale as the
    # full 120-utt gate in tools/parity_gate.py.
    from tools.parity_gate import make_corpus, pad_feats, train_flax_online
    utts = make_corpus(12, 80, 11, seed=1)
    vars_ = train_flax_online(model, utts, steps=50, seed=1)
    feats_np, flen_np = pad_feats(utts[:2])
    feats = jnp.asarray(feats_np)
    feat_len = jnp.asarray(flen_np, jnp.int32)

    dec = CTCAttBeamDecoder(model, vars_, beam=3, ctc_beam=5,
                            ctc_weight=0.4, online=True)
    out = dec(feats, feat_len)

    for b in range(2):
        ref = ref_online_beam_search(
            model, vars_, feats[b:b + 1], feat_len[b:b + 1],
            beam=3, ctc_beam=5, ctc_weight=0.4)
        assert ref, "reference produced no hypotheses"
        want = ref[0]["yseq"]
        n = int(out.lengths[b, 0])
        got = out.tokens[b, 0, :n].tolist()
        assert got == want, (b, got, want)
        assert out.scores[b, 0] == pytest.approx(ref[0]["score"], abs=3e-3)


def test_streaming_recognizer_beam_partials_match_online_beam():
    """With a beam_decoder attached, finalize() must equal the batch online
    joint beam search over the full utterance, and mid-stream beam partials
    must be produced."""
    from lasr_tpu.decode.beam import CTCAttBeamDecoder
    from lasr_tpu.decode.online import StreamingRecognizer
    from lasr_tpu.data.frontend import DeviceFrontend

    model = E2E_Transformer_CTC_Online(
        idim=80, odim=11,
        encoder_attention_dim=16, encoder_attention_heads=2,
        encoder_left_chunk=16, encoder_center_chunk=16,
        encoder_right_chunk=16,
        encoder_linear_units=32, encoder_num_blocks=1,
        decoder_attention_dim=16, decoder_self_attention_heads=2,
        decoder_src_attention_heads=2, decoder_linear_units=32,
        decoder_num_block=1, encoder_dropout_rate=0.0,
        decoder_dropout_rate=0.0, ctc_dropout=0.0,
        decoder_src_attention_sigmoid_noise=0.0)
    rng = np.random.default_rng(3)
    n = 24000
    wav = (0.2 * np.sin(2 * np.pi * 330 * np.arange(n) / 16000)
           + 0.02 * rng.standard_normal(n)).astype(np.float32)

    fe = DeviceFrontend(["fbank:80"])
    feats, feat_len = fe(jnp.asarray(wav[None]), jnp.asarray([n], jnp.int32))
    vars_ = model.init(jax.random.PRNGKey(0), feats, feat_len,
                       jnp.ones((1, 3), jnp.int32))

    dec = CTCAttBeamDecoder(model, vars_, beam=3, ctc_beam=5,
                            ctc_weight=0.4, online=True)
    want = dec(feats, feat_len).best_ids(0)

    # beam_incremental=False: this pins the LEGACY from-scratch refresh,
    # whose capped re-decode always yields a mid-stream partial — the
    # incremental session instead PAUSES on near-uniform (untrained)
    # posteriors until more frames arrive, by exactness design (greedy
    # partials cover the gap; test_incremental_beam.py pins that mode)
    rec = StreamingRecognizer(model, vars_, beam_decoder=dec,
                              beam_interval=1, beam_bucket=16,
                              beam_incremental=False)
    partials = []
    for lo in range(0, n, 5000):
        rec.accept_waveform(wav[lo: lo + 5000])
        partials.append(rec.partial_result()[0])
    tokens, _ = rec.finalize()
    assert tokens == want, (tokens, want)
    # at least one mid-stream beam partial was produced (beam_interval=1)
    assert rec._beam_tokens is not None
    assert all(isinstance(p, list) for p in partials)


def test_chunk_encoder_layer_major_equals_scan():
    """The layer-major forward (each layer over ALL chunks at once) must
    equal the sequential chunk scan — fwd and grads — including when the
    memory spans multiple previous chunks (left_len > hop_len) and rows
    are ragged.  The memories depend only on each layer's input, so the
    reorder is exact math, not an approximation.

    conv_once=True additionally convolves the full stream once and
    slices chunk rows (same taps, same positional index) — also exact
    math, but the conv's f32 accumulation order changes, so tolerances
    widen to the observed reassociation noise (absolute diffs stay
    ~1e-5-grade at the source; LayerNorm/softmax amplify them through
    the blocks)."""
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 230, 80)), jnp.float32)
    x_len = jnp.asarray([230, 141], jnp.int32)
    for left, conv_once in ((16, False), (32, False), (32, True)):
        kw = dict(idim=80, attention_dim=16, attention_heads=2,
                  linear_units=32, num_blocks=2, dropout_rate=0.0,
                  left_len=left, cur_len=16, right_len=16, hop_len=16)
        scan_enc = ChunkEncoder(layer_major=False, conv_once=False, **kw)
        lm_enc = ChunkEncoder(layer_major=True, conv_once=conv_once, **kw)
        vars_ = scan_enc.init(jax.random.PRNGKey(0), x, x_len)

        outs, lens, grads = [], [], []
        for enc in (scan_enc, lm_enc):
            hs, hs_len = enc.apply(vars_, x, x_len)
            outs.append(np.asarray(hs))
            lens.append(np.asarray(hs_len))

            def loss(params):
                h, _ = enc.apply({"params": params}, x, x_len)
                return jnp.sum(h * h)
            grads.append(jax.grad(loss)(vars_["params"]))
        np.testing.assert_array_equal(lens[0], lens[1])
        out_atol = 5e-3 if conv_once else 1e-5
        g_atol = 2e-4 if conv_once else 3e-5
        g_rtol = 2e-3 if conv_once else 2e-5
        np.testing.assert_allclose(outs[0], outs[1], atol=out_atol)
        for path, (a, b) in zip(
                jax.tree_util.tree_flatten_with_path(grads[0])[0],
                zip(jax.tree_util.tree_leaves(grads[0]),
                    jax.tree_util.tree_leaves(grads[1]))):
            # rtol: the layer-major GEMMs batch all chunks into one
            # contraction — a different f32 accumulation order than the
            # scan's per-chunk GEMMs
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=g_rtol, atol=g_atol,
                err_msg=f"left={left} conv_once={conv_once} "
                        + jax.tree_util.keystr(path[0]))


def test_chunk_encoder_layer_major_ref_tail_and_dropout():
    """ref_tail lengths are scan-identical, and the training
    (non-deterministic) path runs and differentiates under layer_major —
    the dropout RNG pattern differs from the scan (one draw over all
    chunks vs per-chunk splits), which is a distribution-level
    equivalence, so only the deterministic forward is bit-compared."""
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((2, 200, 80)), jnp.float32)
    x_len = jnp.asarray([200, 90], jnp.int32)
    kw = dict(idim=80, attention_dim=16, attention_heads=2,
              linear_units=32, num_blocks=2, dropout_rate=0.3,
              left_len=16, cur_len=16, right_len=16, hop_len=16)
    scan_enc = ChunkEncoder(layer_major=False, **kw)
    lm_enc = ChunkEncoder(layer_major=True, **kw)
    vars_ = scan_enc.init(jax.random.PRNGKey(0), x, x_len)
    a = scan_enc.apply(vars_, x, x_len, True, True)
    b = lm_enc.apply(vars_, x, x_len, True, True)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                               atol=1e-5)

    def loss(params):
        h, _ = lm_enc.apply({"params": params}, x, x_len,
                            deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(7)})
        return jnp.sum(h * h)
    g = jax.grad(loss)(vars_["params"])
    assert all(np.all(np.isfinite(np.asarray(v)))
               for v in jax.tree_util.tree_leaves(g))


def test_chunk_encoder_layer_major_row_cap_equals_unbounded():
    """layer_major_rows groups the attention+FF tail into remat'd row
    slices (bounds peak HBM at recipe-scale duration buckets); the tail
    is row-independent once the memory view is gathered, so any cap —
    including ones that leave a ragged, wrap-padded last group — must be
    numerics-identical to the unbounded layer-major forward, fwd and
    grads, with and without the per-layer remat flag."""
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((3, 230, 80)), jnp.float32)
    x_len = jnp.asarray([230, 141, 96], jnp.int32)
    kw = dict(idim=80, attention_dim=16, attention_heads=2,
              linear_units=32, num_blocks=2, dropout_rate=0.0,
              left_len=32, cur_len=16, right_len=16, hop_len=16)
    base = ChunkEncoder(layer_major=True, **kw)
    vars_ = base.init(jax.random.PRNGKey(0), x, x_len)
    ref_hs, ref_len = base.apply(vars_, x, x_len)

    def loss_of(enc):
        def loss(params):
            h, _ = enc.apply({"params": params}, x, x_len)
            return jnp.sum(h * h)
        return loss

    ref_grad = jax.grad(loss_of(base))(vars_["params"])
    # n·B = 3·n_chunks rows; cap 5 → ragged wrap-padded final group,
    # cap 8 with remat → the rehearsal configuration's structure
    for cap, remat in ((5, False), (8, True)):
        enc = ChunkEncoder(layer_major=True, layer_major_rows=cap,
                           remat=remat, **kw)
        hs, hs_len = enc.apply(vars_, x, x_len)
        np.testing.assert_array_equal(np.asarray(ref_len),
                                      np.asarray(hs_len))
        np.testing.assert_allclose(np.asarray(ref_hs), np.asarray(hs),
                                   atol=1e-5)
        g = jax.grad(loss_of(enc))(vars_["params"])
        for path, (a, b) in zip(
                jax.tree_util.tree_flatten_with_path(ref_grad)[0],
                zip(jax.tree_util.tree_leaves(ref_grad),
                    jax.tree_util.tree_leaves(g))):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=3e-5,
                err_msg=f"cap={cap} remat={remat} "
                        + jax.tree_util.keystr(path[0]))

    # the training (dropout) path runs and differentiates under row caps
    drop = ChunkEncoder(layer_major=True, layer_major_rows=5,
                        **{**kw, "dropout_rate": 0.3})
    def dloss(params):
        h, _ = drop.apply({"params": params}, x, x_len,
                          deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(7)})
        return jnp.sum(h * h)
    g = jax.grad(dloss)(vars_["params"])
    assert all(np.all(np.isfinite(np.asarray(v)))
               for v in jax.tree_util.tree_leaves(g))
