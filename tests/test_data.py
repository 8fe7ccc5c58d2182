"""Data layer tests: WAV IO, tokenizers, dataset batching, s2s packing."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lasr_tpu.data import reader
from lasr_tpu.data.dataset import AudioDataSet, BatchAudioDataSet, round_up
from lasr_tpu.data.frontend import DeviceFrontend, pack_s2s
from lasr_tpu.data.tokenizer import CharTokenizer, BaseTokenizer


@pytest.fixture(scope="module")
def toy_corpus(tmp_path_factory):
    """10-utterance synthetic corpus (wav.scp + text + dict)."""
    root = tmp_path_factory.mktemp("toy")
    rng = np.random.default_rng(0)
    words = ["GO", "STOP", "LEFT", "RIGHT", "UP"]
    scp, txt = [], []
    for i in range(10):
        dur = rng.uniform(0.45, 1.2)
        n = int(dur * 16000)
        t = np.arange(n) / 16000.0
        wav = 0.3 * np.sin(2 * np.pi * (150 + 40 * i) * t) \
            + 0.05 * rng.standard_normal(n)
        path = root / f"utt{i:02d}.wav"
        reader.write_wav(str(path), wav, 16000)
        scp.append(f"utt{i:02d} {path}")
        txt.append(f"utt{i:02d} {' '.join(rng.choice(words, rng.integers(1, 4)))}")
    (root / "wav.scp").write_text("\n".join(scp) + "\n")
    (root / "text").write_text("\n".join(txt) + "\n")
    chars = sorted({c for w in words for c in w} | {" "})
    (root / "dict.txt").write_text("\n".join(chars) + "\n")
    return root


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    wav = rng.uniform(-0.9, 0.9, 4321)
    p = str(tmp_path / "x.wav")
    reader.write_wav(p, wav, 16000)
    got, sr = reader.read_wav(p)
    assert sr == 16000 and len(got) == 4321
    np.testing.assert_allclose(got, wav, atol=1.0 / 16000)
    assert abs(reader.get_audio_duration(p) - 4321 / 16000) < 1e-9
    assert reader.get_audio_samplerate(p) == 16000


def test_wav_stereo_and_avgchannel(tmp_path):
    wav = np.stack([np.ones(100) * 0.5, np.zeros(100)], axis=1)
    p = str(tmp_path / "st.wav")
    reader.write_wav(p, wav, 8000)
    got, sr = reader.read_wav(p)
    assert got.shape == (100, 2)
    mono = reader.average_channels(got)
    np.testing.assert_allclose(mono, 0.25, atol=1e-3)


def test_char_tokenizer(toy_corpus):
    tok = CharTokenizer(str(toy_corpus / "dict.txt"))
    tokens, ids = tok.encode("GO UP")
    assert tokens[0] == "<SOS>" and tokens[-1] == "<EOS>"
    assert ids[0] == 1 and ids[-1] == 2
    assert all(i >= 6 for i in ids[1:-1])  # content ids after specials
    toks2, text = tok.decode(ids, no_special=True)
    assert text == "GO UP"
    assert tok.dict_size() == 6 + len(reader.read_list(str(toy_corpus / "dict.txt")))
    # unknown char → UNK
    _, ids3 = tok.encode("Z", add_sos_eos=False)
    assert ids3 == [BaseTokenizer.ID_VALUE_UNK]


def test_audio_dataset_load(toy_corpus):
    tok = CharTokenizer(str(toy_corpus / "dict.txt"))
    ds = AudioDataSet(wav_list=str(toy_corpus / "wav.scp"),
                      text_list=str(toy_corpus / "text"),
                      tokenizer=tok, audio_trans=["norm", "fbank:80"])
    ds.load_check_data()
    assert len(ds) == 10
    item = ds[0]
    assert item["wav_len"] > 0 and item["token_len"] > 0


def test_batch_audio_dataset_duration_batching(toy_corpus):
    tok = CharTokenizer(str(toy_corpus / "dict.txt"))
    ds = BatchAudioDataSet(
        wav_list=str(toy_corpus / "wav.scp"), text_list=str(toy_corpus / "text"),
        tokenizer=tok, audio_trans=["norm", "fbank:80"],
        batch_type="duration", batch_duration=2.0, min_duration=0.0,
        text_freq=0.0, batch_pad_multiple=4)
    ds.load_check_data()
    assert len(ds) >= 2
    # sorted by length within the epoch
    lens = [it["wav_len"] for it in ds.train_set]
    assert lens == sorted(lens)
    batches = list(ds.batches())
    assert sum(b["n_utts"] for b in batches) == 10
    for b in batches:
        B, S = b["wav_array"].shape
        assert B % 4 == 0
        assert S % 16000 == 0
        assert b["token_id"].shape[1] % 8 == 0
        # dummy rows zero-length
        assert np.all(b["wav_len"][b["n_utts"]:] == 0)


def test_audio_cache_identical_and_skips_decode(toy_corpus):
    """cache_audio_mb: epoch 2 batches equal epoch 1 bit-for-bit while the
    decoder is only consulted once per file; a zero budget caches nothing."""
    tok = CharTokenizer(str(toy_corpus / "dict.txt"))

    def make(mb):
        ds = BatchAudioDataSet(
            wav_list=str(toy_corpus / "wav.scp"),
            text_list=str(toy_corpus / "text"),
            tokenizer=tok, audio_trans=["norm", "fbank:80"],
            batch_type="size", batch_size=4, min_duration=0.0,
            text_freq=0.0, cache_audio_mb=mb)
        ds.load_check_data()
        return ds

    ds = make(64)
    calls = []
    orig = AudioDataSet._decode_waves

    def counting(self, paths):
        calls.extend(paths)
        return orig(self, paths)

    AudioDataSet._decode_waves = counting
    try:
        ep1 = [b["wav_array"].copy() for b in ds.batches(num_workers=1)]
        n_first = len(calls)
        ep2 = [b["wav_array"].copy() for b in ds.batches(num_workers=1)]
        assert len(calls) == n_first == 10      # epoch 2 fully cached
        for a, b in zip(ep1, ep2):
            np.testing.assert_array_equal(a, b)

        # uncached dataset decodes every epoch, same bits
        ds0 = make(0)
        ep1_u = [b["wav_array"].copy() for b in ds0.batches(num_workers=1)]
        assert len(calls) == n_first + 10
        for a, b in zip(ep1, ep1_u):
            np.testing.assert_array_equal(a, b)
    finally:
        AudioDataSet._decode_waves = orig


def test_batches_threaded_order(toy_corpus):
    tok = CharTokenizer(str(toy_corpus / "dict.txt"))
    ds = BatchAudioDataSet(
        wav_list=str(toy_corpus / "wav.scp"), text_list=str(toy_corpus / "text"),
        tokenizer=tok, audio_trans=["fbank:80"], batch_type="size",
        batch_size=3, min_duration=0.0, text_freq=0.0)
    ds.load_check_data()
    seq = [b["id"] for b in ds.batches(num_workers=3)]
    ref = [[it["id"] for it in (lambda g: [ds.train_set[i] for i in g])(grp)]
           for grp in ds.batch_indices()]
    assert seq == ref


def test_device_frontend_and_pack(toy_corpus):
    tok = CharTokenizer(str(toy_corpus / "dict.txt"))
    ds = BatchAudioDataSet(
        wav_list=str(toy_corpus / "wav.scp"), text_list=str(toy_corpus / "text"),
        tokenizer=tok, audio_trans=["norm", "fbank:80", "specaug"],
        batch_type="size", batch_size=4, min_duration=0.0, text_freq=0.0)
    ds.load_check_data()
    batch = next(iter(ds.batches()))
    fe = DeviceFrontend(ds.audio_trans)
    feats, feat_len = fe(jnp.asarray(batch["wav_array"]),
                         jnp.asarray(batch["wav_len"]))
    assert feats.shape[-1] == 80
    assert int(feat_len[0]) > 0
    # train mode applies specaug
    feats_tr, _ = fe(jnp.asarray(batch["wav_array"]),
                     jnp.asarray(batch["wav_len"]),
                     key=jax.random.PRNGKey(0), train=True)
    assert not np.allclose(np.asarray(feats_tr), np.asarray(feats))

    ys_in, att_label, ctc_label = pack_s2s(
        jnp.asarray(batch["token_id"]), jnp.asarray(batch["token_len"]))
    i = 0
    n = int(batch["token_len"][i])
    row_in = np.asarray(ys_in[i])
    assert row_in[0] == 1  # sos
    np.testing.assert_array_equal(row_in[1:n + 1], batch["token_id"][i, :n])
    assert np.all(row_in[n + 1:] == 2)  # eos padding
    row_lab = np.asarray(att_label[i])
    np.testing.assert_array_equal(row_lab[:n], batch["token_id"][i, :n])
    assert row_lab[n] == 2 and np.all(row_lab[n + 1:] == -1)
    row_ctc = np.asarray(ctc_label[i])
    np.testing.assert_array_equal(row_ctc[:n], batch["token_id"][i, :n])
    assert np.all(row_ctc[n:] == -1)


def test_scp_id_mismatch_raises(tmp_path):
    (tmp_path / "wav.scp").write_text("a x.wav\n")
    (tmp_path / "text").write_text("b HELLO\n")
    ds = AudioDataSet(wav_list=str(tmp_path / "wav.scp"),
                      text_list=str(tmp_path / "text"))
    with pytest.raises(RuntimeError):
        ds.load_dataset()


def test_round_up():
    assert round_up(1, 8) == 8
    assert round_up(8, 8) == 8
    assert round_up(9, 8) == 16
    assert round_up(0, 8) == 8


def test_soxspeed_host_transform(toy_corpus):
    tok = CharTokenizer(str(toy_corpus / "dict.txt"))
    ds = BatchAudioDataSet(
        wav_list=str(toy_corpus / "wav.scp"), text_list=str(toy_corpus / "text"),
        tokenizer=tok, audio_trans=["soxspeed", "norm", "fbank:80"],
        batch_type="size", batch_size=10, min_duration=0.0, text_freq=0.0)
    ds.load_check_data()
    np.random.seed(0)
    batch = next(iter(ds.batches(num_workers=1)))
    # lengths perturbed by ~±10% for some utterances
    assert batch["wav_array"].shape[0] >= 8
    # the frontend must accept (and skip) the soxspeed stage
    from lasr_tpu.data.frontend import DeviceFrontend
    fe = DeviceFrontend(ds.audio_trans)
    feats, _ = fe(jnp.asarray(batch["wav_array"]),
                  jnp.asarray(batch["wav_len"]))
    assert feats.shape[-1] == 80


def test_int16_wire_format(toy_corpus):
    """wire_dtype='int16' ships PCM at source precision: WAV-sourced
    batches are BIT-identical after the on-device dequant (the decoder
    itself divides int16 by 32768, reader.py:89), the cache holds int16
    (half the RAM), and the frontend output matches the float32 wire to
    the quantization floor."""
    tok = CharTokenizer(str(toy_corpus / "dict.txt"))

    def make(wire):
        ds = BatchAudioDataSet(
            wav_list=str(toy_corpus / "wav.scp"),
            text_list=str(toy_corpus / "text"),
            tokenizer=tok, audio_trans=["norm", "fbank:80"],
            batch_type="duration", batch_duration=2.0, min_duration=0.0,
            text_freq=0.0, cache_audio_mb=64, wire_dtype=wire)
        ds.load_check_data()
        return ds

    fb = list(make("float32").batches(seed=3))
    qb = list(make("int16").batches(seed=3))
    assert len(fb) == len(qb)
    frontend = DeviceFrontend(["norm", "fbank:80"])
    for a, b in zip(fb, qb):
        assert b["wav_array"].dtype == np.int16
        assert a["wav_array"].dtype == np.float32
        assert b["wav_array"].nbytes * 2 == a["wav_array"].nbytes
        # WAV decode is float(int16)/32768 -> requantization is exact
        deq = b["wav_array"].astype(np.float32) / 32768.0
        np.testing.assert_array_equal(a["wav_array"], deq)
        fa, la = frontend(jnp.asarray(a["wav_array"]),
                          jnp.asarray(a["wav_len"]))
        fq, lq = frontend(jnp.asarray(b["wav_array"]),
                          jnp.asarray(b["wav_len"]))
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lq))
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fq),
                                   atol=1e-4)

    # the int16 cache stores int16
    ds = make("int16")
    _ = list(ds.batches())
    assert all(w.dtype == np.int16 for w in ds._wav_cache.values())

    # soxspeed path: perturbed waves requantize (error bounded by the
    # source quantization floor)
    ds2 = BatchAudioDataSet(
        wav_list=str(toy_corpus / "wav.scp"),
        text_list=str(toy_corpus / "text"),
        tokenizer=tok, audio_trans=["soxspeed", "norm", "fbank:80"],
        batch_type="duration", batch_duration=2.0, min_duration=0.0,
        text_freq=0.0, cache_audio_mb=64, wire_dtype="int16")
    ds2.load_check_data()
    for b in ds2.batches(seed=5):
        assert b["wav_array"].dtype == np.int16

    with pytest.raises(ValueError):
        AudioDataSet(wire_dtype="bf16")
