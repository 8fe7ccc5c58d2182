"""fbank parity: on-device DFT-matmul path vs independent float64 FFT golden."""

import numpy as np
import jax.numpy as jnp
import pytest

from lasr_tpu.ops.fbank import (
    KaldiFbankConfig, log_mel_fbank, fbank_num_frames, peak_normalize, mel_banks)
from tests.kaldi_fbank_ref import kaldi_fbank_ref


def _rand_wav(n, seed=0):
    rng = np.random.default_rng(seed)
    # speech-ish signal: tones + noise, in [-1, 1]
    t = np.arange(n) / 16000.0
    sig = (0.4 * np.sin(2 * np.pi * 220 * t)
           + 0.2 * np.sin(2 * np.pi * 1330 * t + 0.7)
           + 0.1 * rng.standard_normal(n))
    return np.clip(sig, -1.0, 1.0).astype(np.float32)


def test_fbank_matches_kaldi_golden():
    wav = _rand_wav(16000 * 2 + 137)
    golden = kaldi_fbank_ref(wav)

    feats, feat_len = log_mel_fbank(
        jnp.asarray(wav)[None, :], jnp.asarray([len(wav)], dtype=jnp.int32))
    got = np.asarray(feats[0, : int(feat_len[0])])

    assert got.shape == golden.shape
    err = np.max(np.abs(got - golden))
    assert err < 1e-3, f"fbank max abs err {err}"


def test_fbank_batched_padding_invariance():
    """An utterance's features must not depend on batch padding."""
    w1 = _rand_wav(16000, seed=1)
    w2 = _rand_wav(24000, seed=2)
    S = 32000
    batch = np.zeros((2, S), dtype=np.float32)
    batch[0, : len(w1)] = w1
    batch[1, : len(w2)] = w2
    lens = jnp.asarray([len(w1), len(w2)], dtype=jnp.int32)

    feats, feat_len = log_mel_fbank(jnp.asarray(batch), lens)
    solo, solo_len = log_mel_fbank(
        jnp.asarray(w1)[None, :], jnp.asarray([len(w1)], dtype=jnp.int32))

    n = int(solo_len[0])
    assert int(feat_len[0]) == n == fbank_num_frames(len(w1))
    np.testing.assert_allclose(
        np.asarray(feats[0, :n]), np.asarray(solo[0, :n]), rtol=0, atol=2e-4)
    # padding region is exactly zero
    assert np.all(np.asarray(feats[0, n:]) == 0.0)


def test_fbank_frame_counts():
    cfg = KaldiFbankConfig()
    assert fbank_num_frames(400, cfg) == 1
    assert fbank_num_frames(399, cfg) == 0
    assert fbank_num_frames(560, cfg) == 2
    assert fbank_num_frames(16000, cfg) == 98


def test_mel_banks_shape_and_nyquist_zero():
    banks = mel_banks(KaldiFbankConfig())
    assert banks.shape == (80, 257)
    assert np.all(banks[:, -1] == 0.0)
    # every filter has positive mass
    assert np.all(banks.sum(axis=1) > 0)


def test_peak_normalize():
    wav = jnp.asarray([[0.0, 0.5, -0.25, 0.0]])
    out = np.asarray(peak_normalize(wav))
    np.testing.assert_allclose(out[0], [0.0, 1.0, -0.5, 0.0], atol=1e-6)


def test_fbank_matches_captured_torchaudio_golden():
    """Runs only when tests/golden/torchaudio_fbank.npz exists (generated
    by tests/make_torchaudio_golden.py on a torchaudio-equipped machine;
    this image has no torchaudio and no egress — see BASELINE.md)."""
    import os
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "torchaudio_fbank.npz")
    if not os.path.exists(path):
        pytest.skip("no captured torchaudio golden in this image")
    data = np.load(path)
    names = sorted(k[len("wav_"):] for k in data.files
                   if k.startswith("wav_"))
    assert names
    for name in names:
        wav = data[f"wav_{name}"]
        want = data[f"fbank_{name}"]
        feats, feat_len = log_mel_fbank(
            jnp.asarray(wav)[None, :],
            jnp.asarray([len(wav)], dtype=jnp.int32))
        got = np.asarray(feats[0, : int(feat_len[0])])
        assert got.shape == want.shape, (name, got.shape, want.shape)
        err = np.max(np.abs(got - want)) if want.size else 0.0
        assert err < 1e-3, f"{name}: max abs err {err}"
