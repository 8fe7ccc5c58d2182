"""Independent numpy (float64) reference for Kaldi fbank.

Implements the Kaldi feature-extraction algorithm (src/feat/feature-window.cc
and src/feat/mel-computations.cc, as exposed by
torchaudio.compliance.kaldi.fbank, which the reference repo calls at
lasr/data/datatrans.py:42-104).  torchaudio is not installed in this image,
so this file serves as the golden model for tests/test_fbank.py: it is a
*separate code path* from lasr_tpu/ops/fbank.py — np.fft.rfft in float64 vs
an f32 DFT-matmul on device — so agreement to <1e-3 validates both the
algorithm and the on-device numerics.
"""

import numpy as np


def kaldi_fbank_ref(wav: np.ndarray, *, sample_freq=16000.0, frame_length_ms=25.0,
                    frame_shift_ms=10.0, num_mel_bins=80, low_freq=20.0,
                    high_freq=0.0, preemph=0.97, remove_dc=True,
                    window_type="povey", audio_scale=32768.0) -> np.ndarray:
    """wav: 1-D float waveform in [-1, 1]. Returns (F, num_mel_bins) float64."""
    x = wav.astype(np.float64) * audio_scale
    ws = int(sample_freq * frame_length_ms / 1000.0)
    sh = int(sample_freq * frame_shift_ms / 1000.0)
    n_fft = 1 << (ws - 1).bit_length()
    num_frames = 1 + (len(x) - ws) // sh
    assert num_frames > 0

    frames = np.stack([x[i * sh: i * sh + ws] for i in range(num_frames)])
    if remove_dc:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if preemph != 0.0:
        prev = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - preemph * prev

    i = np.arange(ws)
    a = 2 * np.pi / (ws - 1)
    if window_type == "povey":
        win = (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    elif window_type == "hanning":
        win = 0.5 - 0.5 * np.cos(a * i)
    else:
        raise ValueError(window_type)
    frames = frames * win

    padded = np.zeros((num_frames, n_fft))
    padded[:, :ws] = frames
    spec = np.abs(np.fft.rfft(padded, axis=1)) ** 2  # (F, n_fft//2+1)

    # mel banks
    nyq = sample_freq / 2
    hi = high_freq if high_freq > 0 else nyq + high_freq
    mel = lambda f: 1127.0 * np.log(1.0 + np.asarray(f) / 700.0)
    mlo, mhi = mel(low_freq), mel(hi)
    delta = (mhi - mlo) / (num_mel_bins + 1)
    nbins = n_fft // 2
    fft_mels = mel(np.arange(nbins) * sample_freq / n_fft)
    banks = np.zeros((num_mel_bins, nbins + 1))
    for b in range(num_mel_bins):
        left, center, right = mlo + b * delta, mlo + (b + 1) * delta, mlo + (b + 2) * delta
        up = (fft_mels - left) / (center - left)
        down = (right - fft_mels) / (right - center)
        banks[b, :nbins] = np.maximum(0.0, np.minimum(up, down))

    feats = spec @ banks.T
    return np.log(np.maximum(feats, np.finfo(np.float32).eps))
