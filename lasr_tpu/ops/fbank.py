"""Kaldi-compatible log-mel filterbank frontend — batched, jittable, TPU-first.

First-party replacement for the reference's torchaudio C++ frontend
(``lasr/data/datatrans.py:42-104`` calls ``torchaudio.compliance.kaldi.fbank``
with dither=0, 25ms/10ms povey frames, 80 mels, wave pre-scaled by 2^15).
The acceptance bar is <1e-3 max-abs parity with Kaldi fbank (BASELINE.md).

TPU-first design: the reference runs this per-utterance on 16 dataloader CPU
processes; here the whole padded batch runs on-device inside the jitted train
step. Instead of an FFT, the real DFT is expressed as two f32 matmuls
(frames @ cos/sin bases) followed by the mel projection matmul — all three
land on the MXU, and XLA fuses the elementwise framing/window/preemphasis
chain into them.  For a 512-point transform the DFT matrix is 400x257 —
far below MXU saturation, so the matmul formulation beats an on-device FFT
and keeps the op trivially batchable.

Algorithm parity notes (Kaldi src/feat/feature-window.cc + mel-computations.cc):
  - snip_edges=True framing: F = 1 + (S - 400) // 160, frame i starts at 160*i
  - remove_dc_offset per frame, then preemphasis with the first sample
    replicated (x[0]-0.97*x[0] at n=0)
  - povey window = hann ** 0.85 over window_size samples (periodic=False)
  - zero-pad 400 → 512 (round_to_power_of_two), power spectrum
  - mel banks on fft-bin centers, low=20Hz, high=nyquist; the nyquist bin
    column is zero (torchaudio pads the 257th column with 0)
  - log(max(mel, FLT_EPSILON))
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_FLT_EPS = float(np.finfo(np.float32).eps)  # Kaldi's std::numeric_limits<float>::epsilon()


def _round_up_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


@dataclass(frozen=True)
class KaldiFbankConfig:
    sample_frequency: float = 16000.0
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    num_mel_bins: int = 80
    low_freq: float = 20.0
    high_freq: float = 0.0          # <=0: offset from nyquist
    preemphasis_coefficient: float = 0.97
    remove_dc_offset: bool = True
    round_to_power_of_two: bool = True
    window_type: str = "povey"
    blackman_coeff: float = 0.42
    use_power: bool = True
    use_log_fbank: bool = True
    snip_edges: bool = True
    audio_scale: float = 32768.0    # reference scales float wave by 2^(bits-1)

    @property
    def window_size(self) -> int:
        return int(self.sample_frequency * self.frame_length_ms / 1000.0)

    @property
    def window_shift(self) -> int:
        return int(self.sample_frequency * self.frame_shift_ms / 1000.0)

    @property
    def padded_window_size(self) -> int:
        return _round_up_pow2(self.window_size) if self.round_to_power_of_two else self.window_size


def fbank_num_frames(num_samples, cfg: KaldiFbankConfig = KaldiFbankConfig()):
    """Frame count under snip_edges framing; works on ints or arrays."""
    ws, sh = cfg.window_size, cfg.window_shift
    if isinstance(num_samples, (int, np.integer)):
        return 0 if num_samples < ws else 1 + (num_samples - ws) // sh
    n = 1 + (num_samples - ws) // sh
    return jnp.where(num_samples < ws, 0, n).astype(jnp.int32)


def _feature_window(cfg: KaldiFbankConfig) -> np.ndarray:
    n = cfg.window_size
    a = 2.0 * math.pi / (n - 1)
    i = np.arange(n, dtype=np.float64)
    if cfg.window_type == "povey":
        w = (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    elif cfg.window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(a * i)
    elif cfg.window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a * i)
    elif cfg.window_type == "blackman":
        w = (cfg.blackman_coeff - 0.5 * np.cos(a * i)
             + (0.5 - cfg.blackman_coeff) * np.cos(2 * a * i))
    elif cfg.window_type == "rectangular":
        w = np.ones(n)
    else:
        raise ValueError(f"unknown window type {cfg.window_type!r}")
    return w


def _mel_scale(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def mel_banks(cfg: KaldiFbankConfig) -> np.ndarray:
    """Kaldi triangular mel filterbank, shape (num_mel_bins, n_fft//2 + 1).

    The last (nyquist) column is zero, matching torchaudio's zero-padding of
    the (num_bins, num_fft_bins) matrix to num_fft_bins+1 columns.
    """
    n_fft = cfg.padded_window_size
    num_fft_bins = n_fft // 2
    nyquist = 0.5 * cfg.sample_frequency
    high_freq = cfg.high_freq if cfg.high_freq > 0.0 else nyquist + cfg.high_freq
    if not (0.0 <= cfg.low_freq < nyquist and cfg.low_freq < high_freq <= nyquist):
        raise ValueError(f"bad frequency range [{cfg.low_freq}, {high_freq}]")

    fft_bin_width = cfg.sample_frequency / n_fft
    mel_low = _mel_scale(cfg.low_freq)
    mel_high = _mel_scale(high_freq)
    mel_delta = (mel_high - mel_low) / (cfg.num_mel_bins + 1)

    bin_idx = np.arange(cfg.num_mel_bins, dtype=np.float64)[:, None]
    left = mel_low + bin_idx * mel_delta
    center = mel_low + (bin_idx + 1.0) * mel_delta
    right = mel_low + (bin_idx + 2.0) * mel_delta

    fft_mels = _mel_scale(fft_bin_width * np.arange(num_fft_bins, dtype=np.float64))[None, :]
    up = (fft_mels - left) / (center - left)
    down = (right - fft_mels) / (right - center)
    banks = np.maximum(0.0, np.minimum(up, down))
    out = np.zeros((cfg.num_mel_bins, num_fft_bins + 1), dtype=np.float64)
    out[:, :num_fft_bins] = banks
    return out


def _rdft_bases(cfg: KaldiFbankConfig) -> tuple[np.ndarray, np.ndarray]:
    """cos/sin bases (window_size, n_fft//2+1) for the zero-padded real DFT.

    Only the first ``window_size`` rows of the padded frame are nonzero, so
    the bases need only that many rows.  Angles are reduced mod n_fft in
    exact integer arithmetic before the float cos/sin to keep f32 accuracy.
    """
    n_fft = cfg.padded_window_size
    n = np.arange(cfg.window_size, dtype=np.int64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.int64)[None, :]
    phase = (n * k) % n_fft
    ang = 2.0 * math.pi * phase.astype(np.float64) / n_fft
    return np.cos(ang), -np.sin(ang)


@partial(jax.jit, static_argnames=("cfg", "max_frames"))
def log_mel_fbank(wav: jnp.ndarray, wav_len: jnp.ndarray,
                  cfg: KaldiFbankConfig = KaldiFbankConfig(),
                  max_frames: int | None = None):
    """Batched Kaldi log-mel fbank.

    Args:
      wav: (B, S) float32 waveform in [-1, 1] (soundfile scale; scaled by
        ``cfg.audio_scale`` internally, matching datatrans.py:73-74).
      wav_len: (B,) int32 valid sample counts.
      cfg: static config.
      max_frames: optional static output frame capacity (defaults to the
        frame count of S).

    Returns:
      feats: (B, F, num_mel_bins) float32, zero past each utterance's length.
      feat_len: (B,) int32 valid frame counts.
    """
    B, S = wav.shape
    ws, sh = cfg.window_size, cfg.window_shift
    F = fbank_num_frames(S, cfg)
    if max_frames is not None:
        F = min(F, max_frames)
    if F <= 0:
        raise ValueError(f"waveform too short for one frame: {S} < {ws}")

    x = wav.astype(jnp.float32) * cfg.audio_scale

    # Framing without gathers (gathers are slow on TPU): view the signal as
    # shift-sized blocks and build each ws-sample frame from ceil(ws/sh)
    # consecutive blocks via pure reshape/slice/concat.
    n_blocks_needed = F + (ws + sh - 1) // sh
    pad_to = n_blocks_needed * sh
    xp = jnp.pad(x, ((0, 0), (0, max(0, pad_to - S))))
    blocks = xp[:, : n_blocks_needed * sh].reshape(B, n_blocks_needed, sh)
    pieces = []
    covered = 0
    k = 0
    while covered < ws:
        take = min(sh, ws - covered)
        pieces.append(blocks[:, k: k + F, :take])
        covered += take
        k += 1
    frames = jnp.concatenate(pieces, axis=-1)  # (B, F, ws)

    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    if cfg.preemphasis_coefficient != 0.0:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - cfg.preemphasis_coefficient * prev

    window = jnp.asarray(_feature_window(cfg), dtype=jnp.float32)
    frames = frames * window

    # Real DFT as two f32 matmuls on the MXU (exact-precision path).
    cos_b, sin_b = _rdft_bases(cfg)
    cos_b = jnp.asarray(cos_b, dtype=jnp.float32)
    sin_b = jnp.asarray(sin_b, dtype=jnp.float32)
    re = jnp.einsum("bfw,wk->bfk", frames, cos_b,
                    precision=jax.lax.Precision.HIGHEST)
    im = jnp.einsum("bfw,wk->bfk", frames, sin_b,
                    precision=jax.lax.Precision.HIGHEST)
    spec = re * re + im * im
    if not cfg.use_power:
        spec = jnp.sqrt(spec)

    mel = jnp.asarray(mel_banks(cfg).T, dtype=jnp.float32)  # (K, M)
    feats = jnp.einsum("bfk,km->bfm", spec, mel,
                       precision=jax.lax.Precision.HIGHEST)
    if cfg.use_log_fbank:
        feats = jnp.log(jnp.maximum(feats, _FLT_EPS))

    feat_len = fbank_num_frames(wav_len, cfg)
    feat_len = jnp.minimum(feat_len, F)
    valid = jnp.arange(F, dtype=jnp.int32)[None, :] < feat_len[:, None]
    feats = jnp.where(valid[..., None], feats, 0.0)
    return feats, feat_len


def peak_normalize(wav: jnp.ndarray) -> jnp.ndarray:
    """Per-utterance peak normalization, the reference's ``norm`` transform
    (datatrans.py:22-27). Zero padding does not change max|x|, so this is
    safe on padded batches."""
    peak = jnp.max(jnp.abs(wav), axis=-1, keepdims=True)
    return wav / (peak + 1e-9)
