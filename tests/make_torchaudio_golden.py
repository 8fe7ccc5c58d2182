"""Generate torchaudio fbank golden fixtures (run where torchaudio exists).

This image has no torchaudio and zero egress (BASELINE.md "fbank golden
status"), so the <1e-3 gate is tested against tests/kaldi_fbank_ref.py (an
independent float64 re-derivation).  Whenever a torchaudio-equipped
machine is available, run

    python tests/make_torchaudio_golden.py

and commit the resulting tests/golden/torchaudio_fbank.npz;
tests/test_fbank.py picks it up automatically and adds the captured-golden
comparison the round-1 VERDICT asked for.  The case matrix stresses the
known divergence risks: lengths around frame boundaries, near-silence
(log floor), clipping, and an 8k→16k resampled input.

Reference transform: lasr/data/datatrans.py:75-102 — wave scaled by 2^15,
dither=0, 25 ms / 10 ms, 80 mels, povey window, snip_edges default.
"""

import os

import numpy as np


def cases():
    rng = np.random.default_rng(123)
    t = lambda n: np.arange(n) / 16000.0
    out = {}
    # frame-boundary lengths: 400 (1 frame), 559/560/561, a prime, 2s+137
    for n in (400, 559, 560, 561, 7919, 32137):
        x = (0.4 * np.sin(2 * np.pi * 220 * t(n))
             + 0.1 * rng.standard_normal(n))
        out[f"len{n}"] = np.clip(x, -1, 1).astype(np.float32)
    out["silence"] = np.zeros(4000, np.float32)
    out["near_silence"] = (1e-6 * rng.standard_normal(4000)).astype(np.float32)
    x = 2.0 * np.sin(2 * np.pi * 300 * t(8000))
    out["clipped"] = np.clip(x, -1, 1).astype(np.float32)
    # 8k content resampled to 16k (band-limited input)
    from lasr_tpu.data.resample import resample_kaiser
    x8 = (0.5 * np.sin(2 * np.pi * 220 * np.arange(8000) / 8000.0)
          + 0.1 * rng.standard_normal(8000)).astype(np.float32)
    out["resampled_8k"] = resample_kaiser(np.clip(x8, -1, 1),
                                          8000, 16000).astype(np.float32)
    return out


def main():
    import torchaudio
    import torch
    golden = {}
    for name, wav in cases().items():
        feats = torchaudio.compliance.kaldi.fbank(
            torch.from_numpy(wav * (1 << 15))[None, :],
            num_mel_bins=80, dither=0.0, energy_floor=0.0,
            frame_length=25.0, frame_shift=10.0, sample_frequency=16000,
            window_type="povey")
        golden[f"wav_{name}"] = wav
        golden[f"fbank_{name}"] = feats.numpy().astype(np.float32)
    dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "golden", "torchaudio_fbank.npz")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    np.savez_compressed(dst, **golden)
    print(f"wrote {dst}: {sorted(golden)}")


if __name__ == "__main__":
    main()
