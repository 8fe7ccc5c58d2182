"""Learnable synthetic speech corpus: structured transcripts, deterministic
audio (VERDICT round-3 item 1).

The round-3 rehearsal corpus (tools/recipe_rehearsal.py) proved pipeline
soundness but not learnability: 3000-word lexicon, uniform-random word
sequences, one fixed speaking rate.  This generator is built so a competent
recipe-scale model CAN reach near-zero WER — the accuracy proof the
reference implies with "run run.sh, get a usable WER"
(/root/reference/example/asr_en/run.sh:11-28) but that zero egress blocks
on real corpora:

* **Closed ~300-word lexicon** (3-8 letters) — every dev word is seen in
  training, so WER is bounded only by the model.
* **Bigram-Markov transcripts** — each word has a small successor set
  (branching factor ~8 of 300), giving the attention decoder real LM
  structure to exploit, unlike the round-3 uniform-random strings.
* **Deterministic letter→tone acoustics** — each letter A-Z is a fixed
  two-harmonic tone (log-spaced 200-3400 Hz fundamentals); a word is its
  letters' tones concatenated; the audio is a pure function of the
  transcript plus the controlled nuisance parameters below, so the mapping
  is learnable in principle to WER 0.
* **Speaker-style variation** — per-utterance speaking rate (letter
  duration 50-75 ms), loudness, small global pitch offset (±3%, safely
  under the 12% inter-letter tone spacing), per-letter random phase, and
  additive noise at 22-34 dB SNR.  The model must generalize across these,
  not memorize waveforms.

Shared by tools/convergence_run.py (the recipe-scale steps-to-WER driver)
and tests/test_synth_corpus.py.
"""

from __future__ import annotations

import os

import numpy as np

SR = 16000
GAP_MS = 80            # inter-word silence
N_SUCC = 8             # bigram branching factor


def letter_freq(ch: str) -> float:
    """26 fundamentals spread 200..3400 Hz on a log scale (ratio ~1.12
    between neighbours — distinct under the ±3% speaker pitch offset)."""
    i = ord(ch) - ord("A")
    return 200.0 * (3400.0 / 200.0) ** (i / 25.0)


def make_lexicon(n_words: int = 300, seed: int = 11) -> list[str]:
    rng = np.random.default_rng(seed)
    letters = np.array(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ"))
    words = set()
    while len(words) < n_words:
        words.add("".join(letters[rng.integers(0, 26,
                                               int(rng.integers(3, 9)))]))
    return sorted(words)


def make_bigram(n_words: int, seed: int = 12) -> np.ndarray:
    """(n_words, N_SUCC) successor table: word i may be followed only by
    bigram[i] — the LM structure the decoder can learn."""
    rng = np.random.default_rng(seed)
    return np.stack([rng.choice(n_words, N_SUCC, replace=False)
                     for _ in range(n_words)])


def sample_transcript(lexicon, bigram, rng) -> list[str]:
    k = int(rng.integers(4, 11))
    ids = [int(rng.integers(0, len(lexicon)))]
    for _ in range(k - 1):
        ids.append(int(bigram[ids[-1]][rng.integers(0, N_SUCC)]))
    return [lexicon[i] for i in ids]


def utter_wave(words: list[str], rng) -> np.ndarray:
    """Deterministic-from-transcript audio under speaker-style nuisances."""
    letter_ms = float(rng.uniform(50.0, 75.0))      # speaking rate
    pitch = float(rng.uniform(0.97, 1.03))          # global pitch offset
    amp = float(rng.uniform(0.15, 0.35))            # loudness
    seg = int(SR * letter_ms / 1000)
    t = np.arange(seg) / SR
    env = np.hanning(seg)
    gap = np.zeros(int(SR * GAP_MS / 1000))
    parts = []
    for w in words:
        for c in w:
            f = letter_freq(c) * pitch
            tone = (np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
                    + 0.5 * np.sin(2 * np.pi * 2 * f * t
                                   + rng.uniform(0, 2 * np.pi)))
            parts.append(amp * env * tone)
        parts.append(gap)
    wav = np.concatenate(parts)
    snr_db = float(rng.uniform(22.0, 34.0))
    sigma = float(np.sqrt(np.mean(wav ** 2))) * 10 ** (-snr_db / 20)
    return wav + sigma * rng.standard_normal(len(wav))


def gen_corpus(root: str, n_utt: int, lexicon, bigram, seed: int):
    """Write n_utt FLAC utterances + wav.scp/text; returns transcripts."""
    from lasr_tpu.data.flac import write_flac
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    scp, txt, lines = [], [], []
    for i in range(n_utt):
        words = sample_transcript(lexicon, bigram, rng)
        wav = utter_wave(words, rng)
        uid = f"spk1-{seed}{i:05d}"
        p = os.path.join(root, uid + ".flac")
        # write_flac takes FLOAT [-1,1] and scales to PCM itself (passing
        # int16 here binarizes the audio — the round-3 rehearsal bug)
        write_flac(p, np.clip(wav, -1.0, 1.0), SR)
        scp.append(f"{uid} {p}")
        txt.append(f"{uid} {' '.join(words)}")
        lines.append(" ".join(words))
    with open(os.path.join(root, "wav.scp"), "w") as f:
        f.write("\n".join(scp) + "\n")
    with open(os.path.join(root, "text"), "w") as f:
        f.write("\n".join(txt) + "\n")
    return lines
