"""The learnable synthetic corpus (tools/synthspeech.py) really is
learnable: audio is a recoverable deterministic function of the
transcript, transcripts follow the bigram LM, and generation is seeded.

An oracle decoder (STFT peak-picking against the known tone table)
transcribes generated audio back to its letter sequence under every
speaker-style nuisance the generator applies — if a 40-line DSP oracle
reads the letters, a 46M conformer has no information-theoretic excuse
(the convergence driver tools/convergence_run.py relies on this)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from synthspeech import (GAP_MS, N_SUCC, SR, gen_corpus, letter_freq,  # noqa: E402
                         make_bigram, make_lexicon, sample_transcript,
                         utter_wave)


_AZ = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _classify(seg: np.ndarray) -> str:
    """Nearest tone fundamental (log distance) to the zero-padded-FFT
    peak.  The fundamental always beats the generator's 0.5-amplitude
    2nd harmonic, and zero-padding interpolates the peak finely enough to
    split the 12%-spaced low tones that a raw 30 ms FFT bin cannot."""
    n = 1 << 15
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg)), n))
    freqs = np.fft.rfftfreq(n, 1 / SR)
    keep = freqs > 150
    f0 = freqs[keep][np.argmax(spec[keep])]
    table = np.array([letter_freq(c) for c in _AZ])
    return _AZ[int(np.argmin(abs(np.log(f0 / table))))]


def _oracle_letters(wav: np.ndarray) -> str:
    """Recover the letter sequence from generated audio alone.

    Words are separated by GAP_MS silence; within an utterance every
    letter has the same (unknown, 50-75 ms) duration.  Segment words on
    energy, grid-fit the shared letter duration d (with an edge-erosion
    term e — the hanning envelope fades each word's ends below the energy
    threshold), split each word evenly, classify each letter chunk."""
    hop, win = 80, 160
    n = (len(wav) - win) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(win)
    energy = (wav[idx] ** 2).mean(axis=1)
    voiced = energy > 0.02 * np.max(energy)
    words, start = [], None
    min_gap = int(0.6 * GAP_MS / 1000 * SR / hop)
    gap = 0
    for i, v in enumerate(voiced):
        if v:
            if start is None:
                start = i
            gap = 0
        elif start is not None:
            gap += 1
            if gap >= min_gap:
                words.append((start, i - gap + 1))
                start, gap = None, 0
    if start is not None:
        words.append((start, int(np.nonzero(voiced)[0][-1]) + 1))
    lens = np.array([(b - a) * hop for a, b in words], float)
    best = None
    for d in np.arange(0.049, 0.0765, 0.00025) * SR:
        for e in np.arange(0.0, 0.016, 0.002) * SR:
            counts = np.clip(np.round((lens + 2 * e) / d), 3, 8)
            err = np.abs(lens + 2 * e - counts * d).sum()
            if best is None or err < best[0]:
                best = (err, d, e, counts.astype(int))
    _, d, e, counts = best
    out = []
    for (a, _b), cnt in zip(words, counts):
        w0 = a * hop - e
        for j in range(cnt):
            lo = int(w0 + j * d + 0.25 * d)
            hi = int(w0 + j * d + 0.75 * d)
            out.append(_classify(wav[max(lo, 0):hi]))
    return "".join(out)


def test_lexicon_and_bigram_deterministic():
    lex1, lex2 = make_lexicon(300), make_lexicon(300)
    assert lex1 == lex2 and len(lex1) == 300
    assert all(3 <= len(w) <= 8 and w.isupper() for w in lex1)
    bg1, bg2 = make_bigram(300), make_bigram(300)
    assert np.array_equal(bg1, bg2) and bg1.shape == (300, N_SUCC)
    # successor sets are genuinely sparse and duplicate-free
    assert all(len(set(row)) == N_SUCC for row in bg1)


def test_transcripts_follow_bigram():
    lex = make_lexicon(120)
    bg = make_bigram(len(lex))
    idx = {w: i for i, w in enumerate(lex)}
    rng = np.random.default_rng(3)
    for _ in range(50):
        words = sample_transcript(lex, bg, rng)
        assert 4 <= len(words) <= 10
        for a, b in zip(words, words[1:]):
            assert idx[b] in bg[idx[a]]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_oracle_recovers_letters_under_speaker_variation(seed):
    lex = make_lexicon(60)
    bg = make_bigram(len(lex))
    rng = np.random.default_rng(seed)
    words = sample_transcript(lex, bg, rng)
    wav = utter_wave(words, rng)
    assert _oracle_letters(wav) == "".join(words)


def test_gen_corpus_writes_consistent_scp_text(tmp_path):
    from lasr_tpu.data.flac import read_flac
    lex = make_lexicon(40)
    bg = make_bigram(len(lex))
    lines = gen_corpus(str(tmp_path), 5, lex, bg, seed=4)
    scp = dict(l.split(None, 1) for l in
               open(tmp_path / "wav.scp").read().splitlines())
    txt = dict(l.split(None, 1) for l in
               open(tmp_path / "text").read().splitlines())
    assert len(scp) == len(txt) == len(lines) == 5
    for uid, path in scp.items():
        pcm, sr = read_flac(path.strip())
        assert sr == SR
        # the written audio decodes back to exactly the paired transcript
        assert _oracle_letters(np.asarray(pcm, np.float64).reshape(-1)) \
            == txt[uid].replace(" ", "")
