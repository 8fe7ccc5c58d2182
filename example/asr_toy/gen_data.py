"""Generate the 10-utterance synthetic toy corpus (CPU-runnable e2e smoke).

Each "word" is a distinct tone so the task is learnable: a tiny model can
overfit and decode it back.  Produces data/{train,dev}/wav.scp+text and
data/dict.txt under this directory.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
from lasr_tpu.data.reader import write_wav  # noqa: E402

WORDS = {"GO": 220.0, "STOP": 440.0, "LEFT": 880.0, "RIGHT": 1320.0}


def synth(words, rng, sr=16000, word_dur=0.3):
    parts = []
    for w in words:
        t = np.arange(int(word_dur * sr)) / sr
        f = WORDS[w]
        tone = 0.4 * np.sin(2 * np.pi * f * t) * np.hanning(len(t))
        parts.append(tone)
        parts.append(np.zeros(int(0.05 * sr)))
    wav = np.concatenate(parts)
    return wav + 0.01 * rng.standard_normal(len(wav))


def main(root):
    rng = np.random.default_rng(0)
    names = list(WORDS)
    for split, n, seed in (("train", 10, 0), ("dev", 4, 100)):
        d = os.path.join(root, "data", split)
        os.makedirs(d, exist_ok=True)
        scp, txt = [], []
        r = np.random.default_rng(seed)
        for i in range(n):
            words = [names[r.integers(len(names))]
                     for _ in range(r.integers(1, 4))]
            wav = synth(words, rng)
            path = os.path.join(d, f"{split}{i:02d}.wav")
            write_wav(path, wav, 16000)
            scp.append(f"{split}{i:02d} {path}")
            txt.append(f"{split}{i:02d} {' '.join(words)}")
        with open(os.path.join(d, "wav.scp"), "w") as f:
            f.write("\n".join(scp) + "\n")
        with open(os.path.join(d, "text"), "w") as f:
            f.write("\n".join(txt) + "\n")
    chars = sorted({c for w in WORDS for c in w} | {" "})
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    with open(os.path.join(root, "data", "dict.txt"), "w") as f:
        f.write("\n".join(chars) + "\n")
    print(f"toy corpus written under {root}/data")


if __name__ == "__main__":
    main(os.path.dirname(os.path.abspath(__file__)))
