"""RTF bench for the host-side CTC prefix beam search (VERDICT r2 item 7).

``decode/ctc_bs.py`` is a per-utterance host DP by design — the reference's
``ctc_bs_decoder.py:12-132`` is the same loop — so its cost is pure host
python and independent of the accelerator.  This bench times
``decode_problike`` on synthetic (T, V) posteriors at recipe shapes:

  - "peaked": trained-model-like posteriors (a random token path diluted
    with blanks, low-entropy softmax) — the typical case;
  - "uniform": near-uniform posteriors — the worst case (every candidate
    expands a distinct prefix), same convention as the streaming bench.

The reported RTF counts ONLY the DP; the encoder+CTC posterior pass is the
offline decode path already benched at RTF ~0.05 (bench_decode.py), so
total ctc_bs RTF ~= dp_rtf + 0.05-ish.

Run: python tools/bench_ctc_bs.py [--secs 10 --vocab 5000 --beam 10]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lasr_tpu.decode.ctc_bs import CTC_Decoder  # noqa: E402


def synth_posteriors(T, V, kind, rng, peak=6.0):
    logits = rng.standard_normal((T, V)).astype(np.float64)
    if kind == "peaked":
        # a plausible decode lattice: token every ~4 frames, blanks between
        path = np.zeros(T, np.int64)
        tok_pos = np.arange(0, T, 4)
        path[tok_pos] = rng.integers(6, V, tok_pos.shape)
        logits[np.arange(T), path] += peak
        logits[:, 0] += peak * 0.5          # blank-dominant elsewhere
    m = logits.max(-1, keepdims=True)
    p = np.exp(logits - m)
    p /= p.sum(-1, keepdims=True)
    return p


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--vocab", type=int, default=5000)
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--ctc-beam", type=int, default=15)
    ap.add_argument("--utts", type=int, default=8)
    args = ap.parse_args()

    # encoder frames for `secs` of 16 kHz audio: fbank 10 ms hop, /4 subsample
    T = ((1 + (int(args.secs * 16000) - 400) // 160 - 1) // 2 - 1) // 2
    dec = CTC_Decoder(beam_size=args.beam, ctc_beam=args.ctc_beam,
                      blank=0, sos=args.vocab - 1)
    rng = np.random.default_rng(0)
    out = {}
    for kind in ("peaked", "uniform"):
        posts = [synth_posteriors(T, args.vocab, kind, rng)
                 for _ in range(args.utts)]
        dec.decode_problike(posts[0])  # warm caches
        t0 = time.perf_counter()
        toks = 0
        for p in posts:
            nbest = dec.decode_problike(p)
            toks += len(nbest[0][0]) - 1
        dt = time.perf_counter() - t0
        out[kind] = dict(
            dp_s_per_utt=round(dt / args.utts, 3),
            dp_rtf=round(dt / args.utts / args.secs, 4),
            tokens_per_utt=round(toks / args.utts, 1))
        print(f"{kind:8s} T={T} V={args.vocab} beam={args.beam} "
              f"ctc_beam={args.ctc_beam}: {out[kind]}")
    print(json.dumps(dict(metric="ctc_bs_dp_rtf", secs=args.secs, T=T,
                          **out)))


if __name__ == "__main__":
    main()
