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


def bench_w2l(args, T):
    """RTF of the lexicon+word-LM beam (decode/ctc_w2l.py) at recipe
    scale: synthetic 3k-word lexicon over the BPE vocab, bigram ARPA,
    with and without flashlight's beam_size_token AM pruning."""
    import tempfile

    rng = np.random.default_rng(0)
    d = tempfile.mkdtemp()
    V = args.vocab
    n_words, max_spell = 3000, 5
    words = [f"w{i}" for i in range(n_words)]
    with open(f"{d}/lexicon.txt", "w") as f:
        for w in words:
            sp = rng.integers(1, V, rng.integers(2, max_spell + 1))
            f.write(w + " " + " ".join(f"t{t}" for t in sp) + "\n")
    with open(f"{d}/tokens.txt", "w") as f:
        f.write("\n".join(f"t{i} {i}" for i in range(1, V)) + "\n")
    with open(f"{d}/lm.arpa", "w") as f:
        f.write("\\data\\\nngram 1=%d\n\n\\1-grams:\n" % (n_words + 3))
        for w in words:
            f.write(f"-3.5\t{w}\t-0.5\n")
        f.write("-0.5\t<s>\t-0.5\n-1.0\t</s>\n-5.0\t<unk>\n\n\\end\\\n")

    from lasr_tpu.decode.ctc_w2l import CTC_KenLM_Decoder
    out = {}
    # one posterior set per kind, decoded by BOTH configs, so the
    # full-vs-topk comparison is apples-to-apples
    n = max(2, args.utts // 2)
    lps = {kind: [np.log(np.maximum(
        synth_posteriors(T, V, kind, rng), 1e-300)) for _ in range(n)]
        for kind in ("peaked", "uniform")}
    for label, tok_k in (("full", None), ("topk40", 40)):
        dec = CTC_KenLM_Decoder(
            beam_size=args.beam, beam_threshold=25.0,
            lexicon=f"{d}/lexicon.txt", tokens_dict=f"{d}/tokens.txt",
            kenlm_model=f"{d}/lm.arpa", lm_weight=2.0, word_score=-1.0,
            beam_size_token=tok_k)
        for kind in ("peaked", "uniform"):
            lp = lps[kind]
            dec.decode_problike(lp[0])
            t0 = time.perf_counter()
            for x in lp:
                dec.decode_problike(x)
            dt = (time.perf_counter() - t0) / len(lp)
            out[f"{label}_{kind}"] = dict(
                dp_s_per_utt=round(dt, 3),
                dp_rtf=round(dt / args.secs, 4))
            print(f"w2l {label:7s} {kind:8s}: {out[f'{label}_{kind}']}")
    print(json.dumps(dict(metric="ctc_w2l_dp_rtf", secs=args.secs, T=T,
                          words=n_words, **out)))


def bench_wfst(args):
    """RTF of the first-party WFST Viterbi decoder on a realistic TLG
    (VERDICT round-3 item 8): ~200-word lexicon x exact-expanded bigram
    LM x CTC topology — thousands of states — under production-style
    beam/max_active pruning.  Frames are 40 ms encoder frames (the /4
    subsampled CTC rate), so audio secs = T x 0.04."""
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from build_tlg import write_tlg
    from synthspeech import make_bigram, make_lexicon, sample_transcript
    from lasr_tpu.decode.ngram_lm import ArpaNgramLM
    from lasr_tpu.decode.wfst import Kaldi_Decoder
    from tests.test_wfst_scale import peaked_posteriors, write_arpa

    d = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    lex_words = make_lexicon(200)
    bigram = make_bigram(len(lex_words))
    sentences = [sample_transcript(lex_words, bigram, rng)
                 for _ in range(800)]
    write_arpa(f"{d}/lm.arpa", sentences, lex_words)
    spelled = {w: [ord(c) - ord("A") + 1 for c in w] for w in lex_words}
    n_states, n_arcs, _ = write_tlg(f"{d}/TLG.fst.txt", f"{d}/words.txt",
                                    spelled, ArpaNgramLM(f"{d}/lm.arpa"))
    dec = Kaldi_Decoder(beam=14.0, max_active=2000, mdl=None,
                        fst=f"{d}/TLG.fst.txt", word=f"{d}/words.txt",
                        acoustic_scale=1.0)
    utts = [sample_transcript(lex_words, bigram, rng)
            for _ in range(args.utts)]
    lps = [peaked_posteriors(u, spelled, rng) for u in utts]
    dec.decode_loglike(lps[0])
    t0 = time.perf_counter()
    correct = 0
    frames = 0
    for u, lp in zip(utts, lps):
        out = dec.decode_loglike(lp)
        frames += len(lp)
        correct += out["text"].split() == list(u)
    dt = time.perf_counter() - t0
    audio = frames * 0.04
    print(json.dumps(dict(metric="wfst_tlg_dp_rtf",
                          tlg_states=n_states, tlg_arcs=n_arcs,
                          beam=14.0, max_active=2000,
                          utts=len(utts), frames=frames,
                          exact=correct,
                          dp_s_per_utt=round(dt / len(utts), 3),
                          dp_rtf=round(dt / audio, 4))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--vocab", type=int, default=5000)
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--ctc-beam", type=int, default=15)
    ap.add_argument("--utts", type=int, default=8)
    ap.add_argument("--w2l", action="store_true",
                    help="also bench the lexicon+word-LM beam decoder")
    ap.add_argument("--wfst", action="store_true",
                    help="also bench the WFST Viterbi decoder on a "
                         "realistic TLG")
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
    if args.w2l:
        bench_w2l(args, T)
    if args.wfst:
        bench_wfst(args)


if __name__ == "__main__":
    main()
