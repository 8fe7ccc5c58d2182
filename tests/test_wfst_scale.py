"""WFST decoding at realistic scale (VERDICT round-3 item 8).

Builds a thousands-of-states TLG (tools/build_tlg.py: Eesen CTC topology
o word spellings o exact-expanded bigram ARPA LM) and pins the
first-party WFST Viterbi decoder (decode/wfst.py) against the
first-party flashlight-semantics lexicon decoder (decode/ctc_w2l.py) on
IDENTICAL posteriors: same word sequence AND the same total score
(likelihood == am + lm_weight*lm(+finish) + word_score*n_words) —
two independently-implemented searches over the same model, agreeing
exactly.  The toy oracle tests (test_wordlm_decoders.py) cover planted
graphs of a few dozen states; this exercises eps-free TLG traversal,
beam/max_active pruning, and repeat/blank CTC topology at scale."""

import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from synthspeech import make_bigram, make_lexicon, sample_transcript  # noqa: E402


def write_arpa(path, sentences, words):
    """Tiny absolute-discount bigram ARPA over the corpus (the smoothing
    quality is irrelevant — both decoders read the SAME file)."""
    uni = {w: 1 for w in words}
    bi = {}
    n = len(words)
    for s in sentences:
        seq = ["<s>"] + s + ["</s>"]
        for w in s:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(seq, seq[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    total = sum(uni.values())
    lines = ["\\data\\", f"ngram 1={n + 3}", f"ngram 2={len(bi)}", "",
             "\\1-grams:"]
    lines.append(f"{math.log10(0.5 / total):.6f} <unk>")
    lines.append("-99 <s> -0.30103")
    lines.append(f"{math.log10(0.5 / total):.6f} </s>")
    ctx_count = {}
    for (a, _b), c in bi.items():
        ctx_count[a] = ctx_count.get(a, 0) + c
    for w, c in sorted(uni.items()):
        lines.append(f"{math.log10(c / total):.6f} {w} -0.30103")
    lines.append("")
    lines.append("\\2-grams:")
    for (a, b), c in sorted(bi.items()):
        # absolute discount 0.5 leaves mass for the backoff
        lines.append(f"{math.log10((c - 0.5) / ctx_count[a]):.6f} {a} {b}")
    lines += ["", "\\end\\"]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def make_setup(tmp_path, n_words):
    lex_words = make_lexicon(n_words)
    bigram = make_bigram(len(lex_words))
    rng = np.random.default_rng(0)
    sentences = [sample_transcript(lex_words, bigram, rng)
                 for _ in range(800)]
    arpa = tmp_path / "lm.arpa"
    write_arpa(str(arpa), sentences, lex_words)

    lex_file = tmp_path / "lexicon.txt"
    with open(lex_file, "w") as f:
        for w in lex_words:
            f.write(w + " " + " ".join(w) + "\n")
    tok_file = tmp_path / "tokens.txt"
    with open(tok_file, "w") as f:
        for i in range(26):
            f.write(f"{chr(ord('A') + i)} {i + 1}\n")
    spelled = {w: [ord(c) - ord("A") + 1 for c in w] for w in lex_words}
    return lex_words, bigram, sentences, str(arpa), str(lex_file), \
        str(tok_file), spelled


def peaked_posteriors(words, spelled, rng, frames_per_tok=2):
    """CTC-like log posteriors for a known word sequence: peaked token
    frames separated by blanks, with mild noise."""
    rows = []
    V = 27
    for w in words:
        for tok in spelled[w]:
            for _ in range(frames_per_tok):
                rows.append(tok)
            rows.append(0)
    rows += [0, 0]
    logits = 0.3 * rng.standard_normal((len(rows), V))
    for t, k in enumerate(rows):
        logits[t, k] += 6.0
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    return lp.astype(np.float64)


@pytest.fixture(scope="module")
def setup_small(tmp_path_factory):
    return make_setup(tmp_path_factory.mktemp("wfst_small"), 60)


def test_tlg_matches_lexicon_decoder(setup_small, tmp_path):
    from build_tlg import write_tlg
    from lasr_tpu.decode.ctc_w2l import CTC_KenLM_Decoder
    from lasr_tpu.decode.ngram_lm import ArpaNgramLM
    from lasr_tpu.decode.wfst import Kaldi_Decoder

    (lex_words, bigram, _s, arpa, lex_file, tok_file,
     spelled) = setup_small
    lm_weight, word_score = 2.0, -1.0
    fst = tmp_path / "TLG.fst.txt"
    wtab = tmp_path / "words.txt"
    n_states, n_arcs, words = write_tlg(
        str(fst), str(wtab), spelled, ArpaNgramLM(arpa),
        lm_weight=lm_weight, word_score=word_score)
    assert n_states > 500 and n_arcs > 2000

    wfst = Kaldi_Decoder(beam=40.0, max_active=20000, mdl=None,
                         fst=str(fst), word=str(wtab), acoustic_scale=1.0)
    w2l = CTC_KenLM_Decoder(beam_size=3000, beam_threshold=40.0,
                            lexicon=lex_file, tokens_dict=tok_file,
                            kenlm_model=arpa, lm_weight=lm_weight,
                            word_score=word_score)
    rng = np.random.default_rng(1)
    for trial in range(4):
        truth = sample_transcript(lex_words, bigram, rng)[:5]
        lp = peaked_posteriors(truth, spelled, rng)
        out = wfst.decode_loglike(lp)
        hyps = w2l.decode_words(lp, do_log=False)
        assert out["text"].split() == hyps[0][0], f"trial {trial}"
        assert out["likelihood"] == pytest.approx(hyps[0][1], abs=1e-6), \
            f"trial {trial}"


def test_tlg_scale_and_pruning(tmp_path_factory, tmp_path):
    """A few-hundred-word TLG reaches the thousands-of-states regime and
    a realistically pruned search still recovers the planted words."""
    from build_tlg import write_tlg
    from lasr_tpu.decode.ngram_lm import ArpaNgramLM
    from lasr_tpu.decode.wfst import Kaldi_Decoder

    (lex_words, bigram, _s, arpa, _lex, _tok,
     spelled) = make_setup(tmp_path_factory.mktemp("wfst_big"), 200)
    fst = tmp_path / "TLG200.fst.txt"
    wtab = tmp_path / "words200.txt"
    n_states, n_arcs, _ = write_tlg(str(fst), str(wtab), spelled,
                                    ArpaNgramLM(arpa))
    assert n_states > 1000, f"{n_states} states"

    dec = Kaldi_Decoder(beam=14.0, max_active=2000, mdl=None,
                        fst=str(fst), word=str(wtab), acoustic_scale=1.0)
    rng = np.random.default_rng(2)
    truth = sample_transcript(lex_words, bigram, rng)
    lp = peaked_posteriors(truth, spelled, rng)
    out = dec.decode_loglike(lp)
    assert out["text"].split() == list(truth)
