"""First-party word-LM decoding stack: ARPA n-gram LM, lexicon beam
search (CTC_KenLM_Decoder), WFST Viterbi decoder.

Oracles are exhaustive: LM scores are hand-computed backoff chains; the
lexicon beam's 1-best is checked against brute-force enumeration of all
word sequences scored with exact Viterbi-CTC + LM + word bonuses.
"""

import itertools
import math
import os

import numpy as np
import pytest

from lasr_tpu.decode.ngram_lm import ArpaNgramLM, read_dict
from lasr_tpu.decode.ctc_w2l import CTC_KenLM_Decoder, load_words

ARPA = """\
\\data\\
ngram 1=5
ngram 2=4

\\1-grams:
-0.5\t<s>\t-0.3
-0.9\t</s>
-0.6\thello\t-0.2
-0.7\tworld\t-0.4
-1.0\t<unk>

\\2-grams:
-0.2\t<s> hello
-0.4\thello world
-0.5\tworld </s>
-0.8\thello hello

\\end\\
"""


@pytest.fixture
def arpa_path(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA)
    return str(p)


class TestArpaNgramLM:
    def test_direct_bigram(self, arpa_path):
        lm = ArpaNgramLM(arpa_path)
        st = lm.start()
        st, s = lm.score_word(st, "hello")
        assert s == pytest.approx(-0.2)

    def test_backoff_chain(self, arpa_path):
        lm = ArpaNgramLM(arpa_path)
        st = lm.start()
        # no "<s> world" bigram: backoff(<s>) + p1(world)
        _, s = lm.score_word(st, "world")
        assert s == pytest.approx(-0.3 + -0.7)

    def test_backoff_without_explicit_weight(self, arpa_path):
        lm = ArpaNgramLM(arpa_path)
        # context "world" has backoff -0.4; "world hello" unlisted
        st, _ = lm.score_word(lm.start(), "hello")
        st, _ = lm.score_word(st, "world")
        _, s = lm.score_word(st, "hello")
        assert s == pytest.approx(-0.4 + -0.6)

    def test_sentence_logprob(self, arpa_path):
        lm = ArpaNgramLM(arpa_path)
        # <s> hello (-0.2) + hello world (-0.4) + world </s> (-0.5)
        assert lm.sentence_logprob(["hello", "world"]) == pytest.approx(-1.1)

    def test_oov_scores_as_unk(self, arpa_path):
        lm = ArpaNgramLM(arpa_path)
        st = lm.start()
        _, s = lm.score_word(st, "zebra")
        # backoff(<s>) + p1(<unk>)
        assert s == pytest.approx(-0.3 + -1.0)

    def test_state_recombination(self, arpa_path):
        lm = ArpaNgramLM(arpa_path)
        # after an OOV the context word is <unk>, which no bigram
        # extends — state canonicalises to ()
        st, _ = lm.score_word(lm.start(), "zebra")
        assert st == ()


def viterbi_ctc(lp, labels, blank=0):
    """Max-over-alignments CTC score of `labels` under log-probs lp."""
    T = lp.shape[0]
    ext = [blank]
    for l in labels:
        ext += [l, blank]
    S = len(ext)
    a = np.full(S, -np.inf)
    a[0] = lp[0, ext[0]]
    if S > 1:
        a[1] = lp[0, ext[1]]
    for t in range(1, T):
        b = np.full(S, -np.inf)
        for s in range(S):
            best = a[s]
            if s >= 1:
                best = max(best, a[s - 1])
            if s >= 2 and ext[s] != blank and ext[s] != ext[s - 2]:
                best = max(best, a[s - 2])
            b[s] = best + lp[t, ext[s]]
        a = b
    return max(a[-1], a[-2] if S > 1 else -np.inf)


class TestLexiconBeam:
    def _decoder(self, tmp_path, **kw):
        (tmp_path / "lexicon.txt").write_text(
            "hello a b\nworld b c\n")
        (tmp_path / "tokens.txt").write_text("a 1\nb 2\nc 3\n")
        (tmp_path / "lm.arpa").write_text(ARPA)
        kw.setdefault("beam_size", 64)
        kw.setdefault("beam_threshold", 1e9)
        return CTC_KenLM_Decoder(
            lexicon=str(tmp_path / "lexicon.txt"),
            tokens_dict=str(tmp_path / "tokens.txt"),
            kenlm_model=str(tmp_path / "lm.arpa"), **kw)

    def _oracle(self, dec, lp, max_words=2):
        """Brute-force best word sequence: exact Viterbi-CTC + LM."""
        spell = {"hello": [1, 2], "world": [2, 3]}
        lm = dec.lm
        best = (-np.inf, None)
        for n in range(max_words + 1):
            for seq in itertools.product(spell, repeat=n):
                labels = sum((spell[w] for w in seq), [])
                am = viterbi_ctc(lp, labels)
                st = lm.start()
                lscore = 0.0
                for w in seq:
                    st, s = lm.score_word(st, w)
                    lscore += s
                lscore += lm.finish(st)
                total = (am + dec.lm_weight * lscore
                         + dec.word_score * n)
                if total > best[0]:
                    best = (total, [t for w in seq for t in spell[w]])
        return best

    def test_matches_bruteforce_planted(self, tmp_path):
        dec = self._decoder(tmp_path, lm_weight=1.5, word_score=-0.5)
        rng = np.random.default_rng(0)
        # plant "hello world": a b b c with blanks
        plant = [1, 0, 2, 0, 2, 3, 0]
        T, V = len(plant), 5
        logits = rng.standard_normal((T, V))
        for t, k in enumerate(plant):
            logits[t, k] += 4.0
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        oracle_score, oracle_toks = self._oracle(dec, lp)
        nbest = dec.decode_problike(lp)
        assert nbest[0][0] == oracle_toks
        assert nbest[0][1] == pytest.approx(oracle_score, abs=1e-6)

    def test_matches_bruteforce_random(self, tmp_path):
        dec = self._decoder(tmp_path, lm_weight=2.0, word_score=-1.0)
        rng = np.random.default_rng(7)
        for trial in range(5):
            T, V = 6, 5
            logits = 2.0 * rng.standard_normal((T, V))
            lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
            oracle_score, oracle_toks = self._oracle(dec, lp)
            nbest = dec.decode_problike(lp)
            assert nbest[0][0] == oracle_toks, f"trial {trial}"
            assert nbest[0][1] == pytest.approx(oracle_score, abs=1e-6)

    def test_lexicon_constrains_output(self, tmp_path):
        """Only lexicon spellings can be emitted — plant an
        out-of-lexicon token sequence and the decoder must still return
        in-lexicon words."""
        dec = self._decoder(tmp_path)
        rng = np.random.default_rng(1)
        T, V = 5, 5
        logits = rng.standard_normal((T, V))
        logits[:, 3] += 5.0   # "c c c c c" is no word prefix
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        toks, _ = dec.decode_problike(lp)[0]
        valid = ([], [1, 2], [2, 3], [1, 2, 2, 3], [2, 3, 1, 2],
                 [1, 2, 1, 2], [2, 3, 2, 3])
        assert toks in [list(v) for v in valid]

    def test_word_nbest(self, tmp_path):
        dec = self._decoder(tmp_path)
        rng = np.random.default_rng(2)
        T, V = 7, 5
        logits = rng.standard_normal((T, V))
        for t, k in enumerate([1, 2, 0, 0, 2, 3, 0]):
            logits[t, k] += 4.0
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        words = dec.decode_words(lp)
        assert words[0][0] == ["hello", "world"]

    def test_load_words_multi_spelling(self, tmp_path):
        (tmp_path / "lex2.txt").write_text("hi a\nhi a b\n")
        lex = load_words(str(tmp_path / "lex2.txt"))
        assert lex == {"hi": [["a"], ["a", "b"]]}

    def test_read_dict_appends_eos(self, tmp_path):
        (tmp_path / "tok.txt").write_text("a 1\nb 2\n")
        d = read_dict(str(tmp_path / "tok.txt"), eos="<eos>")
        assert d == {"a": 1, "b": 2, "<eos>": 3}


class TestWfstDecoder:
    """First-party Kaldi_Decoder surface (decode/wfst.py) over a tiny
    hand-built decoding graph in OpenFst text format."""

    def _graph(self, tmp_path):
        # ilabels: 1=blank(col0) 2=a(col1) 3=b(col2); CTC-style blank
        # self-loops on every state; two word paths with different
        # graph weights
        (tmp_path / "g.fst.txt").write_text(
            "0 0 1 0 0.0\n"
            "0 1 2 10 0.5\n"      # a -> hello
            "1 1 1 0 0.0\n"
            "1 1 2 0 0.0\n"       # repeat a
            "1 2 3 0 0.0\n"       # b finishes hello's spelling
            "0 3 3 11 0.1\n"      # b -> world
            "3 3 1 0 0.0\n"
            "3 2 2 0 0.3\n"       # a finishes world's spelling
            "2 2 1 0 0.0\n"
            "2 0.2\n")
        (tmp_path / "words.txt").write_text(
            "<eps> 0\nhello 10\nworld 11\n")
        return str(tmp_path / "g.fst.txt"), str(tmp_path / "words.txt")

    def _oracle(self, dec, loglikes):
        """Enumerate every length-T ilabel path; min Kaldi cost."""
        fst, T = dec.fst, loglikes.shape[0]
        best = [math.inf, None]

        def rec(state, t, cost, ols):
            if cost > best[0] + 50:
                return
            if t == T:
                if state in fst.finals:
                    c = cost + fst.finals[state]
                    if c < best[0]:
                        best[0], best[1] = c, ols
                return
            for il, ol, w, dst in fst.arcs.get(state, ()):
                assert il != 0  # this graph has no epsilons
                am = -dec.acoustic_scale * loglikes[t, il - 1]
                rec(dst, t + 1, cost + w + am,
                    ols + ((ol,) if ol else ()))
        rec(fst.start, 0, 0.0, ())
        return -best[0], best[1]

    def test_matches_oracle_planted(self, tmp_path):
        from lasr_tpu.decode.wfst import Kaldi_Decoder
        g, w = self._graph(tmp_path)
        dec = Kaldi_Decoder(beam=100.0, max_active=100, mdl=None,
                            fst=g, word=w, acoustic_scale=0.7)
        rng = np.random.default_rng(3)
        ll = rng.standard_normal((4, 3))
        ll[0, 1] += 3.0   # a
        ll[1, 0] += 3.0   # blank
        ll[2, 2] += 3.0   # b
        ll[3, 0] += 3.0   # blank
        out = dec.decode_loglike(ll)
        lik, ols = self._oracle(dec, ll)
        assert out["text"] == "hello"
        assert out["likelihood"] == pytest.approx(lik, abs=1e-9)
        assert tuple(out["words"]) == ols

    def test_matches_oracle_random(self, tmp_path):
        from lasr_tpu.decode.wfst import Kaldi_Decoder
        g, w = self._graph(tmp_path)
        dec = Kaldi_Decoder(beam=100.0, max_active=100, mdl=None,
                            fst=g, word=w, acoustic_scale=0.4)
        rng = np.random.default_rng(5)
        for trial in range(5):
            ll = 2.0 * rng.standard_normal((5, 3))
            out = dec.decode_loglike(ll)
            lik, _ = self._oracle(dec, ll)
            assert out["likelihood"] == pytest.approx(lik, abs=1e-9), \
                f"trial {trial}"

    def test_epsilon_arcs(self, tmp_path):
        """Epsilon transitions relax within a frame (word-rewrite arc)."""
        from lasr_tpu.decode.wfst import Kaldi_Decoder
        (tmp_path / "e.fst.txt").write_text(
            "0 1 2 10 0.0\n"     # a -> hello
            "1 2 0 11 0.25\n"    # eps arc also emits world
            "2 0.0\n")
        (tmp_path / "words.txt").write_text(
            "<eps> 0\nhello 10\nworld 11\n")
        dec = Kaldi_Decoder(beam=10.0, max_active=10, mdl=None,
                            fst=str(tmp_path / "e.fst.txt"),
                            word=str(tmp_path / "words.txt"),
                            acoustic_scale=1.0)
        ll = np.zeros((1, 3))
        ll[0, 1] = 1.5
        out = dec.decode_loglike(ll)
        assert out["text"] == "hello world"
        assert out["likelihood"] == pytest.approx(-(0.25 - 1.5))

    def test_max_active_pruning_keeps_planted_path(self, tmp_path):
        from lasr_tpu.decode.wfst import Kaldi_Decoder
        g, w = self._graph(tmp_path)
        dec = Kaldi_Decoder(beam=100.0, max_active=1, mdl=None,
                            fst=g, word=w, acoustic_scale=0.7)
        ll = np.full((4, 3), -5.0)
        for t, k in enumerate([1, 0, 2, 0]):
            ll[t, k] = 0.0
        assert dec.decode_loglike(ll)["text"] == "hello"

    def test_ilabel_map_file(self, tmp_path):
        """mdl maps ilabels to posterior columns (transition-model
        stand-in)."""
        from lasr_tpu.decode.wfst import Kaldi_Decoder
        g, w = self._graph(tmp_path)
        # swap columns: ilabel 1->2, 2->0, 3->1
        (tmp_path / "map.txt").write_text("1 2\n2 0\n3 1\n")
        dec = Kaldi_Decoder(beam=100.0, max_active=100,
                            mdl=str(tmp_path / "map.txt"),
                            fst=g, word=w, acoustic_scale=0.7)
        ll = np.full((4, 3), -5.0)
        for t, k in enumerate([0, 2, 1, 2]):   # a blank b blank, remapped
            ll[t, k] = 0.0
        assert dec.decode_loglike(ll)["text"] == "hello"


class TestBeamSizeToken:
    def test_topk_pruning_keeps_planted_result(self, tmp_path):
        """flashlight's beam_size_token (top-K tokens by AM score per
        frame): with the planted tokens in the top K, the result matches
        the unpruned search."""
        lex = tmp_path / "lexicon.txt"
        lex.write_text("hello a b\nworld b c\n")
        (tmp_path / "tokens.txt").write_text("a 1\nb 2\nc 3\n")
        (tmp_path / "lm.arpa").write_text(ARPA)
        kw = dict(beam_size=64, beam_threshold=1e9,
                  lexicon=str(lex), tokens_dict=str(tmp_path / "tokens.txt"),
                  kenlm_model=str(tmp_path / "lm.arpa"),
                  lm_weight=1.5, word_score=-0.5)
        rng = np.random.default_rng(0)
        plant = [1, 0, 2, 0, 2, 3, 0]
        logits = rng.standard_normal((len(plant), 5))
        for t, k in enumerate(plant):
            logits[t, k] += 4.0
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        full = CTC_KenLM_Decoder(**kw).decode_problike(lp)
        pruned = CTC_KenLM_Decoder(beam_size_token=2, **kw).decode_problike(lp)
        assert pruned[0][0] == full[0][0]
        assert pruned[0][1] == pytest.approx(full[0][1], abs=1e-6)
