"""TLG decoding-graph builder for the first-party WFST decoder
(VERDICT round-3 item 8: exercise decode/wfst.py at realistic scale).

Composes T (Eesen-style CTC topology: blank self-loops, repeat collapse,
blank-gap before a repeated label) o L (word spellings) o G (an
EXACT-EXPANDED n-gram LM: one arc per (context state, word) carrying
``lm.score``'s exact value, backoff already folded in — so the tropical
best path equals flashlight-semantics lexicon decoding, no backoff-path
approximation) and writes OpenFst TEXT format for ``decode/wfst.py``.

Weight convention matches ``CTC_KenLM_Decoder`` exactly (test pinned in
tests/test_wfst_scale.py): word-final arcs cost
``-(lm_weight*lm + word_score)``, final states cost
``-lm_weight*finish``, and with ``acoustic_scale=1`` on log posteriors
the decoder's ``likelihood`` equals the lexicon decoder's final score.

ilabel convention: ``column = ilabel - 1`` (decode/wfst.py mdl=None), so
ilabel 1 is the CTC blank column and letter token k is ilabel k+1.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from lasr_tpu.decode.ngram_lm import ArpaNgramLM


def build_lg(lexicon: Dict[str, List[int]], lm: ArpaNgramLM,
             lm_weight: float, word_score: float):
    """Letter-level LG: states = LM contexts + in-word positions.

    The full LM weight sits on the word-FINAL letter arc (tropical total
    is placement-invariant; the pinned equality is on unpruned search).
    Returns (arcs [(src, dst, tok, word_id, cost)], finals {state: cost},
    start, word list)."""
    words = sorted(lexicon)
    ctx_key: Dict[tuple, int] = {}
    states = 0

    def ctx_state(key):
        nonlocal states
        if key not in ctx_key:
            ctx_key[key] = states
            states += 1
        return ctx_key[key]

    start_state = lm.start()
    todo = [start_state]
    start = ctx_state(start_state)
    arcs: List[Tuple[int, int, int, int, float]] = []
    seen = {start_state}
    while todo:
        st = todo.pop()
        src = ctx_state(st)
        for wid, w in enumerate(words):
            st2, s = lm.score_word(st, w)
            if st2 not in seen:
                seen.add(st2)
                todo.append(st2)
            dst = ctx_state(st2)
            sp = lexicon[w]
            cost = -(lm_weight * s + word_score)
            cur = src
            for j, tok in enumerate(sp):
                if j == len(sp) - 1:
                    arcs.append((cur, dst, tok, wid + 1, cost))
                else:
                    mid = states
                    states += 1
                    arcs.append((cur, mid, tok, 0, 0.0))
                    cur = mid
    finals = {}
    for key, sid_ in ctx_key.items():
        finals[sid_] = -lm_weight * lm.finish(key)
    return arcs, finals, start, words


def compose_ctc(arcs, finals, start, n_tokens: int):
    """Apply the CTC topology over a letter-arc graph.

    States are (lg_state, last_label): blank self-loops everywhere, a
    taken letter arc lands in a repeat-collapse self-loop, and an arc
    with the SAME label as the last emission is only reachable after a
    blank (Eesen T semantics — what CTC_KenLM_Decoder's ``tok == h.prev``
    gap rule enforces, ctc_w2l.py).  ilabel = letter + 1 (blank = 1)."""
    out_arcs: List[Tuple[int, int, int, int, float]] = []
    out_finals: Dict[int, float] = {}
    by_src: Dict[int, List[Tuple[int, int, int, int, float]]] = {}
    for a in arcs:
        by_src.setdefault(a[0], []).append(a)

    state_id: Dict[Tuple[int, int], int] = {}

    def sid(q, label):
        if (q, label) not in state_id:
            state_id[(q, label)] = len(state_id)
        return state_id[(q, label)]

    BLANK = 0
    todo = [(start, BLANK)]
    seen = {(start, BLANK)}
    while todo:
        q, lab = todo.pop()
        s = sid((q), lab)
        # blank self-transition (resets the repeat context)
        tgt = (q, BLANK)
        out_arcs.append((s, sid(*tgt), 1, 0, 0.0))
        if tgt not in seen:
            seen.add(tgt)
            todo.append(tgt)
        if lab != BLANK:
            # repeat-collapse self-loop
            out_arcs.append((s, s, lab + 1, 0, 0.0))
        for (_src, dst, tok, ol, w) in by_src.get(q, ()):
            if tok == lab:      # repeated label needs a blank gap
                continue
            tgt = (dst, tok)
            out_arcs.append((s, sid(*tgt), tok + 1, ol, w))
            if tgt not in seen:
                seen.add(tgt)
                todo.append(tgt)
        if q in finals:
            out_finals[s] = finals[q]
    return out_arcs, out_finals, sid(start, BLANK), len(state_id)


def write_tlg(path_fst: str, path_words: str, lexicon, lm: ArpaNgramLM,
              lm_weight: float = 2.0, word_score: float = -1.0,
              n_tokens: int = 26, binary: bool = False):
    """Build + write the TLG (OpenFst text, or binary vector-fst with
    ``binary=True``); returns (n_states, n_arcs, words)."""
    arcs, finals, start, words = build_lg(lexicon, lm, lm_weight,
                                          word_score)
    t_arcs, t_finals, t_start, n_states = compose_ctc(
        arcs, finals, start, n_tokens)
    if binary:
        from lasr_tpu.decode.wfst import StdFst
        by_src: Dict[int, list] = {}
        for src, dst, il, ol, w in t_arcs:
            by_src.setdefault(src, []).append((il, ol, w, dst))
        StdFst.from_parts(t_start, by_src, t_finals).write_binary(path_fst)
    else:
        lines = []
        # first arc line must carry the start state (StdFst convention)
        ordered = sorted(t_arcs, key=lambda a: a[0] != t_start)
        for src, dst, il, ol, w in ordered:
            lines.append(f"{src} {dst} {il} {ol} {w:.8f}")
        for st, w in t_finals.items():
            lines.append(f"{st} {w:.8f}")
        with open(path_fst, "w") as f:
            f.write("\n".join(lines) + "\n")
    with open(path_words, "w") as f:
        f.write("<eps> 0\n")
        for i, w in enumerate(words):
            f.write(f"{w} {i + 1}\n")
    return n_states, len(t_arcs), words
