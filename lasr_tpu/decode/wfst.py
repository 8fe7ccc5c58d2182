"""First-party WFST Viterbi decoding (tropical semiring).

The reference's ``Kaldi_Decoder`` (kaldi_decoder.py:15-33) wraps
pykaldi's ``MappedLatticeFasterRecognizer`` over a compiled decoding
graph.  This module keeps the same constructor/`decode_loglike` surface
with the native deps replaced by a text-format FST loader and a
frame-synchronous Viterbi beam search:

  - ``fst``: the decoding graph in OpenFst TEXT format (``fstprint``
    output: ``src dst ilabel olabel [weight]`` arc lines and
    ``state [weight]`` final lines; ilabel 0 = epsilon).  Any HCLG/TLG
    compiled with the Kaldi/OpenFst toolchain exports to this format
    losslessly, so no OpenFst binary reader is needed in-image.
  - ``word``: the output symbol table (``word id`` per line).
  - ``mdl``: ilabel → posterior-column map.  Kaldi uses a transition
    model (transition-id → pdf); pass a text file of ``ilabel pdf``
    lines for that case, or ``None`` for the CTC TLG convention
    (column = ilabel - 1; documented deviation — this image has no
    Kaldi transition models to read).

Costs follow Kaldi: path cost = graph weight + ``acoustic_scale`` x
(-loglike); pruning by ``beam`` (cost width) and ``max_active``
(histogram cap), epsilon arcs closed each frame.  Host-side DP like the
reference (pykaldi decodes on CPU); the TPU produces the loglikes.
"""

from __future__ import annotations

import heapq
import math
from typing import Dict, List, Optional, Tuple

import numpy as np


class StdFst:
    """Tropical-semiring WFST from OpenFst text format."""

    def __init__(self, path: str):
        # arcs[state] = list of (ilabel, olabel, weight, nextstate)
        self.arcs: Dict[int, List[Tuple[int, int, float, int]]] = {}
        self.finals: Dict[int, float] = {}
        self.start = 0
        first = True
        with open(path, encoding="utf-8") as f:
            for line in f.read().splitlines():
                parts = line.split()
                if not parts:
                    continue
                if len(parts) >= 4:
                    src, dst, il, ol = (int(parts[0]), int(parts[1]),
                                        int(parts[2]), int(parts[3]))
                    w = float(parts[4]) if len(parts) > 4 else 0.0
                    self.arcs.setdefault(src, []).append((il, ol, w, dst))
                    if first:
                        self.start = src
                        first = False
                elif len(parts) <= 2:
                    st = int(parts[0])
                    w = float(parts[1]) if len(parts) > 1 else 0.0
                    self.finals[st] = w
                    if first:
                        self.start = st
                        first = False


def read_symbols(path: str) -> Dict[int, str]:
    out: Dict[int, str] = {}
    with open(path, encoding="utf-8") as f:
        for line in f.read().splitlines():
            parts = line.split()
            if len(parts) >= 2:
                out[int(parts[1])] = parts[0]
    return out


class _Tok:
    __slots__ = ("cost", "olabels", "ilabels")

    def __init__(self, cost, olabels, ilabels):
        self.cost = cost
        self.olabels = olabels      # tuple of emitted output labels
        self.ilabels = ilabels      # tuple of consumed input labels


class Kaldi_Decoder:
    """Constructor surface == reference kaldi_decoder.py:16-28."""

    def __init__(self, beam: float, max_active: int, mdl: Optional[str],
                 fst: str, word: str, acoustic_scale: float = 0.1):
        self.beam = float(beam)
        self.max_active = int(max_active)
        self.acoustic_scale = float(acoustic_scale)
        self.fst = StdFst(fst)
        self.words = read_symbols(word)
        self.ilabel_map: Optional[Dict[int, int]] = None
        if mdl:
            self.ilabel_map = {}
            with open(mdl, encoding="utf-8") as f:
                for line in f.read().splitlines():
                    parts = line.split()
                    if len(parts) >= 2:
                        self.ilabel_map[int(parts[0])] = int(parts[1])

    def _col(self, ilabel: int) -> int:
        if self.ilabel_map is not None:
            return self.ilabel_map[ilabel]
        return ilabel - 1   # CTC TLG convention

    def _eps_close(self, toks: Dict[int, _Tok]) -> Dict[int, _Tok]:
        """Relax epsilon (ilabel 0) arcs to fixpoint (tropical)."""
        heap = [(t.cost, s) for s, t in toks.items()]
        heapq.heapify(heap)
        while heap:
            cost, s = heapq.heappop(heap)
            tok = toks.get(s)
            if tok is None or cost > tok.cost:
                continue
            for il, ol, w, dst in self.fst.arcs.get(s, ()):
                if il != 0:
                    continue
                nc = cost + w
                old = toks.get(dst)
                if old is None or nc < old.cost:
                    toks[dst] = _Tok(
                        nc,
                        tok.olabels + ((ol,) if ol != 0 else ()),
                        tok.ilabels)
                    heapq.heappush(heap, (nc, dst))
        return toks

    def _prune(self, toks: Dict[int, _Tok]) -> Dict[int, _Tok]:
        if not toks:
            return toks
        best = min(t.cost for t in toks.values())
        kept = {s: t for s, t in toks.items() if t.cost <= best + self.beam}
        if len(kept) > self.max_active:
            order = sorted(kept.items(), key=lambda kv: kv[1].cost)
            kept = dict(order[: self.max_active])
        return kept

    def decode_loglike(self, loglikes: np.ndarray) -> Dict:
        """loglikes: (T, N) log-likelihoods (or log-posteriors for CTC
        graphs).  Returns {"text", "words", "alignment", "likelihood"}
        — the fields pykaldi's recognizer output carries
        (kaldi_decoder.py:30-33 returns that object directly)."""
        loglikes = np.asarray(loglikes, np.float64)
        T = loglikes.shape[0]
        toks: Dict[int, _Tok] = {self.fst.start: _Tok(0.0, (), ())}
        toks = self._eps_close(toks)
        for t in range(T):
            toks = self._prune(toks)
            new: Dict[int, _Tok] = {}
            for s, tok in toks.items():
                for il, ol, w, dst in self.fst.arcs.get(s, ()):
                    if il == 0:
                        continue
                    col = self._col(il)
                    nc = (tok.cost + w
                          - self.acoustic_scale * loglikes[t, col])
                    old = new.get(dst)
                    if old is None or nc < old.cost:
                        new[dst] = _Tok(
                            nc,
                            tok.olabels + ((ol,) if ol != 0 else ()),
                            tok.ilabels + (il,))
            toks = self._eps_close(new)
            if not toks:
                break
        # final weights
        best: Optional[Tuple[float, _Tok]] = None
        for s, tok in toks.items():
            if s in self.fst.finals:
                c = tok.cost + self.fst.finals[s]
                if best is None or c < best[0]:
                    best = (c, tok)
        if best is None and toks:   # no reachable final: best partial
            s, tok = min(toks.items(), key=lambda kv: kv[1].cost)
            best = (tok.cost, tok)
        if best is None:
            return {"text": "", "words": [], "alignment": [],
                    "likelihood": -math.inf}
        cost, tok = best
        words = [self.words.get(o, str(o)) for o in tok.olabels]
        return {"text": " ".join(words), "words": list(tok.olabels),
                "alignment": list(tok.ilabels), "likelihood": -cost}
