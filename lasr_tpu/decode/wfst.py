"""First-party WFST Viterbi decoding (tropical semiring).

The reference's ``Kaldi_Decoder`` (kaldi_decoder.py:15-33) wraps
pykaldi's ``MappedLatticeFasterRecognizer`` over a compiled decoding
graph.  This module keeps the same constructor/`decode_loglike` surface
with the native deps replaced by a text-format FST loader and a
frame-synchronous Viterbi beam search:

  - ``fst``: the decoding graph, either OpenFst BINARY (the ``HCLG.fst``
    / ``TLG.fst`` artifact Kaldi's ``mkgraph.sh`` ships — ``vector`` and
    ``const`` fst types, ``standard`` (tropical) arcs, attached symbol
    tables skipped; auto-detected by the 0x7EB2FDD6 magic) or OpenFst
    TEXT format (``fstprint`` output: ``src dst ilabel olabel [weight]``
    arc lines and ``state [weight]`` final lines; ilabel 0 = epsilon).
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


#: OpenFst binary framing constants (public format, fst/fst.h /
#: fst/symbol-table.h: kFstMagicNumber / kSymbolTableMagicNumber; the
#: vector/const state+arc layouts follow fst/vector-fst.h
#: VectorFst::WriteFst and fst/const-fst.h ConstFst::WriteFst).
FST_MAGIC = 2125659606
SYMBOL_TABLE_MAGIC = 2125658996
_FLAG_ISYMBOLS = 0x1
_FLAG_OSYMBOLS = 0x2
_CONST_ALIGNED_VERSION = 1    # const-fst kAlignedFileVersion
_CONST_FILE_ALIGN = 16        # const-fst kFileAlign / MappedFile alignment


class _BinCursor:
    """Little-endian cursor over OpenFst's WriteType framing."""

    def __init__(self, data: bytes):
        self.d = data
        self.o = 0

    def _take(self, n: int) -> bytes:
        b = self.d[self.o:self.o + n]
        if len(b) != n:
            raise ValueError("truncated OpenFst binary")
        self.o += n
        return b

    def i32(self) -> int:
        return int.from_bytes(self._take(4), "little", signed=True)

    def u32(self) -> int:
        return int.from_bytes(self._take(4), "little", signed=False)

    def i64(self) -> int:
        return int.from_bytes(self._take(8), "little", signed=True)

    def u64(self) -> int:
        return int.from_bytes(self._take(8), "little", signed=False)

    def f32(self) -> float:
        import struct
        return struct.unpack("<f", self._take(4))[0]

    def string(self) -> str:
        return self._take(self.i32()).decode("utf-8", errors="replace")

    def align(self, k: int) -> None:
        self.o = (self.o + k - 1) // k * k


class StdFst:
    """Tropical-semiring WFST from OpenFst binary OR text format."""

    def __init__(self, path: str):
        # arcs[state] = list of (ilabel, olabel, weight, nextstate)
        self.arcs: Dict[int, List[Tuple[int, int, float, int]]] = {}
        self.finals: Dict[int, float] = {}
        self.start = 0
        self.isymbols: Optional[Dict[int, str]] = None
        self.osymbols: Optional[Dict[int, str]] = None
        with open(path, "rb") as f:
            raw = f.read()
        if (len(raw) >= 4
                and int.from_bytes(raw[:4], "little", signed=True)
                == FST_MAGIC):
            self._parse_binary(raw)
            return
        self._parse_text(raw.decode("utf-8"))

    @classmethod
    def from_parts(cls, start: int,
                   arcs: Dict[int, List[Tuple[int, int, float, int]]],
                   finals: Dict[int, float]) -> "StdFst":
        """Build in memory (graph builders, e.g. tools/build_tlg.py)."""
        fst = cls.__new__(cls)
        fst.start = start
        fst.arcs = {s: list(a) for s, a in arcs.items()}
        fst.finals = dict(finals)
        fst.isymbols = fst.osymbols = None
        return fst

    def _parse_text(self, text: str) -> None:
        first = True
        for line in text.splitlines():
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

    def _parse_binary(self, raw: bytes) -> None:
        """Parse OpenFst binary (the compiled ``HCLG.fst`` Kaldi ships).

        Header framing per fst/fst.h FstHeader::Read; ``vector`` body per
        fst/vector-fst.h (per state: final f32, narcs i64, arcs as
        (ilabel i32, olabel i32, weight f32, nextstate i32)); ``const``
        body per fst/const-fst.h (ConstState array {final f32, pos u32,
        narcs u32, niepsilons u32, noepsilons u32} then one flat arc
        array, 16-byte aligned when header version == 1).  Attached
        symbol tables (header flags 0x1/0x2) are read and kept on
        ``self.isymbols``/``self.osymbols``.
        """
        c = _BinCursor(raw)
        magic = c.i32()
        assert magic == FST_MAGIC
        fsttype = c.string()
        arctype = c.string()
        if arctype != "standard":
            raise ValueError(
                f"unsupported OpenFst arc type {arctype!r} "
                "(tropical 'standard' arcs only)")
        version = c.i32()
        flags = c.i32()
        c.u64()                       # properties
        self.start = c.i64()
        numstates = c.i64()
        numarcs = c.i64()
        self.isymbols = (self._read_symbol_table(c)
                         if flags & _FLAG_ISYMBOLS else None)
        self.osymbols = (self._read_symbol_table(c)
                         if flags & _FLAG_OSYMBOLS else None)
        if fsttype == "vector":
            for s in range(numstates):
                final = c.f32()
                if final != math.inf:
                    self.finals[s] = final
                narcs = c.i64()
                if narcs:
                    self.arcs[s] = [(c.i32(), c.i32(), c.f32(), c.i32())
                                    for _ in range(narcs)]
        elif fsttype == "const":
            aligned = version == _CONST_ALIGNED_VERSION
            if aligned:
                c.align(_CONST_FILE_ALIGN)
            states = []
            for s in range(numstates):
                final, pos, narcs = c.f32(), c.u32(), c.u32()
                c.u32(), c.u32()      # niepsilons / noepsilons
                states.append((final, pos, narcs))
            if aligned:
                c.align(_CONST_FILE_ALIGN)
            arcs = [(c.i32(), c.i32(), c.f32(), c.i32())
                    for _ in range(numarcs)]
            for s, (final, pos, narcs) in enumerate(states):
                if final != math.inf:
                    self.finals[s] = final
                if narcs:
                    self.arcs[s] = arcs[pos:pos + narcs]
        else:
            raise ValueError(
                f"unsupported OpenFst fst type {fsttype!r} "
                "('vector'/'const' only — run fstconvert or fstprint)")

    def write_binary(self, path: str) -> None:
        """Serialize as an OpenFst ``vector``/``standard`` binary readable
        by OpenFst/Kaldi tools AND by this loader (round-trip pinned in
        tests/test_wfst_binary.py)."""
        import struct

        def ws(out: bytearray, s: str) -> None:
            b = s.encode()
            out += struct.pack("<i", len(b)) + b

        def symtab(out: bytearray, syms: Dict[int, str]) -> None:
            out += struct.pack("<i", SYMBOL_TABLE_MAGIC)
            ws(out, "lasr")
            out += struct.pack("<qq", max(syms, default=-1) + 1, len(syms))
            for key in sorted(syms):
                ws(out, syms[key])
                out += struct.pack("<q", key)

        n_states = max([self.start]
                       + [s for s in self.arcs]
                       + [a[3] for arcs in self.arcs.values() for a in arcs]
                       + list(self.finals)) + 1
        n_arcs = sum(len(a) for a in self.arcs.values())
        flags = ((self.isymbols is not None and _FLAG_ISYMBOLS or 0)
                 | (self.osymbols is not None and _FLAG_OSYMBOLS or 0))
        out = bytearray(struct.pack("<i", FST_MAGIC))
        ws(out, "vector")
        ws(out, "standard")
        out += struct.pack("<iiQqqq", 2, flags, 0, self.start, n_states,
                           n_arcs)
        if self.isymbols is not None:
            symtab(out, self.isymbols)
        if self.osymbols is not None:
            symtab(out, self.osymbols)
        for s in range(n_states):
            out += struct.pack("<f", self.finals.get(s, math.inf))
            arcs = self.arcs.get(s, [])
            out += struct.pack("<q", len(arcs))
            for il, ol, w, dst in arcs:
                out += struct.pack("<iifi", il, ol, w, dst)
        with open(path, "wb") as f:
            f.write(bytes(out))

    @staticmethod
    def _read_symbol_table(c: "_BinCursor") -> Dict[int, str]:
        """fst/symbol-table.h SymbolTableImpl::Write framing."""
        magic = c.i32()
        if magic != SYMBOL_TABLE_MAGIC:
            raise ValueError("bad attached symbol-table magic")
        c.string()                    # table name
        c.i64()                       # available_key
        size = c.i64()
        out: Dict[int, str] = {}
        for _ in range(size):
            sym = c.string()
            out[c.i64()] = sym
        return out


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
