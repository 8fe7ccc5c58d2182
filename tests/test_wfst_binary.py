"""OpenFst BINARY graph ingestion for the first-party WFST decoder.

The reference's pykaldi path loads the compiled ``HCLG.fst`` binary
directly (/root/reference/lasr/decode/kaldi_decoder.py:17-24); round 3's
first-party decoder required a ``fstprint`` text export.  These tests pin
the binary reader (decode/wfst.py StdFst._parse_binary) against
byte-level fixtures written here by an INDEPENDENT struct.pack spelling
of the public OpenFst serialization (fst/fst.h FstHeader framing,
fst/vector-fst.h and fst/const-fst.h bodies, fst/symbol-table.h attached
tables) — no OpenFst in this image, so the writer below doubles as the
captured-format oracle: vector and const (aligned + unaligned) bodies,
attached symbol tables, tropical weights, and decode equality vs the
same graph loaded from text.
"""

import math
import struct

import numpy as np
import pytest

from lasr_tpu.decode.wfst import (FST_MAGIC, SYMBOL_TABLE_MAGIC,
                                  Kaldi_Decoder, StdFst)

# ---------------------------------------------------------------- fixture
# writer: explicit little-endian spelling of the OpenFst on-disk format


def _ws(out, s):
    b = s.encode()
    out += struct.pack("<i", len(b)) + b


def _symbol_table(syms):
    out = bytearray(struct.pack("<i", SYMBOL_TABLE_MAGIC))
    _ws(out, "t")
    out += struct.pack("<qq", max(syms) + 1, len(syms))
    for key, sym in sorted(syms.items()):
        _ws(out, sym)
        out += struct.pack("<q", key)
    return bytes(out)


def _header(fsttype, version, flags, start, numstates, numarcs,
            arctype="standard"):
    out = bytearray(struct.pack("<i", FST_MAGIC))
    _ws(out, fsttype)
    _ws(out, arctype)
    out += struct.pack("<iiQqqq", version, flags, 0, start, numstates,
                       numarcs)
    return out


def write_vector_fst(path, start, n_states, arcs_by_state, finals,
                     isyms=None, osyms=None):
    """fst/vector-fst.h VectorFst::WriteFst: per state final weight (f32),
    narcs (i64), arcs as (ilabel i32, olabel i32, weight f32, dst i32)."""
    n_arcs = sum(len(a) for a in arcs_by_state.values())
    flags = (1 if isyms else 0) | (2 if osyms else 0)
    out = _header("vector", 2, flags, start, n_states, n_arcs)
    if isyms:
        out += _symbol_table(isyms)
    if osyms:
        out += _symbol_table(osyms)
    for s in range(n_states):
        out += struct.pack("<f", finals.get(s, math.inf))
        arcs = arcs_by_state.get(s, [])
        out += struct.pack("<q", len(arcs))
        for il, ol, w, dst in arcs:
            out += struct.pack("<iifi", il, ol, w, dst)
    path.write_bytes(bytes(out))


def write_const_fst(path, start, n_states, arcs_by_state, finals,
                    aligned=True):
    """fst/const-fst.h ConstFst::WriteFst: ConstState array {final f32,
    pos u32, narcs u32, niepsilons u32, noepsilons u32} then a flat arc
    array; both 16-byte aligned when header version == 1 (the aligned
    kAlignedFileVersion format fstconvert emits)."""
    n_arcs = sum(len(a) for a in arcs_by_state.values())
    out = _header("const", 1 if aligned else 2, 0, start, n_states, n_arcs)

    def pad16():
        while len(out) % 16:
            out.append(0)

    if aligned:
        pad16()
    pos = 0
    for s in range(n_states):
        arcs = arcs_by_state.get(s, [])
        nieps = sum(1 for a in arcs if a[0] == 0)
        noeps = sum(1 for a in arcs if a[1] == 0)
        out += struct.pack("<fIIII", finals.get(s, math.inf), pos,
                           len(arcs), nieps, noeps)
        pos += len(arcs)
    if aligned:
        pad16()
    for s in range(n_states):
        for il, ol, w, dst in arcs_by_state.get(s, []):
            out += struct.pack("<iifi", il, ol, w, dst)
    path.write_bytes(bytes(out))


def write_text_fst(path, start, arcs_by_state, finals):
    lines = []
    for il, ol, w, dst in arcs_by_state.get(start, []):
        lines.append(f"{start} {dst} {il} {ol} {w}")
    for s, arcs in arcs_by_state.items():
        if s == start:
            continue
        for il, ol, w, dst in arcs:
            lines.append(f"{s} {dst} {il} {ol} {w}")
    for s, w in finals.items():
        lines.append(f"{s} {w}")
    path.write_text("\n".join(lines) + "\n")


# a small CTC-style TLG: eps self-loops, weighted paths, one unreachable
# final pruning candidate
GRAPH = {
    0: [(1, 10, 0.5, 1), (2, 20, 1.0, 2), (0, 0, 0.25, 3)],
    1: [(1, 0, 0.0, 1), (3, 30, 0.75, 4)],
    2: [(2, 0, 0.0, 2), (3, 31, 0.25, 4)],
    3: [(1, 11, 0.125, 4)],
    4: [],
}
FINALS = {4: 0.5, 2: 2.0}
N_STATES = 5
START = 0


def _same(a: StdFst, b: StdFst):
    assert a.start == b.start
    assert set(a.arcs) == set(b.arcs)
    for s in a.arcs:
        assert a.arcs[s] == pytest.approx(b.arcs[s])
    assert a.finals == pytest.approx(b.finals)


class TestBinaryParse:
    def test_vector_equals_text(self, tmp_path):
        write_text_fst(tmp_path / "g.txt", START, GRAPH, FINALS)
        write_vector_fst(tmp_path / "g.fst", START, N_STATES, GRAPH, FINALS)
        _same(StdFst(str(tmp_path / "g.txt")), StdFst(str(tmp_path / "g.fst")))

    @pytest.mark.parametrize("aligned", [True, False])
    def test_const_equals_text(self, tmp_path, aligned):
        write_text_fst(tmp_path / "g.txt", START, GRAPH, FINALS)
        write_const_fst(tmp_path / "g.fst", START, N_STATES, GRAPH, FINALS,
                        aligned=aligned)
        _same(StdFst(str(tmp_path / "g.txt")), StdFst(str(tmp_path / "g.fst")))

    def test_attached_symbol_tables(self, tmp_path):
        isyms = {0: "<eps>", 1: "a", 2: "b", 3: "c"}
        osyms = {0: "<eps>", 10: "hello", 11: "again", 20: "wide",
                 30: "world", 31: "word"}
        write_vector_fst(tmp_path / "g.fst", START, N_STATES, GRAPH, FINALS,
                         isyms=isyms, osyms=osyms)
        fst = StdFst(str(tmp_path / "g.fst"))
        assert fst.isymbols == isyms
        assert fst.osymbols == osyms
        write_vector_fst(tmp_path / "p.fst", START, N_STATES, GRAPH, FINALS)
        _same(fst, StdFst(str(tmp_path / "p.fst")))

    def test_nonstandard_arctype_rejected(self, tmp_path):
        out = _header("vector", 2, 0, 0, 0, 0, arctype="log")
        (tmp_path / "g.fst").write_bytes(bytes(out))
        with pytest.raises(ValueError, match="arc type"):
            StdFst(str(tmp_path / "g.fst"))

    def test_unknown_fsttype_rejected(self, tmp_path):
        out = _header("compact", 2, 0, 0, 0, 0)
        (tmp_path / "g.fst").write_bytes(bytes(out))
        with pytest.raises(ValueError, match="fst type"):
            StdFst(str(tmp_path / "g.fst"))

    def test_truncated_rejected(self, tmp_path):
        write_vector_fst(tmp_path / "g.fst", START, N_STATES, GRAPH, FINALS)
        data = (tmp_path / "g.fst").read_bytes()
        (tmp_path / "t.fst").write_bytes(data[:-6])
        with pytest.raises(ValueError, match="truncated"):
            StdFst(str(tmp_path / "t.fst"))


class TestRoundTrip:
    def test_writer_reader_roundtrip(self, tmp_path):
        """Library writer (StdFst.write_binary) vs the independent
        byte-level fixture spelling above: parse equality both ways."""
        by_src = {s: [(il, ol, w, dst) for il, ol, w, dst in a]
                  for s, a in GRAPH.items() if a}
        fst = StdFst.from_parts(START, by_src, FINALS)
        fst.write_binary(str(tmp_path / "lib.fst"))
        write_vector_fst(tmp_path / "ref.fst", START, N_STATES, GRAPH,
                         FINALS)
        _same(StdFst(str(tmp_path / "lib.fst")),
              StdFst(str(tmp_path / "ref.fst")))

    def test_roundtrip_with_symbols(self, tmp_path):
        by_src = {s: list(a) for s, a in GRAPH.items() if a}
        fst = StdFst.from_parts(START, by_src, FINALS)
        fst.isymbols = {0: "<eps>", 1: "x"}
        fst.osymbols = {0: "<eps>", 10: "y"}
        fst.write_binary(str(tmp_path / "s.fst"))
        back = StdFst(str(tmp_path / "s.fst"))
        assert back.isymbols == fst.isymbols
        assert back.osymbols == fst.osymbols
        _same(back, fst)

    def test_build_tlg_binary(self, tmp_path):
        """tools/build_tlg.py --binary output decodes identically to its
        text output."""
        import sys
        sys.path.insert(0, "tools")
        from build_tlg import write_tlg
        from lasr_tpu.decode.ngram_lm import ArpaNgramLM
        arpa = tmp_path / "lm.arpa"
        arpa.write_text("""\\data\\
ngram 1=5
ngram 2=2

\\1-grams:
-0.5\t<s>\t-0.3
-0.4\t</s>
-0.6\tab\t-0.2
-0.7\tba\t-0.2
-0.9\t<unk>

\\2-grams:
-0.2\tab ba
-0.3\tba ab

\\end\\
""")
        lm = ArpaNgramLM(str(arpa))
        lex = {"ab": [0, 1], "ba": [1, 0]}
        n_s, n_a, words = write_tlg(str(tmp_path / "t.txt"),
                                    str(tmp_path / "w.txt"), lex, lm,
                                    n_tokens=2)
        write_tlg(str(tmp_path / "t.fst"), str(tmp_path / "w2.txt"), lex,
                  lm, n_tokens=2, binary=True)
        ll = np.log(np.random.default_rng(3).dirichlet(
            np.ones(3), size=12))   # (T, blank+2 letters) log-posteriors
        outs = []
        for g in ("t.txt", "t.fst"):
            dec = Kaldi_Decoder(beam=1e9, max_active=10**6, mdl=None,
                                fst=str(tmp_path / g),
                                word=str(tmp_path / "w.txt"),
                                acoustic_scale=1.0)
            outs.append(dec.decode_loglike(ll))
        assert outs[0]["text"] == outs[1]["text"]
        assert outs[0]["likelihood"] == pytest.approx(
            outs[1]["likelihood"], abs=1e-4)


class TestBinaryDecode:
    def test_decode_equality_across_formats(self, tmp_path):
        """Same posteriors through text / vector / const graphs must give
        identical hypotheses, alignments and likelihoods."""
        write_text_fst(tmp_path / "g.txt", START, GRAPH, FINALS)
        write_vector_fst(tmp_path / "g_v.fst", START, N_STATES, GRAPH,
                         FINALS)
        write_const_fst(tmp_path / "g_c.fst", START, N_STATES, GRAPH,
                        FINALS, aligned=True)
        (tmp_path / "words.txt").write_text(
            "<eps> 0\nhello 10\nagain 11\nwide 20\nworld 30\nword 31\n")
        outs = []
        for name in ("g.txt", "g_v.fst", "g_c.fst"):
            dec = Kaldi_Decoder(beam=100.0, max_active=100, mdl=None,
                                fst=str(tmp_path / name),
                                word=str(tmp_path / "words.txt"),
                                acoustic_scale=1.0)
            ll = np.random.default_rng(7).standard_normal((3, 4))
            outs.append(dec.decode_loglike(ll))
        for o in outs[1:]:
            assert o["text"] == outs[0]["text"]
            assert o["alignment"] == outs[0]["alignment"]
            assert o["likelihood"] == pytest.approx(outs[0]["likelihood"])
        assert outs[0]["text"]   # non-empty hypothesis
