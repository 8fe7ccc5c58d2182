"""SPMTokenizer remap logic against a stubbed sentencepiece (VERDICT r3
item 7): the image has no sentencepiece wheel, but the LASR-special-id
remapping (reference lasr/data/tokenizer.py:171-184) — the part most
likely to harbor an off-by-one — is pure Python over the Processor
interface, so it is pinned here against a faithful stub.
"""

import pytest

import lasr_tpu.data.tokenizer as tokenizer_mod
from lasr_tpu.data.tokenizer import SPMTokenizer


class _StubProcessor:
    """Minimal sentencepiece.SentencePieceProcessor double.

    Mirrors the default spm layout: unk=0, bos=1, eos=2, pad disabled (-1),
    then user pieces — plus one control piece planted mid-vocab to make the
    removal path order-sensitive.
    """

    _PIECES = ["<unk>", "<s>", "</s>",
               "▁HELLO", "▁WORLD", "ING",
               "<pad-like>",  # id 6: planted as the pad id (mid-vocab)
               "▁A", "LO"]

    def __init__(self, model_file=None):
        self.model_file = model_file

    def vocab_size(self):
        return len(self._PIECES)

    def unk_id(self):
        return 0

    def bos_id(self):
        return 1

    def eos_id(self):
        return 2

    def pad_id(self):
        return 6

    def id_to_piece(self, i):
        return self._PIECES[i]

    def encode(self, text, out_type=str):
        assert out_type is str
        # fixed segmentations, enough for the tests
        table = {
            "HELLO WORLDING": ["▁HELLO", "▁WORLD", "ING"],
            "A HELLO": ["▁A", "▁HELLO"],
            "XYZZY": ["▁A", "<unk>"],
        }
        return table[text]


class _StubSPM:
    SentencePieceProcessor = _StubProcessor


@pytest.fixture()
def spm_tok(monkeypatch):
    monkeypatch.setattr(tokenizer_mod, "_spm", _StubSPM)
    return SPMTokenizer("stub.model")


def test_remap_layout(spm_tok):
    # specials first, then surviving spm pieces in spm-id order, with
    # bos/eos/unk/pad ids dropped — including the mid-vocab pad piece
    assert spm_tok.char_list == [
        "<BLANK>", "<SOS>", "<EOS>", "[MASK]", "[PAD]", "[UNK]",
        "▁HELLO", "▁WORLD", "ING", "▁A", "LO"]
    assert spm_tok.dict_size() == 11
    # no real piece may shadow the reserved special range 0..5
    for piece in ("▁HELLO", "▁WORLD", "ING", "▁A", "LO"):
        assert spm_tok.get_token_id(piece) >= 6
    # spm piece id 3 lands at 6 = len(SPECIAL_KEY) + 0: the off-by-one trap
    assert spm_tok.get_token_id("▁HELLO") == 6


def test_encode_sos_both_ends(spm_tok):
    tokens, ids = spm_tok.encode("hello worlding")
    assert tokens == ["<SOS>", "▁HELLO", "▁WORLD", "ING", "<EOS>"]
    # reference quirk (tokenizer.py:207): SOS *id* at both ends
    assert ids == [1, 6, 7, 8, 1]
    tokens, ids = spm_tok.encode("hello worlding", add_sos_eos=False)
    assert ids == [6, 7, 8]


def test_encode_unknown_piece_maps_to_unk(spm_tok):
    # "<unk>" is not in the remapped dict (it was removed), so it falls
    # back to the LASR UNK id 5 — not the spm unk id 0 (the CTC blank!)
    _, ids = spm_tok.encode("xyzzy", add_sos_eos=False)
    assert ids == [9, 5]


def test_decode_strips_specials_and_joins(spm_tok):
    tokens, text = spm_tok.decode([1, 6, 7, 8, 1], no_special=True)
    assert tokens == ["▁HELLO", "▁WORLD", "ING"]
    assert text == " HELLO WORLDING"
    # without stripping, special ids render as their key strings
    tokens, _ = spm_tok.decode([1, 6, 1])
    assert tokens == ["<SOS>", "▁HELLO", "<SOS>"]


def test_get_id_token_out_of_range(spm_tok):
    assert spm_tok.get_id_token(10_000) == "[UNK]"


def test_import_gate_without_spm(monkeypatch):
    monkeypatch.setattr(tokenizer_mod, "_spm", None)
    with pytest.raises(ImportError):
        SPMTokenizer("stub.model")
