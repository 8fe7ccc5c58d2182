"""Codec robustness: corrupt/garbage inputs must raise clean errors
(ValueError family), never crash with IndexError/struct.error/etc. —
a production data pipeline skips bad files instead of dying.

Strategy: deterministic fuzz — random byte blobs, valid files with a
truncated tail, and valid files with burst bit-flips — through the
first-party WAV/FLAC/mp3 decoders and the duration probes.
"""

import io
import os

import numpy as np
import pytest

from lasr_tpu.data import reader
from lasr_tpu.data.flac import read_flac, write_flac
from lasr_tpu.data.mp3 import Mp3Error, mp3_info, read_mp3

OK_ERRORS = (ValueError, EOFError)  # Mp3Error subclasses ValueError


def _tone_pcm16(n=8000, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    w = 0.3 * np.sin(2 * np.pi * 440 * t) + 0.02 * rng.standard_normal(n)
    return (np.clip(w, -1, 1) * 32767).astype(np.int16)


class TestGarbageBytes:
    def test_random_blobs(self, tmp_path):
        rng = np.random.default_rng(0)
        for trial in range(20):
            blob = rng.integers(0, 256, rng.integers(8, 4096),
                                dtype=np.uint8).tobytes()
            for ext, fn in ((".wav", reader.read_wav),
                            (".flac", read_flac),
                            (".mp3", read_mp3)):
                p = tmp_path / f"junk{trial}{ext}"
                p.write_bytes(blob)
                with pytest.raises(OK_ERRORS):
                    fn(str(p))

    def test_probes_on_garbage(self, tmp_path):
        rng = np.random.default_rng(1)
        for trial in range(10):
            blob = rng.integers(0, 256, 512, dtype=np.uint8).tobytes()
            for ext in (".wav", ".flac", ".mp3"):
                p = tmp_path / f"junk{trial}{ext}"
                p.write_bytes(blob)
                with pytest.raises(OK_ERRORS):
                    reader.get_audio_duration(str(p))


class TestCorruptedValid:
    def _flac(self, tmp_path):
        p = tmp_path / "a.flac"
        write_flac(str(p), _tone_pcm16(), 16000)
        return p

    def test_flac_truncated(self, tmp_path):
        data = self._flac(tmp_path).read_bytes()
        for frac in (0.3, 0.7, 0.95):
            p = tmp_path / f"cut{frac}.flac"
            p.write_bytes(data[: int(len(data) * frac)])
            with pytest.raises(OK_ERRORS):
                read_flac(str(p))

    def test_flac_bitflips(self, tmp_path):
        data = bytearray(self._flac(tmp_path).read_bytes())
        rng = np.random.default_rng(2)
        for trial in range(10):
            c = bytearray(data)
            # burst of flips in the frame region (past the headers)
            lo = rng.integers(64, max(65, len(c) - 32))
            for off in range(int(lo), min(len(c), int(lo) + 8)):
                c[off] ^= int(rng.integers(1, 256))
            p = tmp_path / f"flip{trial}.flac"
            p.write_bytes(bytes(c))
            try:
                read_flac(str(p))   # CRC may detect and raise — fine
            except OK_ERRORS:
                pass

    @pytest.mark.skipif(
        not pytest.importorskip("tests.mp3_oracle").have_lame(),
        reason="lame not available")
    def test_mp3_bitflips_and_truncation(self, tmp_path):
        from tests.mp3_oracle import lame_encode
        pcm = _tone_pcm16(16000).astype(np.float32) / 32767.0
        data = bytearray(lame_encode(pcm, 16000, bitrate=64))
        rng = np.random.default_rng(3)
        # truncations: must decode the intact prefix or raise cleanly
        for frac in (0.25, 0.6, 0.9):
            p = tmp_path / f"cut{frac}.mp3"
            p.write_bytes(bytes(data[: int(len(data) * frac)]))
            try:
                pcm_out, rate = read_mp3(str(p))
                assert rate == 16000 and len(pcm_out) > 0
                mp3_info(str(p))
            except OK_ERRORS:
                pass
        # burst bit-flips anywhere: never IndexError (round-3 _Bits fix)
        for trial in range(15):
            c = bytearray(data)
            lo = int(rng.integers(0, len(c) - 16))
            for off in range(lo, lo + 12):
                c[off] ^= int(rng.integers(1, 256))
            p = tmp_path / f"flip{trial}.mp3"
            p.write_bytes(bytes(c))
            try:
                read_mp3(str(p))
            except OK_ERRORS:
                pass

    def test_wav_truncated_header(self, tmp_path):
        p0 = tmp_path / "w.wav"
        reader.write_wav(str(p0), _tone_pcm16().astype(np.float32) / 32767.0,
                         16000)
        data = p0.read_bytes()
        for cut in (4, 11, 20, 43):
            p = tmp_path / f"w{cut}.wav"
            p.write_bytes(data[:cut])
            with pytest.raises(OK_ERRORS):
                reader.read_wav(str(p))
