"""Host-side audio / Kaldi-scp readers.

First-party replacement for the reference's soundfile/librosa delegation
(``lasr/data/reader.py:15-94``): neither C library is in this image, so WAV
(RIFF) parsing is implemented directly over numpy — PCM 16/24/32-bit and
IEEE float 32/64, arbitrary channel count, returning float64/float32 in
[-1, 1] with the same scaling soundfile uses.  Duration/samplerate probing
reads only the header (the reference probes every file before training,
dataset.py:118-123).

FLAC and mp3 are decoded by first-party codecs (``data/flac.py``,
``data/mp3.py``) — the reference handles them via libsndfile/audioread
(``lasr/data/reader.py:23-29``), neither of which ships here.
"""

from __future__ import annotations

import os
import struct
from typing import IO, List, Tuple

import numpy as np


class WavFormat:
    __slots__ = ("audio_format", "channels", "sample_rate", "bits", "data_size",
                 "data_offset")

    def __init__(self, audio_format, channels, sample_rate, bits, data_size,
                 data_offset):
        self.audio_format = audio_format
        self.channels = channels
        self.sample_rate = sample_rate
        self.bits = bits
        self.data_size = data_size
        self.data_offset = data_offset

    @property
    def num_frames(self) -> int:
        bytes_per_frame = self.channels * (self.bits // 8)
        return self.data_size // bytes_per_frame if bytes_per_frame else 0

    @property
    def duration(self) -> float:
        return self.num_frames / self.sample_rate if self.sample_rate else 0.0


def _parse_wav_header(f: IO[bytes]) -> WavFormat:
    riff = f.read(12)
    if len(riff) < 12 or riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    fmt = None
    while True:
        hdr = f.read(8)
        if len(hdr) < 8:
            raise ValueError("no data chunk found")
        chunk_id, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
        if chunk_id == b"fmt ":
            body = f.read(size)
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            audio_format, channels, sample_rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_format == 0xFFFE and size >= 40:  # WAVE_FORMAT_EXTENSIBLE
                audio_format = struct.unpack("<H", body[24:26])[0]
            fmt = (audio_format, channels, sample_rate, bits)
            if size % 2:
                f.read(1)
        elif chunk_id == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            return WavFormat(*fmt, data_size=size, data_offset=f.tell())
        else:
            f.seek(size + (size % 2), os.SEEK_CUR)


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a WAV file → (waveform float in [-1,1], sample_rate).

    Mono input returns shape (N,); multi-channel returns (N, C) — the same
    layout soundfile.read produces, so the ``avgchannel`` transform applies
    unchanged (datatrans.py:10-14).
    """
    with open(path, "rb") as f:
        wf = _parse_wav_header(f)
        raw = f.read(wf.data_size)
    if wf.audio_format == 1:  # integer PCM
        if wf.bits == 16:
            data = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif wf.bits == 32:
            data = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
        elif wf.bits == 8:
            data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
        elif wf.bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
            val = (b[:, 0].astype(np.int32)
                   | (b[:, 1].astype(np.int32) << 8)
                   | (b[:, 2].astype(np.int32) << 16))
            val = np.where(val >= 1 << 23, val - (1 << 24), val)
            data = val.astype(np.float64) / float(1 << 23)
        else:
            raise ValueError(f"unsupported PCM bit depth {wf.bits}")
    elif wf.audio_format == 3:  # IEEE float
        dtype = "<f4" if wf.bits == 32 else "<f8"
        data = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    else:
        raise ValueError(f"unsupported WAV format code {wf.audio_format}")
    if wf.channels > 1:
        data = data.reshape(-1, wf.channels)
    return data, wf.sample_rate


def read_audio(path: str) -> Tuple[np.ndarray, int]:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        return read_wav(path)
    if ext == ".flac":
        # first-party decoder (data/flac.py; native fast path in
        # native/wavio.cc through native_loader) — the reference reads
        # FLAC via libsndfile (reader.py:23-29)
        from lasr_tpu.data.flac import read_flac
        return read_flac(path)
    if ext == ".mp3":
        # first-party MPEG-1/2/2.5 Layer III decoder (data/mp3.py),
        # validated bit-exact against libmpg123 — the reference decodes
        # mp3 via librosa/audioread (reader.py:23-29)
        from lasr_tpu.data.mp3 import read_mp3
        wav, rate = read_mp3(path)
        if wav.ndim == 2 and wav.shape[1] == 1:
            wav = wav[:, 0]
        return wav, rate
    raise ValueError(f"unknown audio type for {path}")


def _ext(path: str) -> str:
    return os.path.splitext(path)[1].lower()


def _is_flac(path: str) -> bool:
    return _ext(path) == ".flac"


def get_audio_duration(path: str) -> float:
    if _is_flac(path):
        from lasr_tpu.data.flac import flac_info
        return flac_info(path).duration
    if _ext(path) == ".mp3":
        from lasr_tpu.data.mp3 import mp3_info
        rate, _, samples = mp3_info(path)
        return samples / rate
    with open(path, "rb") as f:
        return _parse_wav_header(f).duration


def get_audio_frames(path: str) -> Tuple[int, int]:
    """Header-only (num_frames, sample_rate) probe (wav/flac/mp3)."""
    if _is_flac(path):
        from lasr_tpu.data.flac import flac_info
        fi = flac_info(path)
        return int(fi.total_samples), int(fi.sample_rate)
    if _ext(path) == ".mp3":
        from lasr_tpu.data.mp3 import mp3_info
        rate, _, samples = mp3_info(path)
        return int(samples), int(rate)
    with open(path, "rb") as f:
        fmt = _parse_wav_header(f)
        return int(fmt.num_frames), int(fmt.sample_rate)


def get_audio_samplerate(path: str) -> int:
    if _is_flac(path):
        from lasr_tpu.data.flac import flac_info
        return flac_info(path).sample_rate
    if _ext(path) == ".mp3":
        from lasr_tpu.data.mp3 import mp3_info
        return mp3_info(path)[0]
    with open(path, "rb") as f:
        return _parse_wav_header(f).sample_rate


def write_wav(path: str, data: np.ndarray, sample_rate: int) -> None:
    """PCM16 WAV writer (test fixtures and recipes)."""
    x = np.clip(np.asarray(data, dtype=np.float64), -1.0, 1.0)
    pcm = np.round(x * 32767.0).astype("<i2")
    channels = 1 if pcm.ndim == 1 else pcm.shape[1]
    payload = pcm.tobytes()
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                                      sample_rate * channels * 2, channels * 2, 16))
        f.write(b"data" + struct.pack("<I", len(payload)))
        f.write(payload)


# ---- Kaldi-style list/scp parsing ----

def read_scp(path: str) -> List[Tuple[str, str]]:
    """Parse ``<id> <rest-of-line>`` rows (wav.scp / text)."""
    rows = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            key, _, rest = line.partition(" ")
            rows.append((key, rest))
    return rows


def read_list(path: str) -> List[str]:
    with open(path, "r", encoding="utf-8") as f:
        return f.read().splitlines()


def average_channels(wav: np.ndarray) -> np.ndarray:
    """The reference's ``avgchannel`` transform (datatrans.py:10-14)."""
    if wav.ndim == 2:
        return np.mean(wav, axis=1)
    return wav


def resample_linear(wav: np.ndarray, src_rate: int, dst_rate: int = 16000) -> np.ndarray:
    """Linear-interpolation resampler (host-side fallback for the
    reference's librosa kaiser_fast path, datatrans.py:16-20)."""
    if src_rate == dst_rate:
        return wav
    n_out = int(round(len(wav) * dst_rate / src_rate))
    src_pos = np.arange(n_out, dtype=np.float64) * (src_rate / dst_rate)
    lo = np.minimum(src_pos.astype(np.int64), len(wav) - 1)
    hi = np.minimum(lo + 1, len(wav) - 1)
    frac = src_pos - lo
    return wav[lo] * (1.0 - frac) + wav[hi] * frac
