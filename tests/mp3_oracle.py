"""Test-only ctypes oracles for the first-party mp3 decoder.

Two INDEPENDENT system libraries ship in this image:
  - libmp3lame.so.0  — reference encoder (generates fixtures)
  - libmpg123.so.0   — reference decoder (golden output)

Neither is a runtime dependency of lasr_tpu; they exist so the
first-party decoder (lasr_tpu/data/mp3.py) is validated against
third-party implementations rather than a same-author round-trip
(the FLAC gate's one weakness).  Tests skip when the libraries are
absent.
"""

import ctypes
import ctypes.util

import numpy as np


def _load(*names):
    for n in names:
        try:
            return ctypes.CDLL(n)
        except OSError:
            continue
    return None


def have_lame():
    return _load("libmp3lame.so.0", "libmp3lame.so") is not None


def have_mpg123():
    return _load("libmpg123.so.0", "libmpg123.so") is not None


def lame_encode(pcm, sample_rate, *, bitrate=64, stereo=False,
                joint_stereo=True, quality=5):
    """Encode int16 PCM → mp3 bytes via libmp3lame.

    pcm: (n,) mono or (n, 2) stereo int16 array.
    """
    lame = _load("libmp3lame.so.0", "libmp3lame.so")
    if lame is None:
        raise RuntimeError("libmp3lame not available")
    lame.lame_init.restype = ctypes.c_void_p
    gf = ctypes.c_void_p(lame.lame_init())
    pcm = np.asarray(pcm)
    nch = 2 if pcm.ndim == 2 else 1
    lame.lame_set_in_samplerate(gf, sample_rate)
    lame.lame_set_num_channels(gf, nch)
    lame.lame_set_out_samplerate(gf, sample_rate)
    lame.lame_set_brate(gf, bitrate)
    lame.lame_set_quality(gf, quality)
    # 0=stereo, 1=joint stereo, 3=mono
    mode = 3 if nch == 1 else (1 if joint_stereo else 0)
    lame.lame_set_mode(gf, mode)
    lame.lame_set_bWriteVbrTag(gf, 0)
    if lame.lame_init_params(gf) < 0:
        raise RuntimeError("lame_init_params failed")

    n = pcm.shape[0]
    if nch == 1:
        left = np.ascontiguousarray(pcm.astype(np.int16))
        right = left
    else:
        left = np.ascontiguousarray(pcm[:, 0].astype(np.int16))
        right = np.ascontiguousarray(pcm[:, 1].astype(np.int16))
    bufsize = int(1.25 * n + 7200)
    buf = (ctypes.c_ubyte * bufsize)()
    m = lame.lame_encode_buffer(
        gf, left.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
        right.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
        n, buf, bufsize)
    if m < 0:
        raise RuntimeError(f"lame_encode_buffer: {m}")
    out = bytes(buf[:m])
    m = lame.lame_encode_flush(gf, buf, bufsize)
    out += bytes(buf[:m])
    lame.lame_close(gf)
    return out


def mpg123_decode(data):
    """Decode mp3 bytes → (float32 (n, ch) in [-1, 1], sample_rate) via
    libmpg123 (forced to float output)."""
    lib = _load("libmpg123.so.0", "libmpg123.so")
    if lib is None:
        raise RuntimeError("libmpg123 not available")
    lib.mpg123_init()
    lib.mpg123_new.restype = ctypes.c_void_p
    err = ctypes.c_int(0)
    mh = ctypes.c_void_p(lib.mpg123_new(None, ctypes.byref(err)))
    # force float32 output for all rates
    MPG123_ENC_FLOAT_32 = 0x200
    lib.mpg123_format_none(mh)
    for rate in (8000, 11025, 12000, 16000, 22050, 24000, 32000, 44100,
                 48000):
        lib.mpg123_format(mh, ctypes.c_long(rate), 3,
                          MPG123_ENC_FLOAT_32)
    if lib.mpg123_open_feed(mh) != 0:
        raise RuntimeError("mpg123_open_feed failed")
    lib.mpg123_feed(mh, data, len(data))

    rate = ctypes.c_long(0)
    nch = ctypes.c_int(0)
    enc = ctypes.c_int(0)
    chunks = []
    buf = (ctypes.c_ubyte * 65536)()
    done = ctypes.c_size_t(0)
    MPG123_OK, MPG123_NEW_FORMAT, MPG123_NEED_MORE, MPG123_DONE = \
        0, -11, -10, -12
    while True:
        r = lib.mpg123_read(mh, buf, 65536, ctypes.byref(done))
        if done.value:
            chunks.append(bytes(buf[: done.value]))
        if r == MPG123_NEW_FORMAT:
            lib.mpg123_getformat(mh, ctypes.byref(rate), ctypes.byref(nch),
                                 ctypes.byref(enc))
        elif r in (MPG123_NEED_MORE, MPG123_DONE):
            break
        elif r != MPG123_OK:
            break
    lib.mpg123_delete(mh)
    pcm = np.frombuffer(b"".join(chunks), np.float32)
    if nch.value > 1:
        pcm = pcm.reshape(-1, nch.value)
    else:
        pcm = pcm.reshape(-1, 1)
    return pcm, int(rate.value)


if __name__ == "__main__":
    sr = 16000
    t = np.arange(sr * 2) / sr
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 1330 * t))
    pcm = (wav * 32767).astype(np.int16)
    mp3 = lame_encode(pcm, sr, bitrate=64)
    print("encoded", len(mp3), "bytes")
    out, rate = mpg123_decode(mp3)
    print("decoded", out.shape, rate)
    # lame adds encoder delay; just check energy correlates
    print("rms in/out", np.sqrt((wav ** 2).mean()),
          np.sqrt((out ** 2).mean()))
