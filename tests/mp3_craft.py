"""Hand-crafted Layer III frames for decoder paths no in-image encoder
emits (intensity stereo: LAME/shine never use it).

Builds syntactically valid MPEG-1 and MPEG-2(LSF) joint-stereo frames
with intensity stereo enabled: the LEFT channel carries a real
Huffman-coded spectrum, the RIGHT channel carries ZERO spectrum and
intensity POSITIONS in its scalefactors — exactly the layout ISO
11172-3 2.4.3.4.9.3 / ISO 13818-3 2.4.3.2 prescribe.  The bytes are
assembled from this file's own independent spelling of the bitstream
syntax; tests/test_mp3.py decodes them with BOTH data/mp3.py and
libmpg123 and compares sample-by-sample, which turns the intensity
paths from "per spec, structurally exercised" into behaviorally
validated.
"""

from __future__ import annotations

from lasr_tpu.data._mp3tables import HUFF_BIG, HUFF_SHAPE, SFB_LONG


class BitWriter:
    def __init__(self):
        self.bits = []

    def w(self, v: int, n: int) -> None:
        assert 0 <= v < (1 << n), (v, n)
        self.bits += [(v >> (n - 1 - i)) & 1 for i in range(n)]

    def nbits(self) -> int:
        return len(self.bits)

    def to_bytes(self, total_len: int) -> bytes:
        assert len(self.bits) <= total_len * 8, "frame overflow"
        bits = self.bits + [0] * (total_len * 8 - len(self.bits))
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i: i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def encode_big_pairs(bw: BitWriter, table: int, values) -> int:
    """Huffman-encode (x, y) pairs with a no-linbits table; returns the
    pair count.  Mirrors the decode loop: code, then x sign, y sign."""
    codes, lens = HUFF_BIG[table]
    rows = HUFF_SHAPE[table]
    assert len(values) % 2 == 0
    for i in range(0, len(values), 2):
        x, y = values[i], values[i + 1]
        # stay below the escape value 15 (needs linbits handling)
        assert abs(x) < min(rows, 15) and abs(y) < min(rows, 15)
        sym = abs(x) * rows + abs(y)
        bw.w(codes[sym], lens[sym])
        if x:
            bw.w(1 if x < 0 else 0, 1)
        if y:
            bw.w(1 if y < 0 else 0, 1)
    return len(values) // 2


def _granule_left(spec, table=13, global_gain=200):
    """Left-channel granule: scalefac_compress 0 (no scalefactor bits in
    either version), long block, all big values in region0."""
    bw = BitWriter()
    nbig = encode_big_pairs(bw, table, spec)
    return {"part2_3": bw.nbits(), "big_values": nbig,
            "global_gain": global_gain, "scalefac_compress": 0,
            "tables": [table, table, table], "region0": 15, "region1": 0,
            "bits": bw}


def _granule_intensity_positions_v1(positions):
    """Right-channel MPEG-1 granule: zero spectrum, 21 3-bit intensity
    positions (scalefac_compress 13 → slen1 = slen2 = 3)."""
    assert len(positions) == 21
    bw = BitWriter()
    for p in positions:
        bw.w(p, 3)
    return {"part2_3": bw.nbits(), "big_values": 0, "global_gain": 210,
            "scalefac_compress": 13, "tables": [0, 0, 0], "region0": 0,
            "region1": 0, "bits": bw}


def _granule_intensity_positions_lsf(positions, intensity_scale):
    """Right-channel LSF granule: zero spectrum, 21 3-bit positions.
    scalefac_compress >> 1 = 3*36 + 3*6 + 3 = 129 → slen [3,3,3],
    nsfb [7,7,7,0] (the long-block intensity partition); bit 0 is
    intensity_scale."""
    assert len(positions) == 21
    bw = BitWriter()
    for p in positions:
        bw.w(p, 3)
    return {"part2_3": bw.nbits(), "big_values": 0, "global_gain": 210,
            "scalefac_compress": (129 << 1) | intensity_scale,
            "tables": [0, 0, 0], "region0": 0, "region1": 0, "bits": bw}


def _side_granule(bw: BitWriter, g: dict, mpeg1: bool) -> None:
    bw.w(g["part2_3"], 12)
    bw.w(g["big_values"], 9)
    bw.w(g["global_gain"], 8)
    bw.w(g["scalefac_compress"], 4 if mpeg1 else 9)
    bw.w(0, 1)                       # window_switching off: long block
    for t in g["tables"]:
        bw.w(t, 5)
    bw.w(g["region0"], 4)
    bw.w(g["region1"], 3)
    if mpeg1:
        bw.w(0, 1)                   # preflag
    bw.w(0, 1)                       # scalefac_scale
    bw.w(0, 1)                       # count1table_select


def craft_intensity_frame(mpeg1: bool, spec, positions, mode_ext: int,
                          intensity_scale: int = 0) -> bytes:
    """One joint-stereo frame with intensity on (mode_ext bit 0) and
    optionally MS too (bit 1).  MPEG-1: 44.1 kHz 128 kbps (two granules,
    both carrying ``spec``); LSF: 22.05 kHz 64 kbps (one granule)."""
    if mpeg1:
        hdr = bytes([0xFF, 0xFB, 0x90, 0x40 | (mode_ext << 4)])
        frame_len = 144 * 128000 // 44100          # 417, no padding
        side_len, ngr = 32, 2
    else:
        hdr = bytes([0xFF, 0xF3, 0x80, 0x40 | (mode_ext << 4)])
        frame_len = 72 * 64000 // 22050            # 208
        side_len, ngr = 17, 1
    left = _granule_left(spec)
    right = (_granule_intensity_positions_v1(positions) if mpeg1 else
             _granule_intensity_positions_lsf(positions, intensity_scale))

    side = BitWriter()
    side.w(0, 9 if mpeg1 else 8)     # main_data_begin: no reservoir
    side.w(0, 3 if mpeg1 else 2)     # private bits
    if mpeg1:
        side.w(0, 8)                 # scfsi: all groups retransmitted
    for _ in range(ngr):
        _side_granule(side, left, mpeg1)
        _side_granule(side, right, mpeg1)

    main = BitWriter()
    for _ in range(ngr):
        main.bits += left["bits"].bits
        main.bits += right["bits"].bits
    return (hdr + side.to_bytes(side_len)
            + main.to_bytes(frame_len - 4 - side_len))


def craft_intensity_stream(mpeg1: bool, n_frames: int, seed: int = 0,
                           mode_ext: int = 1,
                           intensity_scale: int = 0) -> bytes:
    """A stream of intensity-stereo frames with varying spectra and
    positions (position 7 appears → exercises the illegal-position
    MS/LR fallback)."""
    import numpy as np
    rng = np.random.default_rng(seed)
    sfb_l = SFB_LONG[44100 if mpeg1 else 22050]
    out = b""
    for _ in range(n_frames):
        # spectrum: nonzero pairs across the low ~9 sfbs, values |v|<=5
        n_pairs = int(rng.integers(20, sfb_l[9] // 2))
        spec = rng.integers(-5, 6, 2 * n_pairs).tolist()
        positions = rng.integers(0, 8, 21).tolist()   # 7 = illegal
        out += craft_intensity_frame(mpeg1, spec, positions, mode_ext,
                                     intensity_scale)
    return out
