"""Extract the ISO 11172-3 Layer III Huffman code tables from the system
libmp3lame library's read-only data.

LAME's tables.c embeds the standard's Table B.7 as per-table code arrays
(tXHB) and length arrays (tXl) in source order.  We scan .rodata for
candidate length arrays (entries in [1, 19] whose Kraft sum is exactly 1)
and candidate code arrays (prefix-free when paired with a length array) —
conditions essentially impossible to satisfy by chance for the 36-256
entry tables — then assign table ids by the known (xlen, ylen) sizes and
source order.  Output is a python literal block pasted into
lasr_tpu/data/_mp3tables.py; correctness is further pinned by the decoder
oracle tests (lame-encoded fixtures decoded bit-exactly vs libmpg123).
"""

import subprocess
import sys
from fractions import Fraction

import numpy as np

LIB = "/usr/lib/x86_64-linux-gnu/libmp3lame.so.0"
# big-value table sizes in source order (table id -> n entries)
SIZES = {1: 4, 2: 9, 3: 9, 5: 16, 6: 16, 7: 36, 8: 36, 9: 36,
         10: 64, 11: 64, 12: 64, 13: 256, 15: 256, 16: 256, 24: 256,
         32: 16, 33: 16}


def rodata():
    out = subprocess.check_output(["objdump", "-h", LIB]).decode()
    for line in out.splitlines():
        parts = line.split()
        if len(parts) > 6 and parts[1] in (".rodata", ".data.rel.ro"):
            size, off = int(parts[2], 16), int(parts[5], 16)
            with open(LIB, "rb") as f:
                f.seek(off)
                yield off, f.read(size)


def kraft_ok(lens):
    return sum(Fraction(1, 2 ** int(x)) for x in lens) == 1


def prefix_free(codes, lens):
    seen = set()
    for c, n in zip(codes, lens):
        c, n = int(c), int(n)
        if c >= (1 << n):
            return False
        seen.add((n, c))
    if len(seen) != len(codes):
        return False
    # prefix-freeness follows from Kraft==1 + distinctness only if no code
    # is a prefix of another; check directly
    by_len = sorted(seen)
    for n, c in by_len:
        for m, d in by_len:
            if m > n and (d >> (m - n)) == c:
                return False
    return True


def _sign_adjust(n):
    """LAME's tXl arrays store hlen + sign bits (+ linbits for the two ESC
    entries of linbits tables): enumerate the plausible adjustment vectors
    for an n-entry table and yield (tag, adjustment array)."""
    side = int(round(n ** 0.5))
    if side * side == n:     # square big-value table, x-major
        x = np.repeat(np.arange(side), side)
        y = np.tile(np.arange(side), side)
        signs = (x > 0).astype(int) + (y > 0).astype(int)
        if side == 16:       # possible ESC tables
            for lb in (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 11, 13):
                esc = lb * ((x == 15).astype(int) + (y == 15).astype(int))
                yield f"sq{side}+lin{lb}", signs + esc
        else:
            yield f"sq{side}", signs
    if n == 16:              # count1 quadruple (v,w,x,y)
        i = np.arange(16)
        pop = ((i >> 3) & 1) + ((i >> 2) & 1) + ((i >> 1) & 1) + (i & 1)
        yield "c1", pop
    if n == 4:               # 2x2
        yield "sq2", np.array([0, 1, 1, 2])


def find_len_arrays(buf, n):
    """Offsets of n-byte runs whose sign-adjusted lengths are a complete
    prefix code (Kraft sum exactly 1)."""
    arr = np.frombuffer(buf, np.uint8)
    out = []
    for tag, adj in _sign_adjust(n):
        stored_min = 1 + adj
        ok_entry = (arr >= 1) & (arr <= 19 + int(adj.max()))
        run = np.convolve(ok_entry.astype(int),
                          np.ones(n, int), "valid") == n
        for i in np.where(run)[0]:
            lens = arr[i: i + n].astype(int) - adj
            if np.all(lens >= 1) and np.all(lens <= 19) and kraft_ok(lens):
                out.append((i, lens.copy(), tag))
    return out


def find_code_arrays(buf, n, lens):
    """Offsets of n-entry uint16/uint32 runs prefix-free under ``lens``."""
    out = []
    for dtype in (np.uint16, np.uint32):
        isz = np.dtype(dtype).itemsize
        a = np.frombuffer(buf[: len(buf) // isz * isz], dtype)
        maxv = (1 << lens.astype(np.int64)) - 1
        for i in range(0, len(a) - n + 1):
            codes = a[i: i + n]
            if np.any(codes.astype(np.int64) > maxv):
                continue
            if prefix_free(codes, lens):
                out.append((i * isz, str(np.dtype(dtype)), codes.copy()))
    return out


def main():
    sections = list(rodata())
    # 1. candidate length arrays per needed size
    len_cands = {}   # size -> [(sec_off, off, lens, tag)]
    for off0, buf in sections:
        for n in sorted(set(SIZES.values())):
            for i, lens, tag in find_len_arrays(buf, n):
                len_cands.setdefault(n, []).append((off0, i, lens, tag))
    for n, c in sorted(len_cands.items()):
        print(f"size {n}: {len(c)} candidate length arrays "
              f"({sorted(set(t for _, _, _, t in c))})", file=sys.stderr)

    # 2. pair with code arrays
    tables = []
    for n, cands in sorted(len_cands.items()):
        for off0, i, lens, tag in cands:
            for coff0, buf in sections:
                for j, dt, codes in find_code_arrays(buf, n, lens):
                    tables.append((off0 + i, coff0 + j, n, lens, codes,
                                   dt, tag))
    # dedup by content
    uniq = {}
    for la, ca, n, lens, codes, dt, tag in tables:
        key = (n, tuple(lens), tuple(codes))
        if key not in uniq or ca < uniq[key][1][1]:
            uniq[key] = (tag, (la, ca, n, lens, codes, dt))
    print(f"{len(uniq)} unique validated (codes, lens) tables",
          file=sys.stderr)
    for tag, (la, ca, n, lens, codes, dt) in sorted(
            uniq.values(), key=lambda t: t[1][1]):
        print(f"# len@{hex(la)} codes@{hex(ca)} n={n} dt={dt} tag={tag} "
              f"maxlen={int(lens.max())}", file=sys.stderr)
        print(f"(  # n={n} codes@{hex(ca)} tag={tag}")
        print(f"  {list(map(int, codes))},")
        print(f"  {list(map(int, lens))},")
        print("),")


if __name__ == "__main__":
    main()
