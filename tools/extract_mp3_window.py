"""Extract the ISO 11172-3 Table B.3 synthesis window (the 512 'D'
coefficients) from the system codec libraries' read-only data.

The standard prints D rounded to multiples of 2^-16 with |D| < 1.1 and a
characteristic symmetry (D[i] = -D[512-i] on half of the taps); those
properties identify the table uniquely inside .rodata.  Both an encoder
(libmp3lame: analysis window C = D/32, or the same decwin layout) and a
decoder (libmpg123) carry it, so agreement across two independent
libraries validates the extraction.  The verified constants are embedded
in lasr_tpu/data/mp3.py with provenance.
"""

import struct
import subprocess
import sys

import numpy as np


def rodata(path):
    out = subprocess.check_output(["objdump", "-h", path]).decode()
    for line in out.splitlines():
        parts = line.split()
        if len(parts) > 6 and parts[1] in (".rodata", ".data.rel.ro",
                                           ".data"):
            size, off = int(parts[2], 16), int(parts[5], 16)
            with open(path, "rb") as f:
                f.seek(off)
                yield parts[1], off, f.read(size)


def candidates(buf, dtype, n=512):
    """Scan for n consecutive dtype floats, all multiples of 2^-16 (within
    fp rounding), |v| <= 1.2, not all zero."""
    itemsize = np.dtype(dtype).itemsize
    arr = np.frombuffer(buf[: len(buf) // itemsize * itemsize], dtype)
    vals = arr.astype(np.float64)
    ok = (np.abs(vals) <= 1.2) & np.isfinite(vals)
    scaled = vals * 65536.0
    near_int = np.abs(scaled - np.round(scaled)) < 1e-6
    good = ok & near_int
    # windows of n consecutive good entries with enough nonzeros
    run = np.convolve(good.astype(int), np.ones(n, int), "valid") == n
    for i in np.where(run)[0]:
        w = vals[i : i + n]
        if np.count_nonzero(w) > n // 2 and np.abs(w).max() > 0.9:
            yield i * itemsize, w


def main():
    found = {}
    for lib in ("/usr/lib/x86_64-linux-gnu/libmpg123.so.0",
                "/usr/lib/x86_64-linux-gnu/libmp3lame.so.0"):
        for sec, off, buf in rodata(lib):
            for dtype in (np.float32, np.float64):
                for pos, w in candidates(buf, dtype):
                    key = tuple(np.round(w * 65536).astype(int))
                    found.setdefault(key, []).append(
                        (lib, sec, off + pos, str(np.dtype(dtype))))
    print(f"{len(found)} distinct 512-float candidate tables")
    for key, sites in found.items():
        w = np.asarray(key) / 65536.0
        print("sites:", sites)
        print("  first 8:", w[:8])
        print("  max |v|:", np.abs(w).max())
        # ISO D window known head: 0, -2^-16 x several, ...
        print("  head-int:", key[:12])
        print("  tail-int:", key[-6:])


if __name__ == "__main__":
    sys.exit(main())
