"""Host->device transfer probe: measures device_put bandwidth and the
dispatch round-trip on the active backend.

Motivation: the recipe-rehearsal steady state ran ~18 s/step against a
116 ms compiled step — the waveform upload (35 MB/step at batch_duration
500) is the wall on this image's tunneled TPU.  This probe pins the
achievable H2D bandwidth so BASELINE.md can separate framework overhead
from environment transport: on real TPU hosts the same upload rides
PCIe/DMA at GB/s and is fully hidden by the depth-2 prefetch
(trainer.py:_device_prefetch).

Prints one JSON line:
  {"rtt_ms": ..., "mb_per_s": {"1MB_f32": ..., "32MB_f32": ...,
   "16MB_i16": ...}, "step_equiv_s": ...}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from lasr_tpu.utils.env import respect_jax_platforms_env  # noqa: E402
respect_jax_platforms_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _time_put(arr, reps=3):
    # warm once (allocation paths), then best-of-reps
    jax.device_get(jax.device_put(arr))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        buf = jax.device_put(arr)
        # force completion: reduce on device, fetch one scalar back
        # (device_get on the full buffer would time D2H too)
        float(jnp.sum(buf))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    dev = jax.devices()[0]
    # dispatch round-trip: scalar up + scalar back
    s = np.float32(1.0)
    rtt = _time_put(s, reps=10)

    sizes = {
        "1MB_f32": np.zeros(1 << 18, np.float32),
        "8MB_f32": np.zeros(1 << 21, np.float32),
        "32MB_f32": np.zeros(1 << 23, np.float32),
        "16MB_i16": np.zeros(1 << 23, np.int16),
    }
    bw = {}
    for name, arr in sizes.items():
        secs = max(_time_put(arr) - rtt, 1e-9)
        bw[name] = round(arr.nbytes / 2 ** 20 / secs, 2)

    # a rehearsal-shaped step upload: 500 s audio + labels
    batch_f32 = np.zeros((32, 250_000), np.float32)     # 32 MB
    batch_i16 = np.zeros((32, 250_000), np.int16)       # 16 MB
    print(json.dumps({
        "backend": jax.default_backend(),
        "device": str(dev),
        "rtt_ms": round(rtt * 1e3, 2),
        "mb_per_s": bw,
        "rehearsal_step_upload_s": {
            "f32": round(_time_put(batch_f32), 3),
            "i16": round(_time_put(batch_i16), 3),
        },
    }), flush=True)


if __name__ == "__main__":
    main()
