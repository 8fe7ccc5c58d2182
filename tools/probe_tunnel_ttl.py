"""Chip-health probe: does the tunneled TPU die after N dispatches or
T minutes, independent of the lasr_tpu trainer?

Round-5 observation: every resumed convergence train process dies with a
bare RESOURCE_EXHAUSTED at its first device_get after ~110 steps /
~17 min from process start (deterministic across 4 attempts, validation
on or off), while round-4 processes ran 37+ min segments on the same
code.  This probe loops a ~50M-param jitted update with a periodic
device_get sync and timestamps each block, so the failure mode (time
TTL vs dispatch count vs memory growth) is identifiable without the
trainer in the loop.

Usage (chip): python tools/probe_tunnel_ttl.py [--minutes 25]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=25.0)
    ap.add_argument("--sync-every", type=int, default=12)
    ap.add_argument("--d", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    print(json.dumps({"backend": jax.default_backend(),
                      "devices": [str(d) for d in jax.devices()]}),
          flush=True)

    d, L = args.d, args.layers
    rng = np.random.default_rng(0)
    params = [jnp.asarray(rng.standard_normal((d, d)), jnp.bfloat16)
              for _ in range(L)]          # 12 x 2048^2 = 50M params

    @jax.jit
    def step(params, x):
        h = x
        for w in params:
            h = jnp.tanh(h @ w)
        loss = jnp.sum(h * h)
        params = [w - jnp.bfloat16(1e-6) * jnp.sum(h) for w in params]
        return params, loss

    x = jnp.asarray(rng.standard_normal((256, d)), jnp.bfloat16)
    t0 = time.time()
    n = 0
    try:
        while time.time() - t0 < args.minutes * 60:
            for _ in range(args.sync_every):
                params, loss = step(params, x)
                n += 1
            val = float(jax.device_get(loss))
            if n % 120 == 0:
                print(json.dumps({"steps": n,
                                  "elapsed_s": round(time.time() - t0, 1),
                                  "loss": val}), flush=True)
    except Exception as e:  # noqa: BLE001 - report and exit with context
        print(json.dumps({"DIED": type(e).__name__, "msg": str(e)[:300],
                          "steps": n,
                          "elapsed_s": round(time.time() - t0, 1)}),
              flush=True)
        raise SystemExit(1)
    print(json.dumps({"survived": True, "steps": n,
                      "elapsed_s": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()
