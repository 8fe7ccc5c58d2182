"""Compiled-mode (Mosaic) numerics check for ops/rot_attention.py on the
real chip at recipe shapes — the interpreter-mode tests can't catch
lowering bugs.

Criterion: ERROR PARITY against a float64 numpy oracle.  On TPU, f32
dot_generals run at DEFAULT precision = bf16 MXU passes in BOTH the
Pallas kernel and the XLA reference, so kernel-vs-XLA disagreement at
~1e-3 is rounding under different accumulation orders, not a lowering
bug (the first run of this gate failed exactly that way: fwd 1.9e-3 vs
a 3e-5 tolerance calibrated in interpret mode).  The decisive check is
that the kernel's error against an fp64 oracle is no worse than ~2x the
XLA reference's own error against the same oracle, for the forward AND
all four grads.

Run on the chip:  python tools/check_rot_kernel_tpu.py
"""

import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def oracle(q_u, u, k, v, vt, kv_len, g):
    """fp64 forward + grads of vdot(out, g) wrt (q_u, u, k, v)."""
    q_u, u, k, v, vt, g = (np.asarray(x, np.float64)
                           for x in (q_u, u, k, v, vt, g))
    kv_len = np.asarray(kv_len)
    BH, T, dk = q_u.shape
    inv = 1.0 / math.sqrt(dk)
    z = (q_u @ k.transpose(0, 2, 1) + u @ vt.T) * inv
    mask = np.arange(T)[None, None, :] < kv_len[:, None, None]
    z = np.where(mask, z, -1e30)
    z = z - z.max(-1, keepdims=True)
    e = np.exp(z)
    a = e / e.sum(-1, keepdims=True)
    out = a @ v
    da = g @ v.transpose(0, 2, 1)
    dz = a * (da - (da * a).sum(-1, keepdims=True))
    dz = np.where(mask, dz, 0.0) * inv
    grads = {"dq_u": dz @ k, "du": dz @ vt,
             "dk": dz.transpose(0, 2, 1) @ q_u,
             "dv": a.transpose(0, 2, 1) @ g}
    return out, grads


def rel_err(a, ref):
    scale = float(np.max(np.abs(ref))) or 1.0
    return float(np.max(np.abs(np.asarray(a, np.float64) - ref))) / scale


def main():
    from lasr_tpu.utils.env import respect_jax_platforms_env
    respect_jax_platforms_env()
    import jax
    import jax.numpy as jnp
    from lasr_tpu.ops.rot_attention import (
        _rot_attention_pallas, _xla_reference, rot_attention_context)

    results = []
    for dtype, B, H, T, dk, M in ((jnp.float32, 2, 8, 388, 40, 320),
                                  (jnp.bfloat16, 4, 8, 388, 40, 320),
                                  (jnp.bfloat16, 2, 8, 97, 40, 320)):
        rng = np.random.default_rng(0)
        BH = B * H
        q_u = jnp.asarray(rng.standard_normal((BH, T, dk)), dtype)
        u = jnp.asarray(rng.standard_normal((BH, T, M)) * 0.2, dtype)
        k = jnp.asarray(rng.standard_normal((BH, T, dk)), dtype)
        v = jnp.asarray(rng.standard_normal((BH, T, dk)), dtype)
        vt = jnp.asarray(rng.standard_normal((T, M)) * 0.2, dtype)
        lens = rng.integers(T // 2, T + 1, size=B)
        kv_len = jnp.asarray(np.repeat(lens, H), jnp.int32)
        g = jnp.asarray(rng.standard_normal(q_u.shape), dtype)

        ref_out, ref_grads = oracle(q_u, u, k, v, vt, kv_len, g)

        got, _ = _rot_attention_pallas(q_u, u, k, v, vt, kv_len,
                                       interpret=False)
        xla_out = _xla_reference(q_u, u, k, v, vt, kv_len)

        def via_kernel(q_u, u, k, v):
            return jnp.vdot(
                rot_attention_context(q_u, u, k, v, vt, kv_len), g)

        def via_xla(q_u, u, k, v):
            return jnp.vdot(_xla_reference(q_u, u, k, v, vt, kv_len), g)

        gk = jax.grad(via_kernel, argnums=(0, 1, 2, 3))(q_u, u, k, v)
        gx = jax.grad(via_xla, argnums=(0, 1, 2, 3))(q_u, u, k, v)

        # bf16 inputs leave both paths ~3 bf16-ulps from the fp64 oracle;
        # the floor keeps the ratio criterion from sharpening to noise
        # when XLA happens to land unusually close to the oracle
        floor = 1e-4 if dtype == jnp.float32 else 2e-2
        row = {"dtype": str(dtype.__name__), "T": T}
        oks = []
        ek, ex = rel_err(got, ref_out), rel_err(xla_out, ref_out)
        row["fwd"] = {"kernel_vs_f64": round(ek, 8),
                      "xla_vs_f64": round(ex, 8)}
        oks.append(ek <= max(floor, 2.0 * ex))
        for name, a, b in zip(("dq_u", "du", "dk", "dv"), gk, gx):
            ek = rel_err(a, ref_grads[name])
            ex = rel_err(b, ref_grads[name])
            row[name] = {"kernel_vs_f64": round(ek, 8),
                         "xla_vs_f64": round(ex, 8)}
            oks.append(ek <= max(floor, 2.0 * ex))
        row["ok"] = bool(all(oks))
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"all_ok": all(r["ok"] for r in results)}))


if __name__ == "__main__":
    main()
