"""Compiled-mode (Mosaic) numerics check for ops/rot_attention.py on the
real chip at recipe shapes — the interpreter-mode tests can't catch
lowering bugs.  Compares kernel fwd and all four grads against the XLA
reference in f32 and bf16.

Run on the chip:  python tools/check_rot_kernel_tpu.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

        got, _ = _rot_attention_pallas(q_u, u, k, v, vt, kv_len,
                                       interpret=False)
        want = _xla_reference(q_u, u, k, v, vt, kv_len)
        fwd_err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                        - want.astype(jnp.float32))))

        g = jnp.asarray(rng.standard_normal(q_u.shape), dtype)

        def via_kernel(q_u, u, k, v):
            return jnp.vdot(
                rot_attention_context(q_u, u, k, v, vt, kv_len), g)

        def via_xla(q_u, u, k, v):
            return jnp.vdot(_xla_reference(q_u, u, k, v, vt, kv_len), g)

        gk = jax.grad(via_kernel, argnums=(0, 1, 2, 3))(q_u, u, k, v)
        gx = jax.grad(via_xla, argnums=(0, 1, 2, 3))(q_u, u, k, v)
        grad_err = {}
        for name, a, b in zip(("dq_u", "du", "dk", "dv"), gk, gx):
            a = a.astype(jnp.float32)
            b = b.astype(jnp.float32)
            scale = float(jnp.max(jnp.abs(b))) or 1.0
            grad_err[name] = float(jnp.max(jnp.abs(a - b))) / scale
        tol = 3e-5 if dtype == jnp.float32 else 3e-2
        ok = fwd_err < (1e-4 if dtype == jnp.float32 else 0.05) and \
            all(e < tol for e in grad_err.values())
        results.append({"dtype": str(dtype.__name__), "T": T,
                        "fwd_max_abs_err": round(fwd_err, 8),
                        "grad_rel_err": {kk: round(vv, 8)
                                         for kk, vv in grad_err.items()},
                        "ok": bool(ok)})
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"all_ok": all(r["ok"] for r in results)}))


if __name__ == "__main__":
    main()
