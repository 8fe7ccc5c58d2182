"""Correctness + timing of the fused rel-attention kernel on the real TPU."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from lasr_tpu.ops.rel_attention import (
        _rel_attention_pallas, _xla_reference, rel_attention_context)

    B, H, T, dk = 32, 8, 390, 40
    BH = B * H
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    q_u = jnp.asarray(rng.standard_normal((BH, T, dk)), dt)
    q_v = jnp.asarray(rng.standard_normal((BH, T, dk)), dt)
    k = jnp.asarray(rng.standard_normal((BH, T, dk)), dt)
    v = jnp.asarray(rng.standard_normal((BH, T, dk)), dt)
    p = jnp.asarray(rng.standard_normal((H, 2 * T - 1, dk)), dt)
    kv_len = jnp.asarray(np.repeat(rng.integers(T // 2, T + 1, B), H),
                         jnp.int32)

    # correctness on-device
    got, lse = _rel_attention_pallas(q_u, q_v, k, v, p, kv_len, H=H)
    want = _xla_reference(q_u, q_v, k, v, p, kv_len)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - want.astype(jnp.float32))))
    print(json.dumps({"fwd_max_abs_err": err}), flush=True)

    def loss_pallas(q_u, q_v, k, v, p):
        out = rel_attention_context(q_u, q_v, k, v, p, kv_len)
        return (out.astype(jnp.float32) ** 2).sum()

    def loss_xla(q_u, q_v, k, v, p):
        out = _xla_reference(q_u, q_v, k, v, p, kv_len)
        return (out.astype(jnp.float32) ** 2).sum()

    gp = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4)))
    gx = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4)))
    a = gp(q_u, q_v, k, v, p)
    b = gx(q_u, q_v, k, v, p)
    gerr = max(float(jnp.max(jnp.abs(x.astype(jnp.float32)
                                     - y.astype(jnp.float32))))
               for x, y in zip(a, b))
    print(json.dumps({"grad_max_abs_err": gerr}), flush=True)

    def timeit(fn, *args, iters=30):
        out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        return (time.perf_counter() - t0) / iters * 1000

    f_pallas = jax.jit(lambda *a: _rel_attention_pallas(*a, H=H)[0])
    f_xla = jax.jit(_xla_reference)
    res = {
        "fwd_pallas_ms": timeit(f_pallas, q_u, q_v, k, v, p, kv_len),
        "fwd_xla_ms": timeit(f_xla, q_u, q_v, k, v, p, kv_len),
        "grad_pallas_ms": timeit(gp, q_u, q_v, k, v, p),
        "grad_xla_ms": timeit(gx, q_u, q_v, k, v, p),
    }
    print("FINAL", json.dumps(res))


if __name__ == "__main__":
    main()
