"""Microbenchmark rel-pos attention variants at recipe shapes.

B=32, H=8, T=390, dk=40 (Conformer-L after 4x subsampling of a 500s batch).
Isolates where the rel-pos overhead lives (einsum vs shift vs width).
"""

import json
import sys
import time

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")


def timeit(fn, *args, iters=20):
    """Chain iterations through a data dependence so neither XLA nor the
    runtime can elide repeated identical calls."""
    import jax
    import jax.numpy as jnp
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    acc = out * 0.0
    for _ in range(iters):
        scaled = (args[0] * (1.0 + acc * 1e-30).astype(args[0].dtype),) + args[1:]
        acc = acc + fn(*scaled)
    jax.block_until_ready(acc)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import jax
    import jax.numpy as jnp

    B, H, T, dk = 32, 8, 390, 40
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    q = jnp.asarray(rng.standard_normal((B, T, H, dk)), dt)
    k = jnp.asarray(rng.standard_normal((B, T, H, dk)), dt)
    v = jnp.asarray(rng.standard_normal((B, T, H, dk)), dt)
    p = jnp.asarray(rng.standard_normal((2 * T - 1, H, dk)), dt)

    def shift_classic(x):
        Bx, Hx, Tq, P = x.shape
        zero = jnp.zeros((Bx, Hx, Tq, 1), x.dtype)
        xp = jnp.concatenate([zero, x], axis=-1).reshape(Bx, Hx, P + 1, Tq)
        return xp[:, :, 1:].reshape(Bx, Hx, Tq, P)[..., : P // 2 + 1]

    idx = (jnp.arange(T)[None, :] + (T - 1) - jnp.arange(T)[:, None])  # (Tq,Tk)

    def attn(bd_fn):
        def f(q, k, v, p):
            ac = jnp.einsum("bqhd,bkhd->bhqk", q, k)
            bd = bd_fn(q, p)
            s = (ac + bd).astype(jnp.float32) / np.sqrt(dk)
            a = jax.nn.softmax(s, axis=-1).astype(dt)
            o = jnp.einsum("bhqk,bkhd->bqhd", a, v)
            return (o.astype(jnp.float32) ** 2).sum()
        return f

    def bd_classic(q, p):
        m = jnp.einsum("bqhd,phd->bhqp", q, p)
        return shift_classic(m)[..., :T]

    def bd_gather(q, p):
        m = jnp.einsum("bqhd,phd->bhqp", q, p)
        return jnp.take_along_axis(
            m, jnp.broadcast_to(idx[None, None], (B, H, T, T)), axis=-1)

    def bd_pregather(q, p):
        # gather p rows into (Tq, Tk, H, dk)? too big; instead per-key table:
        # p_k[i,j] = p[T-1-i+j] → einsum over gathered table (memory heavy)
        pg = p[idx]                      # (Tq, Tk, H, dk)
        return jnp.einsum("bqhd,qkhd->bhqk", q, pg)

    def bd_none(q, p):
        return jnp.zeros((B, H, T, T), jnp.float32).astype(dt)

    results = {}
    for name, fn in (("classic", bd_classic), ("gather", bd_gather),
                     ("none", bd_none)):
        f = attn(fn)
        results[f"fwd_{name}_ms"] = timeit(jax.jit(f), q, k, v, p)
        g = jax.jit(lambda *a: jax.grad(f, argnums=(0, 1, 2, 3))(*a)[0].astype(
            jnp.float32).sum())
        results[f"grad_{name}_ms"] = timeit(g, q, k, v, p)
        print(json.dumps(results), flush=True)
    print("FINAL", json.dumps(results))


if __name__ == "__main__":
    main()
