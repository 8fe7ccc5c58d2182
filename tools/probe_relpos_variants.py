"""A/B micro-bench of rel-pos bd-score formulations on the real chip.

Times, chained + device_get:
  1. skew table build: pad/reshape/slice vs static-index row gather
  2. bd fwd+bwd: fold (z @ skewed-table) vs per-layer rel_shift vs
     rotation (RoPE-form, exact only without pos-emb dropout)
Run: python tools/probe_relpos_variants.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from lasr_tpu.modules.attention import build_skewed_pos_table, rel_shift

B, H, T, M, dk = 32, 8, 388, 320, 40
P = 2 * T - 1


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.standard_normal((1, P, M)), jnp.bfloat16)
    z = jnp.asarray(rng.standard_normal((B, H, T, M)), jnp.bfloat16)
    qv = jnp.asarray(rng.standard_normal((B, T, H, dk)), jnp.bfloat16)
    p_proj = jnp.asarray(rng.standard_normal((P, H, dk)), jnp.bfloat16)

    # --- table builds ---
    build_a = jax.jit(build_skewed_pos_table)

    IDX = (T - 1) - np.arange(T)[:, None] + np.arange(T)[None, :]

    @jax.jit
    def build_gather(pe):
        return jnp.take(pe[0], jnp.asarray(IDX), axis=0)

    ta = timeit(build_a, e)
    tb = timeit(build_gather, e)
    np.testing.assert_array_equal(np.asarray(build_a(e), np.float32),
                                  np.asarray(build_gather(e), np.float32))
    print(f"table build pad/reshape: {ta:7.3f} ms   row-gather: {tb:7.3f} ms")

    # --- bd fwd+bwd variants (loss = sum(bd)) ---
    table = build_a(e)

    def grad_time(f, *args):
        g = jax.jit(jax.grad(lambda *a: f(*a).astype(jnp.float32).sum()))
        return timeit(g, *args)

    def fwd_time(f, *args):
        jf = jax.jit(f)
        return timeit(jf, *args)

    def bd_fold(z_, tab):
        return jnp.einsum("bhqm,qkm->bhqk", z_, tab)

    def bd_fold2(z_, tab):
        # alternative output order then transpose at consumer
        return jnp.einsum("bhqm,qkm->bqhk", z_, tab)

    def bd_shift(qv_, pp):
        raw = jnp.einsum("bqhd,phd->bhqp", qv_, pp)
        return rel_shift(raw)[..., :T]

    w = 1.0 / (10000.0 ** (np.arange(0, M, 2, np.float32) / M))
    q_idx = np.arange(T, dtype=np.float32)
    sin_q = jnp.asarray(np.sin(q_idx[:, None] * w), jnp.bfloat16)
    cos_q = jnp.asarray(np.cos(q_idx[:, None] * w), jnp.bfloat16)
    k_idx = np.arange(T, dtype=np.float32)
    basis = np.concatenate([np.cos(k_idx[:, None] * w),
                            np.sin(k_idx[:, None] * w)], axis=1)  # (T, M)
    basis = jnp.asarray(basis, jnp.bfloat16)

    def bd_rot(z_):
        zs, zc = z_[..., 0::2], z_[..., 1::2]
        A = zs * sin_q + zc * cos_q
        Bc = -zs * cos_q + zc * sin_q
        zrot = jnp.concatenate([A, Bc], axis=-1)          # (B,H,T,M)
        return jnp.einsum("bhqm,km->bhqk", zrot, basis)

    for name, f, args in [
            ("fold bhqk   ", bd_fold, (z, table)),
            ("fold bqhk   ", bd_fold2, (z, table)),
            ("shift       ", bd_shift, (qv, p_proj)),
            ("rotation    ", bd_rot, (z,)),
    ]:
        tf = fwd_time(f, *args)
        tg = grad_time(f, *args)
        print(f"bd {name} fwd {tf:7.3f} ms   fwd+bwd {tg:7.3f} ms")

    # numerical check: rotation == fold on the sinusoid table
    pe_rows = np.zeros((P, M), np.float32)
    delta = (T - 1) - np.arange(P, dtype=np.float32)   # row r ↔ distance T-1-r? see below
    # reference layout: row j of pos_emb ↔ distance T-1-j
    d_ = (T - 1) - np.arange(P)
    pe_rows[:, 0::2] = np.sin(d_[:, None] * w)
    pe_rows[:, 1::2] = np.cos(d_[:, None] * w)
    e32 = jnp.asarray(pe_rows[None], jnp.float32)
    tab32 = build_skewed_pos_table(e32)
    z32 = jnp.asarray(np.asarray(z, np.float32))
    ref = np.asarray(jnp.einsum("bhqm,qkm->bhqk", z32, tab32))

    sin_q32 = jnp.asarray(np.sin(q_idx[:, None] * w))
    cos_q32 = jnp.asarray(np.cos(q_idx[:, None] * w))
    basis32 = jnp.asarray(np.concatenate([np.cos(k_idx[:, None] * w),
                                          np.sin(k_idx[:, None] * w)], 1))
    zs, zc = z32[..., 0::2], z32[..., 1::2]
    A = zs * sin_q32 + zc * cos_q32
    Bc = -zs * cos_q32 + zc * sin_q32
    rot = np.asarray(jnp.einsum("bhqm,km->bhqk",
                                jnp.concatenate([A, Bc], -1), basis32))
    err = np.max(np.abs(ref - rot)) / (np.max(np.abs(ref)) + 1e-9)
    print(f"rotation vs fold (f32, sinusoid table): rel err {err:.2e}")


if __name__ == "__main__":
    main()
