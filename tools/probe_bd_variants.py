"""A/B the folded rel-position bd contraction layouts on the real chip.

The profile (tools/xprof_ops.py) shows per-layer relayout copies of the
(B,H,T,T) score-gradient feeding the dz einsum plus ~0.57 ms per bd-grad
einsum.  This probe times fwd+grad of a 12-block attention-only stack for
several mathematically identical einsum arrangements to pick the layout
XLA schedules best.  Run: python tools/probe_bd_variants.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

B, H, T, DK, M = 32, 8, 388, 40, 320
LAYERS = 6


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    qv = jnp.asarray(rng.standard_normal((B, T, H, DK)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, T, H, DK)), jnp.bfloat16)
    e = jnp.asarray(rng.standard_normal((2 * T - 1, M)), jnp.bfloat16)
    kmats = jnp.asarray(rng.standard_normal((LAYERS, M, H, DK)),
                        jnp.bfloat16) * 0.05

    def skew(e2d):  # (P, M) -> (T, T, M)
        P, Mv = e2d.shape
        x = jnp.broadcast_to(e2d[None], (T, P, Mv))
        x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))
        x = x.reshape(P + 1, T, Mv)[1:].reshape(T, P, Mv)
        return x[:, :T]

    def v0(kmat, table):
        z = jnp.einsum("bqhd,mhd->bhqm", qv, kmat)
        return jnp.einsum("bhqm,qkm->bhqk", z, table)

    def v1(kmat, table):
        z = jnp.einsum("bqhd,mhd->qbhm", qv, kmat)
        return jnp.einsum("qbhm,qkm->bhqk", z, table)

    def v2(kmat, table):  # table transposed (T, M, T)
        z = jnp.einsum("bqhd,mhd->bhqm", qv, kmat)
        return jnp.einsum("bhqm,qmk->bhqk", z, table)

    def v3(kmat, table):  # q-leading output, transpose at the end
        z = jnp.einsum("bqhd,mhd->qbhm", qv, kmat)
        bd = jnp.einsum("qbhm,qkm->qbhk", z, table)
        return jnp.moveaxis(bd, 0, 2)

    variants = {"v0_bhqm_qkm": (v0, False), "v1_qbhm_qkm": (v1, False),
                "v2_bhqm_qmk": (v2, True), "v3_qlead_out": (v3, False)}

    for name, (fn, transposed) in variants.items():
        def loss(kms):
            table = skew(e)
            if transposed:
                table = jnp.moveaxis(table, 2, 1)  # (T, M, T)
            acc = 0.0
            for i in range(LAYERS):
                bd = fn(kms[i], table)
                # consume like attention does: softmax + contraction
                att = jax.nn.softmax(bd.astype(jnp.float32), axis=-1)
                acc = acc + jnp.einsum(
                    "bhqk,bkhd->bqhd", att.astype(jnp.bfloat16), k
                ).astype(jnp.float32).sum()
            return acc

        step = jax.jit(jax.grad(loss))
        g = step(kmats)
        float(jax.device_get(g.reshape(-1)[0]))
        t0 = time.perf_counter()
        for _ in range(6):
            g = step(kmats)
        float(jax.device_get(g.reshape(-1)[0]))
        dt = (time.perf_counter() - t0) / 6 * 1000
        print(json.dumps({name: round(dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
