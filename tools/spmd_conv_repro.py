"""Minimal repro: XLA SPMD partitioner miscompiles a conv whose vmapped
dim is sharded inside a scan.

Structure (exactly the pipeline-parallel schedule of
lasr_tpu/modules/pipeline.py): `lax.scan` over pipeline ticks, each tick
`vmap`s a per-stage function over a [stages, mb, T, C] buffer whose stage
dim is sharded over a 2-device 'pipe' mesh axis along with the stacked
per-stage weights.  When the per-stage function contains
`lax.conv_general_dilated` the sharded run returns values ~O(1) different
from the single-device run; with `dot_general` (einsum) in its place the
two runs are bit-exact.  A bare `vmap(conv)` with the same shardings but
no surrounding scan is also correct — the scan+vmap+conv nesting is
required.

Observed on jax 0.9.0, CPU backend with
XLA_FLAGS=--xla_force_host_platform_device_count=8.

Because of this, the pipelined conformer stack replaces every in-stage
conv with the tap-matmul formulation (modules/convops.py TapConv1d);
run this file to decide whether a jax upgrade has fixed the underlying
bug (both lines print 0.0 when fixed).

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/spmd_conv_repro.py
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def main():
    devs = np.asarray(jax.devices()[:2])
    mesh = Mesh(devs, ("pipe",))
    S, L, Bmb, T, C, K = 2, 2, 2, 16, 8, 1
    M = 4
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((S, L, K, C, C)) * 0.3, jnp.float32)
    stream = jnp.asarray(rng.standard_normal((M, Bmb, T, C)), jnp.float32)

    def conv(x, w1):  # x: (B,T,C), w1: (K,C,C)
        return jax.lax.conv_general_dilated(
            x, w1, (1,), [(K // 2, K // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"))

    def matmul(x, w1):
        return jnp.einsum("btc,cd->btd", x, w1[0])

    def pipeline(op):
        def stage_fn(x, ws):  # scan over the layers within a stage
            def body(c, wl):
                return jnp.tanh(op(c, wl)), None
            y, _ = jax.lax.scan(body, x, ws)
            return y

        def run(w, stream):
            buf = jnp.zeros((S, Bmb, T, C), jnp.float32)

            def tick(carry, t):
                buf = carry
                mb = jax.lax.dynamic_index_in_dim(
                    stream, jax.lax.rem(t, M), 0, keepdims=False)
                buf = buf.at[0].set(mb)
                out = jax.vmap(stage_fn)(buf, w)
                return jnp.roll(out, 1, axis=0), out[-1]

            _, emits = jax.lax.scan(
                tick, buf, jnp.arange(M + S - 1, dtype=jnp.int32))
            return emits[S - 1:]

        return jax.jit(run)

    ws = jax.device_put(w, NamedSharding(mesh, P("pipe")))
    for name, op in [("conv", conv), ("matmul", matmul)]:
        f = pipeline(op)
        y1 = f(w, stream)
        y2 = f(ws, stream)
        d = float(np.abs(np.asarray(y1) - np.asarray(y2)).max())
        print(f"{name}: sharded-vs-single max abs diff = {d}"
              + ("   <-- MISCOMPILE" if d > 1e-6 else ""))


if __name__ == "__main__":
    main()
