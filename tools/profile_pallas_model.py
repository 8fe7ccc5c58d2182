"""Full-model A/B: Conformer-L with XLA vs Pallas rel-attention."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, *args, iters=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1000


def main():
    import jax
    import jax.numpy as jnp
    from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC

    B, T, L = 32, 1558, 64
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, T, 80)), jnp.float32)
    feat_len = jnp.full((B,), T, jnp.int32)
    ys = jnp.asarray(rng.integers(6, 5000, (B, L)), jnp.int32)

    results = {}
    for name, flag in (("pallas", True), ("xla", False)):
        model = E2E_Conformer_CTC(
            idim=80, odim=5000,
            encoder_attention_dim=320, encoder_attention_heads=8,
            encoder_linear_units=2048, encoder_num_blocks=12,
            decoder_attention_dim=320, decoder_attention_heads=8,
            decoder_linear_units=2048, decoder_num_block=6,
            encoder_pos_enc_layer_type="rel_pos",
            encoder_selfattention_layer_type="rel_selfattn",
            encoder_use_pallas_attention=flag,
            dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), feats, feat_len, ys)

        def fwd(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                feats, feat_len, ys, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"])
            return (out["att_out"].astype(jnp.float32).sum()
                    + out["ctc_out"].astype(jnp.float32).sum())

        results[f"fwd_{name}_ms"] = timeit(jax.jit(fwd), variables["params"])
        g = jax.jit(lambda p: jax.grad(fwd)(p))
        results[f"grad_{name}_ms"] = timeit(g, variables["params"])
        print(json.dumps(results), flush=True)
    print("FINAL", json.dumps(results))


if __name__ == "__main__":
    main()
