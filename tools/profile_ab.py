"""A/B perf experiments for the Conformer train step on the real chip."""

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


def build(pos_type):
    import jax.numpy as jnp
    from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC
    kw = dict(idim=80, odim=5000,
              encoder_attention_dim=320, encoder_attention_heads=8,
              encoder_linear_units=2048, encoder_num_blocks=12,
              decoder_attention_dim=320, decoder_attention_heads=8,
              decoder_linear_units=2048, decoder_num_block=6,
              dtype=jnp.bfloat16)
    if pos_type == "rel":
        kw.update(encoder_pos_enc_layer_type="rel_pos",
                  encoder_selfattention_layer_type="rel_selfattn")
    return E2E_Conformer_CTC(**kw)


def main():
    import jax
    import jax.numpy as jnp

    B, T, L = 32, 1558, 64
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, T, 80)), jnp.float32)
    feat_len = jnp.full((B,), T, jnp.int32)
    ys = jnp.asarray(rng.integers(6, 5000, (B, L)), jnp.int32)

    results = {}
    for name in ("rel", "abs"):
        model = build(name)
        variables = model.init(jax.random.PRNGKey(0), feats, feat_len, ys)

        def fwd(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                feats, feat_len, ys, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"])
            return out["att_out"].sum() + out["ctc_out"].sum()

        results[f"fwd_{name}_ms"] = timeit(jax.jit(fwd), variables["params"])
        results[f"grad_{name}_ms"] = timeit(
            jax.jit(lambda p: jax.grad(fwd)(p)), variables["params"])
        print(json.dumps(results), flush=True)

    print("FINAL", json.dumps(results))


if __name__ == "__main__":
    main()
