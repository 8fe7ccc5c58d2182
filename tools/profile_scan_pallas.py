"""Grad A/B at full 12 blocks: scan_layers x {pallas, xla}."""
import json, sys, time
import numpy as np
sys.path.insert(0, ".")

def main():
    import jax, jax.numpy as jnp
    from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC
    B, T, L = 32, 1558, 64
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((B, T, 80)), jnp.float32)
    feat_len = jnp.full((B,), T, jnp.int32)
    ys = jnp.asarray(rng.integers(6, 5000, (B, L)), jnp.int32)
    for name, pallas in (("scan_pallas", True), ("scan_xla", False)):
        model = E2E_Conformer_CTC(
            idim=80, odim=5000, encoder_attention_dim=320,
            encoder_attention_heads=8, encoder_linear_units=2048,
            encoder_num_blocks=12, decoder_attention_dim=320,
            decoder_attention_heads=8, decoder_linear_units=2048,
            decoder_num_block=6, encoder_pos_enc_layer_type="rel_pos",
            encoder_selfattention_layer_type="rel_selfattn",
            encoder_use_pallas_attention=pallas, encoder_scan_layers=True,
            dtype=jnp.bfloat16)
        variables = model.init(jax.random.PRNGKey(0), feats, feat_len, ys)
        def fwd(p, feats):
            out, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                feats, feat_len, ys, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(1)},
                mutable=["batch_stats"])
            return (out["att_out"].astype(jnp.float32).sum()
                    + out["ctc_out"].astype(jnp.float32).sum())
        # honest timing: args (not closure constants), chained via the
        # evolving carry, closed by a device_get value fetch — on this
        # image jax.block_until_ready does not actually block
        f = jax.jit(lambda p, x: x + 1e-12 * fwd(p, x))
        x = f(variables["params"], feats)
        float(jax.device_get(x[0, 0, 0]))
        t0 = time.time()
        for _ in range(10):
            x = f(variables["params"], x)
        float(jax.device_get(x[0, 0, 0]))
        print(json.dumps({f"fwd_{name}_ms": (time.time()-t0)/10*1000}),
              flush=True)

        @jax.jit
        def gstep(p, feats):
            g = jax.grad(lambda q: fwd(q, feats))(p)
            return jax.tree.map(lambda a, b: a - 1e-9 * b.astype(a.dtype),
                                p, g)
        t0 = time.time()
        p = gstep(variables["params"], feats)
        float(jax.device_get(jax.tree.leaves(p)[0].reshape(-1)[0]))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(10):
            p = gstep(p, feats)
        float(jax.device_get(jax.tree.leaves(p)[0].reshape(-1)[0]))
        print(json.dumps({f"grad_{name}_ms": (time.time()-t0)/10*1000,
                          f"compile_{name}_s": compile_s}), flush=True)

if __name__ == "__main__":
    main()
