"""Honest component timings (chained + device_get)."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC

odim = 5000
B, L = 32, 64
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((B, 1558, 80)), jnp.float32)
feat_len = jnp.full((B,), 1558, jnp.int32)
ys = jnp.asarray(rng.integers(6, odim, (B, L)), jnp.int32)

def bench(name, **kw):
    model = E2E_Conformer_CTC(
        idim=80, odim=odim, encoder_attention_dim=320,
        encoder_attention_heads=8, encoder_linear_units=2048,
        encoder_num_blocks=12, decoder_attention_dim=320,
        decoder_attention_heads=8, decoder_linear_units=2048,
        decoder_num_block=6, dtype=jnp.bfloat16, **kw)
    variables = model.init(jax.random.PRNGKey(0), feats, feat_len, ys)
    train = kw.get("_train", True)

    def enc_fwd(p, f):
        hs, hs_len = model.apply(
            {"params": p, "batch_stats": variables.get("batch_stats", {})},
            f, feat_len,
            method=lambda m, a, b: m.encode(a, b, deterministic=False),
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"])[0] if False else (None, None)
        return hs

    # full-model fwd loss proxy: att+ctc sums
    def fwd(p, f, det):
        kw2 = dict(deterministic=det)
        if not det:
            kw2["rngs"] = {"dropout": jax.random.PRNGKey(1)}
        out, _ = model.apply(
            {"params": p, "batch_stats": variables.get("batch_stats", {})},
            f, feat_len, ys, mutable=["batch_stats"], **kw2)
        return (out["att_out"].astype(jnp.float32).sum()
                + out["ctc_out"].astype(jnp.float32).sum())

    for det, tag in ((False, "train"), (True, "eval")):
        @jax.jit
        def step(p, f, det=det):
            g = jax.grad(lambda q: fwd(q, f, det))(p)
            return jax.tree.map(lambda a, b: a - 1e-9 * b.astype(a.dtype),
                                p, g)
        p = step(variables["params"], feats)
        float(jax.device_get(jax.tree.leaves(p)[0].reshape(-1)[0]))
        t0 = time.perf_counter()
        for _ in range(10):
            p = step(p, feats)
        float(jax.device_get(jax.tree.leaves(p)[0].reshape(-1)[0]))
        print(json.dumps({f"{name}_{tag}_grad_ms":
                          round((time.perf_counter()-t0)/10*1000, 1)}),
              flush=True)

bench("relpos", encoder_pos_enc_layer_type="rel_pos",
      encoder_selfattention_layer_type="rel_selfattn")
bench("abspos")
