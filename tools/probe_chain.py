import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC

odim = 5000
model = E2E_Conformer_CTC(
    idim=80, odim=odim, encoder_attention_dim=320,
    encoder_attention_heads=8, encoder_linear_units=2048,
    encoder_num_blocks=12, decoder_attention_dim=320,
    decoder_attention_heads=8, decoder_linear_units=2048,
    decoder_num_block=6, encoder_pos_enc_layer_type="rel_pos",
    encoder_selfattention_layer_type="rel_selfattn", dtype=jnp.bfloat16)
B, L = 32, 64
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((B, 1558, 80)), jnp.float32)
feat_len = jnp.full((B,), 1558, jnp.int32)
ys = jnp.asarray(rng.integers(6, odim, (B, L)), jnp.int32)
variables = model.init(jax.random.PRNGKey(0), feats, feat_len, ys)

def fwd(p, feats, feat_len, ys):
    out, _ = model.apply(
        {"params": p, "batch_stats": variables["batch_stats"]},
        feats, feat_len, ys, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"])
    return (out["att_out"].astype(jnp.float32).sum()
            + out["ctc_out"].astype(jnp.float32).sum())

@jax.jit
def step(p, feats, feat_len, ys):
    g = jax.grad(fwd)(p, feats, feat_len, ys)
    # chain: params evolve so every call depends on the previous one
    return jax.tree.map(lambda a, b: a - 1e-9 * b.astype(a.dtype), p, g)

p = variables["params"]
p = step(p, feats, feat_len, ys)
_ = float(jax.device_get(jax.tree.leaves(p)[0].sum()))
t0 = time.perf_counter()
for _ in range(10):
    p = step(p, feats, feat_len, ys)
val = float(jax.device_get(jax.tree.leaves(p)[0].astype(jnp.float32).sum()))
print(json.dumps({"grad_chained_devget_ms": (time.perf_counter()-t0)/10*1000,
                  "val": val}))
