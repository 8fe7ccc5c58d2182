import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC
from lasr_tpu.models.losses import E2E_Loss

odim = 5000
model = E2E_Conformer_CTC(
    idim=80, odim=odim, encoder_attention_dim=320,
    encoder_attention_heads=8, encoder_linear_units=2048,
    encoder_num_blocks=12, decoder_attention_dim=320,
    decoder_attention_heads=8, decoder_linear_units=2048,
    decoder_num_block=6, encoder_pos_enc_layer_type="rel_pos",
    encoder_selfattention_layer_type="rel_selfattn", dtype=jnp.bfloat16)
criterion = E2E_Loss(size=odim, padding_idx=-1, smoothing=0.1, rate=0.3)
B, L = 32, 64
rng = np.random.default_rng(0)
feats = jnp.asarray(rng.standard_normal((B, 1558, 80)), jnp.float32)
feat_len = jnp.full((B,), 1558, jnp.int32)
ys = jnp.asarray(rng.integers(6, odim, (B, L)), jnp.int32)
variables = model.init(jax.random.PRNGKey(0), feats, feat_len, ys)

def run(name, loss_kind, train):
    def fwd(p):
        kw = dict(deterministic=not train)
        if train:
            kw["rngs"] = {"dropout": jax.random.PRNGKey(1)}
        if train:
            out, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                feats, feat_len, ys, mutable=["batch_stats"], **kw)
        else:
            out = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                feats, feat_len, ys, **kw)
        if loss_kind == "sum":
            return (out["att_out"].astype(jnp.float32).sum()
                    + out["ctc_out"].astype(jnp.float32).sum())
        data = dict(out)
        data["att_label"] = ys
        data["ctc_label"] = ys
        return criterion.train_forward(data)["loss_main"]
    g = jax.jit(lambda p: jax.grad(fwd)(p))
    out = g(variables["params"]); jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = g(variables["params"])
    jax.block_until_ready(jax.tree.leaves(out)[0])
    print(json.dumps({name: (time.perf_counter()-t0)/10*1000}), flush=True)

run("grad_sum_train_ms", "sum", True)
run("grad_sum_eval_ms", "sum", False)
run("grad_loss_train_ms", "loss", True)
