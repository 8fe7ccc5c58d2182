"""Reconcile bench.py's train_step time vs the raw-grad probe time."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lasr_tpu.data.frontend import DeviceFrontend
from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC
from lasr_tpu.models.losses import E2E_Loss
from lasr_tpu.parallel.mesh import make_mesh
from lasr_tpu.train.optimizer import Noam
from lasr_tpu.train.trainer import Trainer

odim = 5000
model = E2E_Conformer_CTC(
    idim=80, odim=odim, encoder_attention_dim=320,
    encoder_attention_heads=8, encoder_linear_units=2048,
    encoder_num_blocks=12, decoder_attention_dim=320,
    decoder_attention_heads=8, decoder_linear_units=2048,
    decoder_num_block=6, encoder_pos_enc_layer_type="rel_pos",
    encoder_selfattention_layer_type="rel_selfattn", dtype=jnp.bfloat16)
criterion = E2E_Loss(size=odim, padding_idx=-1, smoothing=0.1, rate=0.3)
frontend = DeviceFrontend(["norm", "fbank:80", "specaug"])
noam = Noam(model_size=320, factor=3.0, warm_step=25000)
mesh = make_mesh(data=1, devices=jax.devices()[:1])
trainer = Trainer(model, criterion, noam.make(), frontend, mesh=mesh,
                  log_interval=10**9)
B, secs, L = 32, 15.6, 64
S = int(secs * 16000)
rng = np.random.default_rng(0)
batch = {
    "wav_array": (0.1 * rng.standard_normal((B, S))).astype(np.float32),
    "wav_len": np.full((B,), S, np.int32),
    "token_id": rng.integers(6, odim, (B, L)).astype(np.int32),
    "token_len": np.full((B,), L, np.int32),
    "n_utts": B,
}
state = trainer.init_state(batch)
for _ in range(3):
    state, metrics = trainer.train_step(state, batch)
jax.block_until_ready(metrics["loss_main"])
t0 = time.perf_counter()
for _ in range(10):
    state, metrics = trainer.train_step(state, batch)
jax.block_until_ready(metrics["loss_main"])
print(json.dumps({"train_step_ms": (time.perf_counter()-t0)/10*1000}))

# probe-style raw grad (same process, same shapes)
feats = jnp.asarray(rng.standard_normal((B, 1558, 80)), jnp.float32)
feat_len = jnp.full((B,), 1558, jnp.int32)
ys = jnp.asarray(batch["token_id"])
variables = model.init(jax.random.PRNGKey(0), feats, feat_len, ys)
def fwd(p):
    out, _ = model.apply(
        {"params": p, "batch_stats": variables["batch_stats"]},
        feats, feat_len, ys, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"])
    return (out["att_out"].astype(jnp.float32).sum()
            + out["ctc_out"].astype(jnp.float32).sum())
g = jax.jit(lambda p: jax.grad(fwd)(p))
out = g(variables["params"]); jax.block_until_ready(jax.tree.leaves(out)[0])
t0 = time.perf_counter()
for _ in range(10):
    out = g(variables["params"])
jax.block_until_ready(jax.tree.leaves(out)[0])
print(json.dumps({"raw_grad_ms": (time.perf_counter()-t0)/10*1000}))
