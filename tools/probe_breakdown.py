"""Honest (device_get-synced, chained) step breakdown on the real chip."""
import sys, time, json
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lasr_tpu.data.frontend import DeviceFrontend
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
frontend = DeviceFrontend(["norm", "fbank:80", "specaug"])
B, L, secs = 32, 64, 15.6
S = int(secs * 16000)
rng = np.random.default_rng(0)
wav = jnp.asarray((0.1 * rng.standard_normal((B, S))).astype(np.float32))
wav_len = jnp.full((B,), S, jnp.int32)
feats = jnp.asarray(rng.standard_normal((B, 1558, 80)), jnp.float32)
feat_len = jnp.full((B,), 1558, jnp.int32)
ys = jnp.asarray(rng.integers(6, odim, (B, L)), jnp.int32)
variables = model.init(jax.random.PRNGKey(0), feats, feat_len, ys)

def timeit(name, step, x0, iters=10):
    x = step(x0)
    _ = float(jax.device_get(jax.tree.leaves(x)[0].reshape(-1)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    _ = float(jax.device_get(jax.tree.leaves(x)[0].reshape(-1)[0].astype(jnp.float32)))
    print(json.dumps({name: round((time.perf_counter()-t0)/iters*1000, 2)}),
          flush=True)

# 1) frontend only (chain on wav)
@jax.jit
def fe_step(w):
    f, fl = frontend(w, wav_len, key=jax.random.PRNGKey(0), train=True)
    return w + 1e-12 * jnp.pad(f.sum(-1), ((0, 0), (0, S - f.shape[1])))[:, :S]
timeit("frontend_ms", fe_step, wav)

# 2) model fwd only (criterion loss, no grad; chain on feats)
@jax.jit
def fwd_step(f):
    out, _ = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        f, feat_len, ys, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"])
    data = dict(out); data["att_label"] = ys; data["ctc_label"] = ys
    loss = criterion.train_forward(data)["loss_main"]
    return f + 1e-12 * loss
timeit("fwd_loss_ms", fwd_step, feats)

# 3) grad with criterion loss (chain on params)
def loss_fn(p, f):
    out, _ = model.apply(
        {"params": p, "batch_stats": variables["batch_stats"]},
        f, feat_len, ys, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"])
    data = dict(out); data["att_label"] = ys; data["ctc_label"] = ys
    return criterion.train_forward(data)["loss_main"]
@jax.jit
def grad_step(p):
    g = jax.grad(loss_fn)(p, feats)
    return jax.tree.map(lambda a, b: a - 1e-9 * b.astype(a.dtype), p, g)
timeit("grad_loss_ms", grad_step, variables["params"])

# 4) grad with sum loss (no CTC lattice / labelsmooth; chain on params)
def loss_sum(p, f):
    out, _ = model.apply(
        {"params": p, "batch_stats": variables["batch_stats"]},
        f, feat_len, ys, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)}, mutable=["batch_stats"])
    return (out["att_out"].astype(jnp.float32).sum()
            + out["ctc_out"].astype(jnp.float32).sum())
@jax.jit
def grad_sum_step(p):
    g = jax.grad(loss_sum)(p, feats)
    return jax.tree.map(lambda a, b: a - 1e-9 * b.astype(a.dtype), p, g)
timeit("grad_sum_ms", grad_sum_step, variables["params"])
