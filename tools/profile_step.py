"""Breakdown timing of the fused train step on the real chip.

Variants isolate the frontend, CTC loss, attention branch, and dtype so we
know where the 104 ms goes before optimizing. Run: python tools/profile_step.py
"""

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
    import optax

    from lasr_tpu.data.frontend import DeviceFrontend, pack_s2s
    from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC
    from lasr_tpu.models.losses import E2E_Loss

    odim = 5000
    model = E2E_Conformer_CTC(
        idim=80, odim=odim,
        encoder_attention_dim=320, encoder_attention_heads=8,
        encoder_linear_units=2048, encoder_num_blocks=12,
        decoder_attention_dim=320, decoder_attention_heads=8,
        decoder_linear_units=2048, decoder_num_block=6,
        encoder_pos_enc_layer_type="rel_pos",
        encoder_selfattention_layer_type="rel_selfattn",
        dtype=jnp.bfloat16)
    crit = E2E_Loss(size=odim, padding_idx=-1, smoothing=0.1, rate=0.3)
    fe = DeviceFrontend(["norm", "fbank:80", "specaug"])

    B, secs, L = 32, 15.6, 64
    S = int(secs * 16000)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(0.1 * rng.standard_normal((B, S)), jnp.float32)
    wav_len = jnp.full((B,), S, jnp.int32)
    tok = jnp.asarray(rng.integers(6, odim, (B, L)), jnp.int32)
    tok_len = jnp.full((B,), L, jnp.int32)

    feats, feat_len = fe(wav, wav_len)
    ys_in, att_label, ctc_label = pack_s2s(tok, tok_len)
    variables = model.init(jax.random.PRNGKey(0), feats, feat_len, ys_in)
    params, bstats = variables["params"], variables["batch_stats"]

    results = {}

    # frontend alone (fwd only, train mode)
    fefn = jax.jit(lambda w, wl, k: fe(w, wl, key=k, train=True))
    results["frontend_fwd_ms"] = timeit(fefn, wav, wav_len,
                                        jax.random.PRNGKey(0))

    # model fwd only
    def fwd(p, bs):
        out, _ = model.apply({"params": p, "batch_stats": bs}, feats,
                             feat_len, ys_in, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])
        return out["att_out"].sum() + out["ctc_out"].sum()
    results["model_fwd_ms"] = timeit(jax.jit(fwd), params, bstats)

    # full loss fwd+bwd variants
    def make_step(rate):
        c = E2E_Loss(size=odim, padding_idx=-1, smoothing=0.1, rate=rate)

        def loss_fn(p):
            out, _ = model.apply({"params": p, "batch_stats": bstats}, feats,
                                 feat_len, ys_in, deterministic=False,
                                 rngs={"dropout": jax.random.PRNGKey(1)},
                                 mutable=["batch_stats"])
            d = dict(out)
            d["att_label"], d["ctc_label"] = att_label, ctc_label
            if rate == 0.0:
                return c.att_loss(d["att_out"], d["att_label"])
            m = c.train_forward(d)
            return m["loss_main"]

        return jax.jit(lambda p: jax.grad(loss_fn)(p))

    g = make_step(0.3)(params)  # shape check
    results["grad_joint_ms"] = timeit(make_step(0.3), params)
    results["grad_att_only_ms"] = timeit(make_step(0.0), params)

    # fused step incl. frontend
    def fused(p):
        def loss_fn(pp):
            f, fl = fe(wav, wav_len, key=jax.random.PRNGKey(2), train=True)
            out, _ = model.apply({"params": pp, "batch_stats": bstats}, f, fl,
                                 ys_in, deterministic=False,
                                 rngs={"dropout": jax.random.PRNGKey(1)},
                                 mutable=["batch_stats"])
            d = dict(out)
            d["att_label"], d["ctc_label"] = att_label, ctc_label
            return crit.train_forward(d)["loss_main"]
        return jax.grad(loss_fn)(p)
    results["grad_fused_frontend_ms"] = timeit(jax.jit(fused), params)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
