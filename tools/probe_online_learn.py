"""CTC learnability check for the STREAMING model (tiny scale, CPU-ok).

The r3 online rehearsal ended with ctc_cer == 1.0 (all-blank greedy CTC)
after only ~240 optimizer steps at warm_step 600 — probe_online_ctc.py
showed the head genuinely emits blanks.  This tool answers the follow-up:
is that undertraining, or is the chunked-encoder CTC path broken?  It
overfits a 2-block E2E_Transformer_CTC_Online on 8 tone-coded utterances
for a few hundred Adam steps and reports the greedy-CTC CER trajectory.
A healthy path drives CER well below 0.5; a miswired one (e.g. hs_len /
frame-packing disagreement between encoder output and the loss) stays
pinned at 1.0 forever.
"""

import argparse
import sys

import numpy as np

SR = 16000


def tone_utt(ids, rng, n_tok=26):
    """Token i -> 120 ms pure tone; utterance = concatenated tones."""
    seg = int(SR * 0.12)
    t = np.arange(seg) / SR
    env = np.hanning(seg)
    parts = [0.3 * env * np.sin(
        2 * np.pi * (300.0 * (3000.0 / 300.0) ** (i / (n_tok - 1))) * t
        + rng.uniform(0, 2 * np.pi)) for i in ids]
    return np.concatenate(parts).astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--utts", type=int, default=8)
    p.add_argument("--layer-major", type=int, default=1)
    args = p.parse_args()

    from lasr_tpu.utils.env import respect_jax_platforms_env
    respect_jax_platforms_env()
    import jax
    import jax.numpy as jnp
    import optax

    from lasr_tpu.data.frontend import DeviceFrontend
    from lasr_tpu.models.e2e_online import E2E_Transformer_CTC_Online
    from lasr_tpu.models.losses import E2E_Loss, ctc_greedy_cer_device

    n_tok = 10
    odim = n_tok + 4  # blank/unk/sos/eos-style specials headroom
    rng = np.random.default_rng(0)
    labels = [rng.integers(3, 3 + n_tok, rng.integers(4, 9)).tolist()
              for _ in range(args.utts)]
    wavs = [tone_utt([l - 3 for l in lab], rng, n_tok) for lab in labels]
    T = max(len(w) for w in wavs)
    x = np.zeros((args.utts, T), np.float32)
    for i, w in enumerate(wavs):
        x[i, : len(w)] = w
    xlen = np.array([len(w) for w in wavs], np.int32)
    L = max(len(l) for l in labels)
    ys = np.full((args.utts, L), -1, np.int32)
    for i, l in enumerate(labels):
        ys[i, : len(l)] = l
    sos = odim - 1
    ys_in = np.concatenate([np.full((args.utts, 1), sos, np.int32),
                            np.where(ys < 0, 0, ys)], axis=1)[:, :-1]
    ys_out = np.concatenate([ys, np.full((args.utts, 1), -1, np.int32)],
                            axis=1)[:, : L]

    frontend = DeviceFrontend(["norm", "fbank:80"])
    feats, flen = frontend(jnp.asarray(x), jnp.asarray(xlen))

    model = E2E_Transformer_CTC_Online(
        idim=80, odim=odim,
        encoder_attention_dim=64, encoder_attention_heads=2,
        encoder_linear_units=128, encoder_num_blocks=2,
        encoder_left_chunk=16, encoder_center_chunk=16,
        encoder_right_chunk=16,
        decoder_attention_dim=64, decoder_self_attention_heads=2,
        decoder_src_attention_heads=2, decoder_linear_units=128,
        decoder_num_block=1,
        encoder_layer_major=bool(args.layer_major))
    loss_mod = E2E_Loss(size=odim, padding_idx=-1, smoothing=0.1, rate=0.3)

    key = jax.random.PRNGKey(0)
    variables = model.init(key, feats, flen, jnp.asarray(ys_in),
                           deterministic=True)
    tx = optax.adam(3e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, dkey):
        def loss_fn(p):
            out = model.apply(
                {"params": p}, feats, flen, jnp.asarray(ys_in),
                deterministic=False, rngs={"dropout": dkey})
            m = loss_mod.train_forward({
                "att_out": out["att_out"], "ctc_out": out["ctc_out"],
                "att_label": jnp.asarray(ys_out),
                "ctc_label": jnp.asarray(ys),
                "hs_len": out["hs_len"]})
            return m["loss_main"], m
        (loss, m), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, m

    @jax.jit
    def eval_cer(params):
        out = model.apply({"params": params}, feats, flen,
                          jnp.asarray(ys_in), deterministic=True)
        return ctc_greedy_cer_device(out["ctc_out"], jnp.asarray(ys),
                                     out["hs_len"])

    params = variables["params"]
    for i in range(args.steps):
        key, dkey = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, dkey)
        if (i + 1) % 50 == 0:
            cer = float(eval_cer(params))
            print({"step": i + 1, "ctc_loss": round(float(m["ctc_loss"]), 2),
                   "att_loss": round(float(m["att_loss"]), 2),
                   "greedy_ctc_cer": round(cer, 3)}, flush=True)
    final = float(eval_cer(params))
    ok = final < 0.5
    print({"final_ctc_cer": round(final, 3), "ok": ok})
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
