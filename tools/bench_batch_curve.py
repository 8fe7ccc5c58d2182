"""utts/s vs batch size for the production train step (VERDICT r2 item 1c).

The recipe batches by duration (500 s-audio => 32x15.6 s). A latency-bound
step amortizes fixed costs with batch; doubling utts/batch while halving
acc_grads keeps optimizer semantics identical (optax.MultiSteps averages
micro-batch grads; the reference's accumulate_grad_batches does the same,
bin/train_lighting.py:195), so larger per-step batches are recipe-equivalent.

Run: python tools/bench_batch_curve.py [--batches 32 48 64 96]
Honest timing: chained steps closed by a device_get fetch (BASELINE.md
measurement-bug disclosure).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[32, 48, 64, 96])
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--secs", type=float, default=15.6)
    args = ap.parse_args()

    from lasr_tpu.utils.env import respect_jax_platforms_env
    respect_jax_platforms_env()
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_prng_impl", "rbg")

    from lasr_tpu.data.frontend import DeviceFrontend
    from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC
    from lasr_tpu.models.losses import E2E_Loss
    from lasr_tpu.parallel.mesh import make_mesh
    from lasr_tpu.train.optimizer import Noam
    from lasr_tpu.train.trainer import Trainer

    odim = 5000
    model = E2E_Conformer_CTC(
        idim=80, odim=odim,
        encoder_attention_dim=320, encoder_attention_heads=8,
        encoder_linear_units=2048, encoder_num_blocks=12,
        decoder_attention_dim=320, decoder_attention_heads=8,
        decoder_linear_units=2048, decoder_num_block=6,
        encoder_pos_enc_layer_type="rel_pos",
        encoder_selfattention_layer_type="rel_selfattn",
        encoder_remat_attend=1,   # production default (see bench.py);
                                  # also what keeps B>=64 inside HBM
        dtype=jnp.bfloat16)
    criterion = E2E_Loss(size=odim, padding_idx=-1, smoothing=0.1, rate=0.3)
    frontend = DeviceFrontend(["norm", "fbank:80", "specaug"])
    noam = Noam(model_size=320, factor=3.0, warm_step=25000)
    mesh = make_mesh(data=1, devices=jax.devices()[:1])
    trainer = Trainer(model, criterion, noam.make(), frontend, mesh=mesh,
                      log_interval=10**9)

    S = int(args.secs * 16000)
    L = 64
    rng = np.random.default_rng(0)
    rows = []
    state = None
    for B in args.batches:
        batch = {
            "wav_array": (0.1 * rng.standard_normal((B, S))).astype(np.float32),
            "wav_len": np.full((B,), S, np.int32),
            "token_id": rng.integers(6, odim, (B, L)).astype(np.int32),
            "token_len": np.full((B,), L, np.int32),
            "n_utts": B,
        }
        if state is None:
            state = trainer.init_state(batch)
        batch = {k: (jax.device_put(jnp.asarray(v))
                     if isinstance(v, np.ndarray) else v)
                 for k, v in batch.items()}
        try:
            for _ in range(3):
                state, metrics = trainer.train_step(state, batch)
            float(jax.device_get(metrics["loss_main"]))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, metrics = trainer.train_step(state, batch)
            float(jax.device_get(metrics["loss_main"]))
            dt = time.perf_counter() - t0
        except Exception as e:  # HBM OOM at large B: record, keep going
            msg = str(e)
            rows.append({"batch": B,
                         "error": ("OOM" if "RESOURCE_EXHAUSTED" in msg
                                   or "Out of memory" in msg
                                   else msg.splitlines()[0][:200])})
            print(json.dumps(rows[-1]), flush=True)
            continue
        step_ms = 1000 * dt / args.iters
        utts = B * args.iters / dt
        rows.append({"batch": B, "step_ms": round(step_ms, 1),
                     "utts_per_sec": round(utts, 1),
                     "audio_s_per_sec": round(utts * args.secs, 1)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"curve": rows}))


if __name__ == "__main__":
    main()
