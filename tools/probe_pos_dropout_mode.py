"""A/B the positional-dropout placement on the full production train step
(chained + device_get, honest timing).

pos_dropout_mode="table" is the reference semantics (dropout on the
(1, 2T-1, D) positional table, embedding.py:197) and forces the skewed-
table fold / rel-shift scoring — the dominant HBM cost of the step
(tools/roofline.py books 13.5 ms/step of skew traffic at recipe shapes).
"rotated" applies the same-rate dropout on the rotated position-query
instead (expectation-equal, documented deviation) and scores through the
one-matmul rotated fold in training.  Deterministic forwards are
identical between modes.

Run on the chip:  python tools/probe_pos_dropout_mode.py
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
    ap.add_argument("--modes", nargs="+",
                    default=["table", "rotated", "rotated+pallas"],
                    help="pos_dropout_mode, optionally '+pallas' for the "
                         "fused rot-fold flash kernel")
    ap.add_argument("--remat-attend", type=int, default=1,
                    help="production default remat level (both arms)")
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--steps", type=int, default=3,
                    help="loss-trajectory steps to print per arm")
    # smoke-test overrides (CPU wiring check); defaults are the recipe batch
    ap.add_argument("--batch", type=int, default=32)
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
    B, secs, L = args.batch, args.secs, 64
    S = int(secs * 16000)
    rng = np.random.default_rng(0)
    batch_np = {
        "wav_array": (0.1 * rng.standard_normal((B, S))).astype(np.float32),
        "wav_len": np.full((B,), S, np.int32),
        "token_id": rng.integers(6, odim, (B, L)).astype(np.int32),
        "token_len": np.full((B,), L, np.int32),
        "n_utts": B,
    }
    rows = []
    for mode in args.modes:
        base, _, suffix = mode.partition("+")
        model = E2E_Conformer_CTC(
            idim=80, odim=odim,
            encoder_attention_dim=320, encoder_attention_heads=8,
            encoder_linear_units=2048, encoder_num_blocks=12,
            decoder_attention_dim=320, decoder_attention_heads=8,
            decoder_linear_units=2048, decoder_num_block=6,
            encoder_pos_enc_layer_type="rel_pos",
            encoder_selfattention_layer_type="rel_selfattn",
            encoder_remat_attend=args.remat_attend,
            encoder_pos_dropout_mode=base,
            encoder_rot_fold_pallas=(suffix == "pallas"),
            dtype=jnp.bfloat16)
        criterion = E2E_Loss(size=odim, padding_idx=-1, smoothing=0.1,
                             rate=0.3)
        frontend = DeviceFrontend(["norm", "fbank:80", "specaug"])
        noam = Noam(model_size=320, factor=3.0, warm_step=25000)
        mesh = make_mesh(data=1, devices=jax.devices()[:1])
        trainer = Trainer(model, criterion, noam.make(), frontend, mesh=mesh,
                          log_interval=10**9)
        state = trainer.init_state(batch_np)
        batch = {k: (jax.device_put(jnp.asarray(v))
                     if isinstance(v, np.ndarray) else v)
                 for k, v in batch_np.items()}
        losses = []
        for _ in range(max(args.steps, 3)):
            state, metrics = trainer.train_step(state, batch)
            losses.append(float(jax.device_get(metrics["loss_main"])))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, metrics = trainer.train_step(state, batch)
        float(jax.device_get(metrics["loss_main"]))
        dt = (time.perf_counter() - t0) / args.iters
        mem = jax.devices()[0].memory_stats() or {}
        rows.append({"pos_dropout_mode": mode,
                     "step_ms": round(1000 * dt, 1),
                     "utts_per_sec": round(B / dt, 1),
                     "loss_traj": [round(x, 2) for x in losses],
                     "peak_hbm_gb": round(mem.get("peak_bytes_in_use", 0)
                                          / 2 ** 30, 2)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"ab": rows}))


if __name__ == "__main__":
    main()
