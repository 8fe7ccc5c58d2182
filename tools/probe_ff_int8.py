"""A/B the int8-MXU feed-forward path on the full production train step
(chained + device_get, honest timing).

v5e's MXU runs int8×int8→int32 at 2x its bf16 rate (394 vs 197 TOPS),
and the FF GEMMs (320↔2048, two per macaron block × 12 blocks) are the
single largest matmul slice of the roofline (tools/roofline.py) — the
one cost category the round-3 posture says is already AT its bf16
attainable.  `encoder_ff_int8` (ops/quant.py QuantDense) re-prices that
slice at the int8 rate, at the cost of per-step quantize/dequant
elementwise passes and bounded (<2%) gradient error (tests/test_quant.py).

This probe decides whether the trade lands: step time + loss trajectory
with the flag off vs on, same seeds, production remat level.

Run on the chip:  python tools/probe_ff_int8.py
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
    ap.add_argument("--arms", nargs="+", default=["off", "int8"])
    ap.add_argument("--remat-attend", type=int, default=1,
                    help="production default remat level (both arms)")
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--steps", type=int, default=6,
                    help="loss-trajectory steps to print per arm")
    # smoke-test overrides (CPU wiring check); defaults are the recipe batch
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--secs", type=float, default=15.6)
    ap.add_argument("--blocks", type=int, default=12)
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
    for arm in args.arms:
        model = E2E_Conformer_CTC(
            idim=80, odim=odim,
            encoder_attention_dim=320, encoder_attention_heads=8,
            encoder_linear_units=2048, encoder_num_blocks=args.blocks,
            decoder_attention_dim=320, decoder_attention_heads=8,
            decoder_linear_units=2048, decoder_num_block=6,
            encoder_pos_enc_layer_type="rel_pos",
            encoder_selfattention_layer_type="rel_selfattn",
            encoder_remat_attend=args.remat_attend,
            encoder_ff_int8=(arm == "int8"),
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
        rows.append({"ff_int8": arm,
                     "step_ms": round(1000 * dt, 1),
                     "utts_per_sec": round(B / dt, 1),
                     "loss_traj": [round(x, 2) for x in losses],
                     "peak_hbm_gb": round(mem.get("peak_bytes_in_use", 0)
                                          / 2 ** 30, 2)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"ab": rows}))


if __name__ == "__main__":
    main()
