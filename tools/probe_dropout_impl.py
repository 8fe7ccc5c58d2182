"""A/B the seed-recompute dropout (lasr_tpu/ops/dropout.py) against plain
autodiff-of-select dropout (what flax.linen.Dropout compiles to) on the
full production train step, BACK-TO-BACK IN ONE PROCESS.

Cross-run comparisons on this tunneled chip drift +-3 ms (BASELINE.md:
110.5 / 113.3 / 117.0 for near-identical configs), which swamps the
~5 ms the xprof copy attribution predicts the seed-recompute form saves.
So: compile both variants once each, then time them INTERLEAVED
(A B A B ...) and report per-variant medians — drift hits both arms
equally. Forward numerics are bit-identical between arms by construction
(same keys, same bernoulli, same select), so loss rows must agree to
bf16 fusion-reassociation only.

Run on the chip:  python tools/probe_dropout_impl.py [--rounds 4]
"""

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4,
                    help="ABAB interleave rounds per variant")
    ap.add_argument("--iters", type=int, default=10,
                    help="chained steps per timed segment")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--secs", type=float, default=15.6)
    ap.add_argument("--remat-attend", type=int, default=1)
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
    from lasr_tpu.ops import dropout as dropout_mod

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

    variants = [("autodiff", False), ("seed_recompute", True)]
    arms = {}
    for name, flag in variants:
        dropout_mod.USE_SEED_VJP = flag
        model = E2E_Conformer_CTC(
            idim=80, odim=odim,
            encoder_attention_dim=320, encoder_attention_heads=8,
            encoder_linear_units=2048, encoder_num_blocks=12,
            decoder_attention_dim=320, decoder_attention_heads=8,
            decoder_linear_units=2048, decoder_num_block=6,
            encoder_pos_enc_layer_type="rel_pos",
            encoder_selfattention_layer_type="rel_selfattn",
            encoder_remat_attend=args.remat_attend,
            dtype=jnp.bfloat16)
        criterion = E2E_Loss(size=odim, padding_idx=-1, smoothing=0.1,
                             rate=0.3)
        frontend = DeviceFrontend(["norm", "fbank:80", "specaug"])
        noam = Noam(model_size=320, factor=3.0, warm_step=25000)
        mesh = make_mesh(data=1, devices=jax.devices()[:1])
        trainer = Trainer(model, criterion, noam.make(), frontend,
                          mesh=mesh, log_interval=10**9)
        state = trainer.init_state(batch_np)
        batch = {k: (jax.device_put(jnp.asarray(v))
                     if isinstance(v, np.ndarray) else v)
                 for k, v in batch_np.items()}
        # warm both: compile + 3 steps
        for _ in range(3):
            state, metrics = trainer.train_step(state, batch)
        loss3 = float(jax.device_get(metrics["loss_main"]))
        arms[name] = dict(trainer=trainer, state=state, batch=batch,
                          loss3=loss3, times=[])
        print(json.dumps({"compiled": name, "loss3": round(loss3, 3)}),
              flush=True)

    for r in range(args.rounds):
        for name, _ in variants:
            a = arms[name]
            t0 = time.perf_counter()
            for _ in range(args.iters):
                a["state"], metrics = a["trainer"].train_step(
                    a["state"], a["batch"])
            jax.device_get(metrics["loss_main"])
            dt = (time.perf_counter() - t0) / args.iters
            a["times"].append(1000 * dt)
            print(json.dumps({"round": r, "variant": name,
                              "step_ms": round(1000 * dt, 2)}), flush=True)

    out = {}
    for name, _ in variants:
        med = statistics.median(arms[name]["times"])
        out[name] = {"median_ms": round(med, 2),
                     "all_ms": [round(t, 2) for t in arms[name]["times"]],
                     "utts_per_sec": round(B / (med / 1000), 1),
                     "loss3": round(arms[name]["loss3"], 3)}
    out["delta_ms"] = round(out["seed_recompute"]["median_ms"]
                            - out["autodiff"]["median_ms"], 2)
    print(json.dumps({"ab": out}))


if __name__ == "__main__":
    main()
