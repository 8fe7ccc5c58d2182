"""1B-geometry train-step slice on the real chip (VERDICT round-3 item 4).

The 46M recipe model (d=320, dk=40) cannot show the MXU behavior of the
1B stretch config (example/pretrain_1b/conf/config.yaml: d=1280, 16 heads
-> dk=80, ffn 5120): dk=80 fills 80/128 lanes in the score/AV matmuls vs
40/128 at the recipe geometry, and the d=1280 GEMMs are 4x wider.  This
bench runs a 2-encoder-block / 1-decoder-block SLICE of the exact 1B
block geometry on one chip and reports step time + XLA-counted MFU, so
the lane-padding claim in BASELINE.md's posture table is priced on
hardware rather than analytically.

Full-depth execution (24+12 blocks, dp2xtp4+FSDP) is covered by
tests/test_1b_dryrun.py on the 8-device virtual mesh; this tool is the
per-chip MXU-efficiency companion.

Usage (chip):  python tools/bench_1b_slice.py [--blocks 2] [--batch 16]
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
    ap.add_argument("--blocks", type=int, default=2,
                    help="encoder blocks of exact 1B geometry")
    ap.add_argument("--dec-blocks", type=int, default=1)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--secs", type=float, default=15.6)
    ap.add_argument("--odim", type=int, default=5000,
                    help="kept small: vocab projections are not the "
                         "geometry under test")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--remat-attend", type=int, default=1)
    args = ap.parse_args()

    from lasr_tpu.utils.env import respect_jax_platforms_env
    respect_jax_platforms_env()
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_prng_impl", "rbg")
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    # repo-root harness: same FLOP counting + one shared peak constant
    from bench import _flops_per_step, V5E_BF16_PEAK_FLOPS
    from lasr_tpu.data.frontend import DeviceFrontend
    from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC
    from lasr_tpu.models.losses import E2E_Loss
    from lasr_tpu.parallel.mesh import make_mesh
    from lasr_tpu.train.optimizer import Noam
    from lasr_tpu.train.trainer import Trainer

    # exact pretrain_1b block geometry (config.yaml), sliced in depth
    model = E2E_Conformer_CTC(
        idim=80, odim=args.odim,
        encoder_attention_dim=1280, encoder_attention_heads=16,
        encoder_linear_units=5120, encoder_num_blocks=args.blocks,
        decoder_attention_dim=1280, decoder_attention_heads=16,
        decoder_linear_units=5120, decoder_num_block=args.dec_blocks,
        encoder_pos_enc_layer_type="rel_pos",
        encoder_selfattention_layer_type="rel_selfattn",
        encoder_remat_attend=args.remat_attend,
        dtype=jnp.bfloat16)
    criterion = E2E_Loss(size=args.odim, padding_idx=-1, smoothing=0.1,
                         rate=0.3)
    frontend = DeviceFrontend(["norm", "fbank:80", "specaug"])
    noam = Noam(model_size=1280, factor=5.0, warm_step=10000)
    mesh = make_mesh(data=1, devices=jax.devices()[:1])
    trainer = Trainer(model, criterion, noam.make(), frontend, mesh=mesh,
                      log_interval=10**9)

    B, secs, L = args.batch, args.secs, 64
    S = int(secs * 16000)
    rng = np.random.default_rng(0)
    batch = {
        "wav_array": (0.1 * rng.standard_normal((B, S))).astype(np.float32),
        "wav_len": np.full((B,), S, np.int32),
        "token_id": rng.integers(6, args.odim, (B, L)).astype(np.int32),
        "token_len": np.full((B,), L, np.int32),
        "n_utts": B,
    }
    state = trainer.init_state(batch)
    n_params = trainer.param_count(state)
    flops, flops_src = _flops_per_step(trainer, state, batch)
    batch = {k: (jax.device_put(jnp.asarray(v))
                 if isinstance(v, np.ndarray) else v)
             for k, v in batch.items()}

    t0 = time.perf_counter()
    for _ in range(3):
        state, metrics = trainer.train_step(state, batch)
    loss = float(jax.device_get(metrics["loss_main"]))
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = trainer.train_step(state, batch)
    loss = float(jax.device_get(metrics["loss_main"]))
    dt = time.perf_counter() - t0
    step_s = dt / args.iters

    out = {
        "geometry": {"d": 1280, "heads": 16, "dk": 80, "ffn": 5120,
                     "enc_blocks": args.blocks,
                     "dec_blocks": args.dec_blocks},
        "batch": {"utts": B, "secs": secs, "audio_s": round(B * secs, 1)},
        "params": n_params,
        "step_ms": round(1000 * step_s, 1),
        "compile_s": round(compile_s, 1),
        "loss": round(loss, 3),
        "step_flops": flops,
        "flops_source": flops_src,
    }
    if flops:
        out["tflops_per_s"] = round(flops / step_s / 1e12, 1)
        # XLA-counted EXECUTED flops: with remat_attend on, the numerator
        # includes rematerialization recompute, so this is hardware FLOP
        # utilization, not model-FLOPs MFU (the relative claim vs the 46M
        # geometry stands — bench.py counts the same way).
        out["hw_flop_util_pct"] = round(
            100 * flops / step_s / V5E_BF16_PEAK_FLOPS, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
