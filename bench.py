"""Benchmark harness: baseline-recipe Conformer train throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The benchmarked step is the full production train step — on-device fbank +
SpecAugment frontend, Conformer-12x320x8h encoder / 6x320 decoder (the
reference recipe model, example/asr_en/conf/config_baseline.yaml:1-23),
joint CTC/attention loss, clip(5), Adam+Noam — on a synthetic batch shaped
like the recipe's 500 s-audio duration batches (32 utts x ~15 s).

The reference publishes no throughput numbers (BASELINE.md), so the first
recorded value establishes the baseline; ``vs_baseline`` is measured against
BASELINE_UTTS_PER_SEC below once set.
"""

import json
import time

import numpy as np

# Honest round-1-start value (TPU v5 lite, bf16, 2026-08-16), re-measured
# at commit ceec503 with the corrected device_get-synced harness:
# 150.5 utts/s/chip, 212.6 ms/step. Later rounds compare here.
#
# MEASUREMENT BUG DISCLOSURE: through most of round 1 this harness synced
# with jax.block_until_ready, which does NOT block on this image's
# remote-TPU runtime — earlier recorded values (307.7 ... 2167.6 utts/s,
# and commit messages quoting them) measured dispatch, not execution.
# Every number here now comes from a chained loop closed by a device_get
# value fetch (a true barrier). See BASELINE.md for the corrected table.
BASELINE_UTTS_PER_SEC = 150.5

# TPU v5 lite (v5e) peak: 197 TFLOP/s bf16 per chip (public spec).  MFU
# below = XLA-counted FLOPs/step / step time / this peak.
V5E_BF16_PEAK_FLOPS = 197e12


def _flops_per_step(trainer, state, batch):
    """FLOPs of one jitted train step, counted by XLA's HLO cost analysis.

    Returns (flops, source) or (None, reason).  Guarded: the axon PJRT
    plugin may not expose cost analysis; fall back to lowered-HLO
    analysis, then to None (MFU omitted rather than guessed).
    """
    from lasr_tpu.parallel.mesh import shard_batch
    sb = shard_batch(trainer.mesh, batch)
    args = (state, sb["wav_array"], sb["wav_len"],
            sb["token_id"], sb["token_len"], trainer.rng)
    try:
        lowered = trainer._jit_train.lower(*args)
    except Exception:
        return None, "lowering failed"
    for src, fn in (("compiled", lambda: lowered.compile().cost_analysis()),
                    ("lowered", lowered.cost_analysis)):
        try:
            ca = fn()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca["flops"])
            if flops > 0:
                return flops, src
        except Exception:
            continue
    # XLA:CPU HLO cost analysis of this exact step (tools/roofline.py
    # --xla-check, 2026-08-17); backend-independent HLO-level count.
    return 5.7658e12, "xla-cpu-precomputed"


def _init_backend_or_die(timeout_s: float = 300.0):
    """jax.devices() HANGS (no error) when this image's axon TPU tunnel
    is down — observed for multi-hour stretches.  Bound the init so the
    driver gets a diagnosable JSON line instead of a wedged process."""
    import os
    import threading

    ok = threading.Event()

    def _init():
        import jax
        jax.devices()
        ok.set()

    t = threading.Thread(target=_init, daemon=True)
    t.start()
    t.join(timeout_s)
    if not ok.is_set():
        print(json.dumps({
            "metric": "conformer_baseline_train_utts_per_sec_per_chip",
            "value": 0.0, "unit": "utts/s", "vs_baseline": 0.0,
            "detail": {"error": "TPU backend init timed out after "
                                f"{timeout_s:.0f}s (axon tunnel down)"},
        }))
        os._exit(1)


def main():
    _init_backend_or_die()
    import jax
    import jax.numpy as jnp

    # hardware RngBitGenerator for dropout masks: threefry costs ~32 ms
    # of the ~180 ms step on this model (tools/probe_components.py)
    jax.config.update("jax_default_prng_impl", "rbg")

    from lasr_tpu.data.frontend import DeviceFrontend
    from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC
    from lasr_tpu.models.losses import E2E_Loss
    from lasr_tpu.parallel.mesh import make_mesh
    from lasr_tpu.train.optimizer import Noam
    from lasr_tpu.train.trainer import Trainer

    odim = 5000  # BPE-5000 vocab (reference en recipe)
    model = E2E_Conformer_CTC(
        idim=80, odim=odim,
        encoder_attention_dim=320, encoder_attention_heads=8,
        encoder_linear_units=2048, encoder_num_blocks=12,
        decoder_attention_dim=320, decoder_attention_heads=8,
        decoder_linear_units=2048, decoder_num_block=6,
        encoder_pos_enc_layer_type="rel_pos",
        encoder_selfattention_layer_type="rel_selfattn",
        # recompute the attention softmax region in the backward pass
        # instead of saving (B,H,T,T) intermediates (numerics-identical):
        # kills their producer->backward-consumer relayout copies.
        # Measured r3 A/B (tools/probe_remat_attend.py, TPU v5e):
        # 120.2 -> 113.3 ms/step; level 2 regresses (130.1) — recomputing
        # scores costs more matmul than the copies it saves.
        encoder_remat_attend=1,
        dtype=jnp.bfloat16)
    criterion = E2E_Loss(size=odim, padding_idx=-1, smoothing=0.1, rate=0.3)
    frontend = DeviceFrontend(["norm", "fbank:80", "specaug"])
    noam = Noam(model_size=320, factor=3.0, warm_step=25000)
    mesh = make_mesh(data=1, devices=jax.devices()[:1])
    trainer = Trainer(model, criterion, noam.make(), frontend, mesh=mesh,
                      log_interval=10**9)

    # synthetic 500s batch: 32 utts x 15.6s, ~60 BPE tokens each
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
    n_params = trainer.param_count(state)
    flops, flops_src = _flops_per_step(trainer, state, batch)

    # device-resident batch: the fit loop prefetches/overlaps input
    # transfers (train/trainer.py), so the step benchmark measures compute;
    # through this image's TPU tunnel a synchronous 32 MB upload would
    # otherwise dominate (~0.5 s/step vs ~3 ms on local PCIe)
    batch = {k: (jax.device_put(jnp.asarray(v))
                 if isinstance(v, np.ndarray) else v)
             for k, v in batch.items()}

    # warmup (compile + 2 steps); sync via device_get — on this image's
    # remote-TPU runtime jax.block_until_ready returns before execution
    # finishes, so only a value fetch is a true barrier
    for _ in range(3):
        state, metrics = trainer.train_step(state, batch)
    float(jax.device_get(metrics["loss_main"]))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = trainer.train_step(state, batch)
    loss = float(jax.device_get(metrics["loss_main"]))
    dt = time.perf_counter() - t0

    utts_per_sec = B * iters / dt
    audio_secs_per_sec = utts_per_sec * secs
    vs = (utts_per_sec / BASELINE_UTTS_PER_SEC
          if BASELINE_UTTS_PER_SEC else 1.0)
    step_s = dt / iters
    if flops is not None:
        tflops_per_s = flops / step_s / 1e12
        mfu_pct = 100.0 * flops / step_s / V5E_BF16_PEAK_FLOPS
    else:
        tflops_per_s = mfu_pct = None
    print(json.dumps({
        "metric": "conformer_baseline_train_utts_per_sec_per_chip",
        "value": round(utts_per_sec, 3),
        "unit": "utts/s",
        "vs_baseline": round(vs, 3),
        "detail": {
            "audio_secs_per_sec": round(audio_secs_per_sec, 1),
            "step_ms": round(1000 * dt / iters, 1),
            "params": n_params,
            "batch_utts": B,
            "batch_audio_s": round(B * secs, 1),
            "dtype": "bfloat16",
            "device": str(jax.devices()[0]),
            "loss": loss,
            "step_flops": flops,
            "flops_source": flops_src,
            "tflops_per_s": (round(tflops_per_s, 1)
                             if tflops_per_s is not None else None),
            "mfu_pct_v5e_bf16": (round(mfu_pct, 1)
                                 if mfu_pct is not None else None),
        },
    }))


if __name__ == "__main__":
    main()
