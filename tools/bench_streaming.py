"""Streaming-serving latency bench: per-chunk wall latency of the
chunk-incremental recognizer on the real chip.

Measures what a production streaming deployment cares about: the time
from "a chunk of audio arrives" to "its tokens are committed", at a
production-size model (the reference's online config scale), plus the
implied streaming RTF — single-stream burst, single-stream realtime-paced,
beam-quality partials, and (--streams N) a multi-stream server condition:
N concurrent recognizers sharing ONE compiled ServingEngine, chunks
multiplexed round-robin the way a serving frontend would, reporting
p50/p95 per-chunk latency and whether the chip sustains N x realtime.

Trained weights: pass --model-path/--train-config (same flags as
bin/decode.py) to bench the model actually being served; the default is
a random-init online model (worst-case partials — near-uniform
posteriors emit max tokens).

Run from the repo root: python tools/bench_streaming.py [--streams 4]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def build_model(args):
    import jax
    import jax.numpy as jnp
    from lasr_tpu.models.e2e_online import E2E_Transformer_CTC_Online

    if args.train_config:
        import yaml
        from lasr_tpu.utils.registry import BaseConfig
        from lasr_tpu.train.trainer import (load_averaged_params,
                                            decode_variables)
        with open(args.train_config) as f:
            train_config = yaml.safe_load(f)
        model = BaseConfig(**train_config["model_config"]).generateExample()
        params, batch_stats = load_averaged_params(
            args.model_path, args.choose, args.avg)
        return model, decode_variables(params, batch_stats)

    odim = 5002
    model = E2E_Transformer_CTC_Online(
        idim=80, odim=odim,
        encoder_attention_dim=320, encoder_attention_heads=8,
        encoder_linear_units=2048, encoder_num_blocks=12,
        encoder_left_chunk=64, encoder_center_chunk=64,
        encoder_right_chunk=64,
        decoder_attention_dim=320, decoder_self_attention_heads=8,
        decoder_src_attention_heads=8, decoder_linear_units=2048,
        decoder_num_block=6, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((1, 160, 80)), jnp.float32)
    feat_len = jnp.asarray([160], jnp.int32)
    ys = jnp.asarray(rng.integers(6, odim, (1, 6)))
    variables = model.init(jax.random.PRNGKey(0), feats, feat_len, ys)
    return model, variables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=0,
                    help="also run an N-stream multiplexed serving bench")
    ap.add_argument("--secs", type=float, default=20.48)
    ap.add_argument("--train-config", default=None,
                    help="hparams.yaml of a trained online model")
    ap.add_argument("--model-path", default=None)
    ap.add_argument("--choose", default="last")
    ap.add_argument("--avg", type=int, default=1)
    ap.add_argument("--beam-runs", type=int, default=5,
                    help="timed stream repetitions per beam-partial mode "
                         "(variance control: medians/IQRs over all "
                         "refreshes across runs)")
    args = ap.parse_args()

    from lasr_tpu.utils.env import respect_jax_platforms_env
    respect_jax_platforms_env()
    import jax
    from lasr_tpu.decode.online import StreamingRecognizer

    model, variables = build_model(args)
    rng = np.random.default_rng(0)

    # 64 encoder frames per chunk = 256 feature frames = 2.56 s of audio
    chunk = getattr(model, "encoder_center_chunk", 64)
    chunk_samples = chunk * 4 * 160
    secs = args.secs
    wav = (0.1 * rng.standard_normal((int(secs * 16000),))).astype(np.float32)

    chunk_secs = chunk_samples / 16000.0

    def run(realtime: bool):
        """``realtime=True`` paces chunk arrival at the audio rate, the
        serving condition the recognizer's depth-1 pipeline targets: the
        device computes chunk i while chunk i+1's audio arrives, so the
        per-call latency is just the (already finished) fetch."""
        rec = StreamingRecognizer(model, variables)
        lats = []
        for off in range(0, len(wav), chunk_samples):
            t0 = time.perf_counter()
            rec.accept_waveform(wav[off: off + chunk_samples])
            lats.append(time.perf_counter() - t0)
            if realtime:
                time.sleep(max(0.0, chunk_secs - lats[-1]))
        t0 = time.perf_counter()
        rec.finalize()
        lats.append(time.perf_counter() - t0)
        return lats

    def run_beam(incremental: bool):
        """Per-call latency with beam-quality partials, split into
        REFRESH calls (the online joint search runs) and plain chunk
        calls.  ``incremental=True`` benches the resumable search
        (extends over new frames only — VERDICT round-3 item 3);
        ``False`` benches the round-3 from-scratch re-decode."""
        from lasr_tpu.decode.beam import CTCAttBeamDecoder
        dec = CTCAttBeamDecoder(model, variables, beam=10, ctc_beam=15,
                                ctc_weight=0.5, online=True)
        rec = StreamingRecognizer(model, variables, beam_decoder=dec,
                                  beam_interval=2, beam_bucket=128,
                                  beam_incremental=incremental)
        refresh, plain = [], []
        for off in range(0, len(wav), chunk_samples):
            n0 = rec._n_harvested
            t0 = time.perf_counter()
            rec.accept_waveform(wav[off: off + chunk_samples])
            dt = time.perf_counter() - t0
            did_refresh = any(
                n % rec.beam_interval == 0
                for n in range(n0 + 1, rec._n_harvested + 1))
            (refresh if did_refresh else plain).append(dt)
        t0 = time.perf_counter()
        rec.finalize()
        fin = time.perf_counter() - t0
        return refresh, plain, fin

    def run_multi(n_streams: int, realtime: bool):
        """N concurrent streams multiplexed on one engine: each audio-rate
        window delivers one chunk per stream; the server must drain all N
        within chunk_secs to sustain N x realtime.  Streams get distinct
        audio (offset noise) so hypothesis state diverges realistically."""
        recs = [StreamingRecognizer(model, variables)
                for _ in range(n_streams)]
        wavs = [np.roll(wav, 1000 * i).astype(np.float32)
                for i in range(n_streams)]
        lats = []
        windows = []
        for off in range(0, len(wav), chunk_samples):
            w0 = time.perf_counter()
            for rec, w in zip(recs, wavs):
                t0 = time.perf_counter()
                rec.accept_waveform(w[off: off + chunk_samples])
                lats.append(time.perf_counter() - t0)
            busy = time.perf_counter() - w0
            windows.append(busy)
            if realtime:
                time.sleep(max(0.0, chunk_secs - busy))
        for rec in recs:
            rec.finalize()
        return np.asarray(lats), np.asarray(windows)

    def med_iqr(xs):
        xs = np.asarray(xs)
        if len(xs) == 0:
            return None
        return {"median_ms": round(float(np.median(xs) * 1e3), 2),
                "iqr_ms": [round(float(np.quantile(xs, 0.25) * 1e3), 2),
                           round(float(np.quantile(xs, 0.75) * 1e3), 2)],
                "p95_ms": round(float(np.percentile(xs, 95) * 1e3), 2),
                "n": int(len(xs))}

    run(False)  # warmup/compile
    lats = np.asarray(sum((run(False) for _ in range(3)), []))
    rt = np.asarray(sum((run(True) for _ in range(2)), []))
    beam = {}
    for mode, flag in (("incremental", True), ("from_scratch", False)):
        run_beam(flag)  # warmup the mode's buckets
        refresh, plain, fins = [], [], []
        for _ in range(args.beam_runs):
            r, p, f = run_beam(flag)
            refresh += r
            plain += p
            fins.append(f)
        beam[mode] = {"refresh": med_iqr(refresh), "plain": med_iqr(plain),
                      "finalize": med_iqr(fins)}
    detail = {
        "p95_ms": round(float(np.percentile(rt, 95) * 1e3), 2),
        "burst_median_ms": round(float(np.median(lats) * 1e3), 2),
        "burst_p95_ms": round(float(np.percentile(lats, 95) * 1e3), 2),
        "streaming_rtf": round(float(lats.sum() / (3 * secs)), 5),
        "beam_partials": beam,
        "chunk_audio_s": chunk_secs,
        "trained": bool(args.train_config),
        "device": jax.devices()[0].device_kind,
    }
    if args.streams:
        n = args.streams
        run_multi(n, False)  # warm the shared engine across stream states
        mlats, mwin = run_multi(n, True)
        detail["multi"] = {
            "streams": n,
            "chunk_p50_ms": round(float(np.median(mlats) * 1e3), 2),
            "chunk_p95_ms": round(float(np.percentile(mlats, 95) * 1e3), 2),
            "window_busy_p50_ms": round(float(np.median(mwin) * 1e3), 2),
            "window_busy_p95_ms": round(float(np.percentile(mwin, 95) * 1e3), 2),
            # sustains N x realtime iff the busy part of each audio-rate
            # window fits inside the window
            "sustains_realtime": bool(np.percentile(mwin, 95) < chunk_secs),
            "aggregate_rtf": round(float(mwin.sum() / (n * secs)), 5),
        }
    result = {
        "metric": "streaming_chunk_latency_ms",
        "value": round(float(np.median(rt) * 1e3), 2),
        "unit": "ms per 2.56s chunk (median, realtime-paced)",
        "vs_baseline": 1.0,
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
