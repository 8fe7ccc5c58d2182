"""Quantify the accuracy cost of the mid-stream ``beam_maxlen_ratio`` cap
(VERDICT round-2 weak-3: "a heuristic whose accuracy cost is
unquantified").

The cap bounds the hypothesis length of MID-STREAM beam partials only —
``finalize()`` always searches the full accumulated length (decode/
online.py:272), so the FINAL transcript is cap-independent by
construction (asserted here). What the cap can cost is partial QUALITY:
a too-short search may commit partial prefixes the final hypothesis
later contradicts, which a captioning UI shows as flicker.

Protocol: stream the dev utterances of a TRAINED online rehearsal model
(--train-config/--model-path, same flags as bin/decode.py) with beam
partials every ``--beam-interval`` chunks, at beam_maxlen_ratio in
{0.5 (production default), 1.0 (uncapped)}. For every partial refresh
record (a) the partial beam tokens and (b) the refresh wall latency.
Report per-ratio:

- prefix_survival: mean over partials of LCP(partial, final)/len(partial)
  — the fraction of each shown partial the final transcript keeps;
- flicker_tokens: mean tokens-retracted-per-refresh
  (len(partial) - LCP with the NEXT partial, i.e. visible rewrites);
- partial p50/p95 latency;
- final WER vs the dev transcripts (must be EQUAL across ratios).

Run on the chip after the online rehearsal has produced checkpoints:
    python tools/probe_partial_quality.py \
        --train-config bench_out/rehearsal_online/exp/hparams.yaml \
        --model-path bench_out/rehearsal_online/exp/checkpoints \
        --data bench_out/rehearsal_online/data/dev [--utts 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _lcp(a, b):
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-config", required=True)
    ap.add_argument("--model-path", required=True)
    ap.add_argument("--data", required=True,
                    help="dir with wav.scp + text (rehearsal dev split)")
    ap.add_argument("--utts", type=int, default=20)
    ap.add_argument("--choose", default="last")
    ap.add_argument("--avg", type=int, default=5)
    ap.add_argument("--ratios", type=float, nargs="+", default=[0.5, 1.0])
    ap.add_argument("--beam-interval", type=int, default=2)
    args = ap.parse_args()

    from lasr_tpu.utils.env import respect_jax_platforms_env
    respect_jax_platforms_env()
    import yaml
    from lasr_tpu.utils.registry import BaseConfig
    from lasr_tpu.train.trainer import load_averaged_params, decode_variables
    from lasr_tpu.decode.beam import CTCAttBeamDecoder
    from lasr_tpu.decode.online import StreamingRecognizer
    from lasr_tpu.data.reader import read_scp, read_audio
    from lasr_tpu.utils.text import ErrorRateAccumulator

    with open(args.train_config) as f:
        train_config = yaml.safe_load(f)
    model = BaseConfig(**train_config["model_config"]).generateExample()
    params, batch_stats = load_averaged_params(
        args.model_path, args.choose, args.avg)
    variables = decode_variables(params, batch_stats)

    tokenizer = BaseConfig(
        **train_config["tokenizer_config"]).generateExample()

    scp = read_scp(os.path.join(args.data, "wav.scp"))[: args.utts]
    texts = {}
    with open(os.path.join(args.data, "text")) as f:
        for line in f:
            uid, _, rest = line.strip().partition(" ")
            texts[uid] = rest

    chunk = getattr(model, "encoder_center_chunk", 64)
    chunk_samples = chunk * 4 * 160

    dec = CTCAttBeamDecoder(model, variables, beam=10, ctc_beam=15,
                            ctc_weight=0.5, online=True)

    out = {}
    finals_by_ratio = {}
    for ratio in args.ratios:
        survivals, flickers, lats, hyps, refs = [], [], [], [], []
        for uid, path in scp:
            wav, _sr = read_audio(path)
            wav = np.asarray(wav, np.float32)
            rec = StreamingRecognizer(
                model, variables, tokenizer=tokenizer, beam_decoder=dec,
                beam_interval=args.beam_interval, beam_bucket=128,
                beam_maxlen_ratio=ratio)
            partials = []
            n_seen = 0
            for off in range(0, len(wav), chunk_samples):
                t0 = time.perf_counter()
                rec.accept_waveform(wav[off: off + chunk_samples])
                dt = time.perf_counter() - t0
                if rec._n_harvested > n_seen and \
                        rec._n_harvested % args.beam_interval == 0 and \
                        rec._beam_tokens is not None:
                    partials.append(list(rec._beam_tokens))
                    lats.append(dt)
                n_seen = rec._n_harvested
            toks, text = rec.finalize()
            final = list(toks)
            for i, p in enumerate(partials):
                if p:
                    survivals.append(_lcp(p, final) / len(p))
                    nxt = partials[i + 1] if i + 1 < len(partials) else final
                    flickers.append(len(p) - _lcp(p, nxt))
            hyps.append(text)
            refs.append(texts.get(uid, ""))
        acc = ErrorRateAccumulator()
        for h, r in zip(hyps, refs):
            acc.add(r.split(), h.split())
        wer = acc.rate
        finals_by_ratio[ratio] = hyps
        out[str(ratio)] = {
            "prefix_survival": round(float(np.mean(survivals)), 4)
            if survivals else None,
            "flicker_tokens_per_refresh": round(float(np.mean(flickers)), 2)
            if flickers else None,
            "n_partials": len(survivals),
            "partial_p50_ms": round(float(np.median(lats)) * 1e3, 1)
            if lats else None,
            "partial_p95_ms": round(float(np.percentile(lats, 95)) * 1e3, 1)
            if lats else None,
            "final_wer": round(float(wer), 4),
        }
        print(json.dumps({"ratio": ratio, **out[str(ratio)]}), flush=True)

    finals_equal = all(finals_by_ratio[args.ratios[0]] == finals_by_ratio[r]
                       for r in args.ratios[1:])
    print(json.dumps({"summary": out, "finals_equal_across_ratios":
                      finals_equal}))


if __name__ == "__main__":
    main()
