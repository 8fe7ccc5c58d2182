"""Recipe-scale dress rehearsal on the real chip (VERDICT round-2 item 6).

The CI en-recipe test (tests/test_recipe_en.py) runs the real CLIs on 20
tiny utterances; this tool scales it to recipe-shaped reality: ~1k
synthetic FLAC utterances, a 5k-piece WordPiece tokenizer trained from the
transcripts, the FULL 46M conformer from
example/asr_en/conf/config_baseline.yaml, 500 s-audio duration batching,
and the real ``bin/train.py`` -> average -> ``bin/decode.py`` chain.  It
exercises what the 20-utt test cannot: 5k-vocab bucketing distributions,
real host-loader + device_put overlap (train throughput on the REAL
pipeline, not a device-resident batch), recipe-size checkpoints, and
tokenizer coverage — and reports synthetic-WER as a learnability check.

Synthetic speech that is actually learnable: each letter A-Z maps to a
fixed tone; a word is its letters' tones concatenated (60 ms each), words
separated by 80 ms silence.  Transcripts are random words from a ~3000
word lexicon, so WordPiece has real subword structure to find.

The one deliberate deviation from the recipe config: Noam warm_step drops
from 25000 to 600 (the rehearsal trains ~2k steps, not 600k — with the
recipe warmup the model would still be at lr~0 when training ends).

Run on the chip (takes ~15-25 min):
    python tools/recipe_rehearsal.py [--utts 1000] [--epochs 150]
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SR = 16000
LETTER_MS = 60
GAP_MS = 80


def _letter_freq(ch: str) -> float:
    # 26 tones spread 200..3400 Hz on a log scale
    i = ord(ch) - ord("A")
    return 200.0 * (3400.0 / 200.0) ** (i / 25.0)


def _word_wave(word: str, rng) -> np.ndarray:
    seg = int(SR * LETTER_MS / 1000)
    t = np.arange(seg) / SR
    env = np.hanning(seg)
    parts = [0.25 * env * np.sin(2 * np.pi * _letter_freq(c) * t
                                 + rng.uniform(0, 2 * np.pi))
             for c in word]
    parts.append(np.zeros(int(SR * GAP_MS / 1000)))
    return np.concatenate(parts)


def gen_corpus(root: str, n_utt: int, lexicon, seed: int):
    from lasr_tpu.data.flac import write_flac
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    scp, txt, lines = [], [], []
    for i in range(n_utt):
        k = int(rng.integers(4, 11))
        words = [lexicon[int(w)] for w in rng.integers(0, len(lexicon), k)]
        wav = np.concatenate([_word_wave(w, rng) for w in words])
        wav = wav + 0.01 * rng.standard_normal(len(wav))
        uid = f"spk1-{seed}{i:05d}"
        p = os.path.join(root, uid + ".flac")
        # write_flac takes FLOAT [-1,1] and scales to PCM itself; the
        # round-3 sweeps passed int16 here, which clipped the corpus to
        # square waves (tones kept their fundamentals, so training still
        # worked — but the fix makes the audio what it claims to be)
        write_flac(p, np.clip(wav, -1.0, 1.0), SR)
        scp.append(f"{uid} {p}")
        txt.append(f"{uid} {' '.join(words)}")
        lines.append(" ".join(words))
    with open(os.path.join(root, "wav.scp"), "w") as f:
        f.write("\n".join(scp) + "\n")
    with open(os.path.join(root, "text"), "w") as f:
        f.write("\n".join(txt) + "\n")
    return lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/lasr_rehearsal")
    ap.add_argument("--utts", type=int, default=1000)
    ap.add_argument("--dev", type=int, default=48)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--vocab", type=int, default=5000)
    ap.add_argument("--lexicon", type=int, default=3000)
    ap.add_argument("--warm-step", type=int, default=600,
                    help="Noam warmup steps (the rehearsal trains ~1-4k "
                         "optimizer steps; pick ~half the run so the LR "
                         "actually peaks — the online run at 600 utts has "
                         "only 4 batches/epoch)")
    ap.add_argument("--valid-interval", type=int, default=1,
                    help="validate every N epochs (train CLI "
                         "-valid_interval_epochs)")
    ap.add_argument("--ckpt-interval", type=int, default=1,
                    help="per-epoch checkpoint every N epochs; each save "
                         "snapshots ~530 MB device->host over the tunnel "
                         "(train CLI -checkpoint_interval_epochs)")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model + few utts (CPU wiring check)")
    ap.add_argument("--online", action="store_true",
                    help="train the production-size STREAMING model "
                         "(chunked encoder) instead of the offline "
                         "conformer — produces the trained checkpoint "
                         "tools/bench_streaming.py --train-config wants")
    args = ap.parse_args()
    if args.smoke:
        args.utts, args.dev, args.epochs = 16, 4, 2
        args.vocab, args.lexicon = 200, 50
        args.root = args.root + "_smoke"

    import yaml
    from lasr_tpu.data.tokenizer import HuggingTokenizer

    root = args.root
    data = os.path.join(root, "data")
    os.makedirs(root, exist_ok=True)

    rng = np.random.default_rng(7)
    letters = np.array(list("ABCDEFGHIJKLMNOPQRSTUVWXYZ"))
    lexicon = sorted({"".join(letters[rng.integers(0, 26,
                                                   rng.integers(3, 9))])
                      for _ in range(args.lexicon * 2)})[: args.lexicon]

    tok_json = os.path.join(data, "tokenizer.json")
    if not args.skip_gen:
        t0 = time.time()
        train_lines = gen_corpus(os.path.join(data, "train"), args.utts,
                                 lexicon, seed=0)
        gen_corpus(os.path.join(data, "dev"), args.dev, lexicon, seed=1)
        corpus = os.path.join(root, "corpus.txt")
        with open(corpus, "w") as f:
            f.write("\n".join(train_lines) + "\n")
        HuggingTokenizer.train_tokenizer([corpus], tok_json,
                                         vocab_size=args.vocab)
        print(json.dumps({"stage": "gen", "secs": round(time.time() - t0, 1),
                          "utts": args.utts}), flush=True)
    tok = HuggingTokenizer(tok_json)
    print(json.dumps({"stage": "tokenizer", "vocab": tok.dict_size()}),
          flush=True)

    # the REAL recipe config with data paths + rehearsal warmup
    with open(os.path.join(REPO,
                           "example/asr_en/conf/config_baseline.yaml")) as f:
        cfg = yaml.safe_load(f)
    cfg["opti_config"]["scheduler"]["kwargs"]["warm_step"] = args.warm_step
    cfg["tokenizer_config"]["kwargs"]["dict_path"] = tok_json
    if args.online:
        # production-size streaming model (the serving bench's scale)
        cfg["model_config"] = {
            "name": "lasr_tpu.models.e2e_online:E2E_Transformer_CTC_Online",
            "kwargs": dict(
                idim=80, odim=0,
                encoder_attention_dim=320, encoder_attention_heads=8,
                encoder_linear_units=2048, encoder_num_blocks=12,
                encoder_left_chunk=64, encoder_center_chunk=64,
                encoder_right_chunk=64,
                decoder_attention_dim=320, decoder_self_attention_heads=8,
                decoder_src_attention_heads=8, decoder_linear_units=2048,
                decoder_num_block=6,
                # the chunk scan's saved per-chunk activations OOM 16 GB
                # HBM at 500 s-audio batches without remat
                encoder_remat=True,
                # layer-major stacks every chunk of the 500 s duration
                # bucket into one >1.2k-row batch whose attention/FF
                # temps OOM 16 GB HBM even under remat (r3 sweep-6
                # failure); cap the rows per remat'd group
                encoder_layer_major_rows=384)}
    if args.smoke:
        small = dict(
            encoder_attention_dim=32, encoder_attention_heads=2,
            encoder_linear_units=64, encoder_num_blocks=2,
            decoder_attention_dim=32, decoder_linear_units=64,
            decoder_num_block=1)
        if args.online:
            small.update(decoder_self_attention_heads=2,
                         decoder_src_attention_heads=2,
                         encoder_left_chunk=8, encoder_center_chunk=8,
                         encoder_right_chunk=8)
        else:
            small.update(decoder_attention_heads=2, encoder_cnn_kernel=7)
        cfg["model_config"]["kwargs"].update(small)
        cfg["opti_config"]["scheduler"]["kwargs"]["warm_step"] = 30
        for block in ("train_data_config", "valid_data_config"):
            cfg[block]["kwargs"]["batch_duration"] = 30
    for split, block in (("train", "train_data_config"),
                         ("dev", "valid_data_config")):
        kw = cfg[block]["kwargs"]
        kw["wav_list"] = [os.path.join(data, split, "wav.scp")]
        kw["text_list"] = [os.path.join(data, split, "text")]
        # single-core host: FLAC re-decode dominates the epoch without it
        kw["cache_audio_mb"] = 2048
        # tunneled TPU: the per-step H2D upload of the waveform batch is
        # the steady-state wall (~35 MB/step at batch_duration 500);
        # int16 is the PCM source precision — half the bytes, losslessly
        kw["wire_dtype"] = "int16"
        if split == "train":
            # ... and the corpus fits HBM: epoch 1 fills a device pool,
            # later epochs ship row ids only (zero waveform H2D)
            kw["device_audio_cache"] = True
    cfg_path = os.path.join(root, "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)

    decode_cfg = {
        "decode_config": {"beam": 10, "ctc_beam": 15, "ctc_weight": 0.5,
                          "lm_rate": 0.0,
                          "decode_method": ("ctc_att_online" if args.online
                                            else "ctc_att"),
                          "maxlenratio": 0.0, "minlenratio": 0.0},
        "test_data_config": {
            "name": "lasr_tpu.data.dataset:AudioDataSet",
            "kwargs": {"wav_list": [os.path.join(data, "dev", "wav.scp")],
                       "text_list": [os.path.join(data, "dev", "text")],
                       "audio_trans": ["norm", "fbank:80"]}},
    }
    dec_path = os.path.join(root, "decode.yaml")
    with open(dec_path, "w") as f:
        yaml.safe_dump(decode_cfg, f, sort_keys=False)

    # PREPEND to PYTHONPATH: this image's TPU plugin registers via a
    # sitecustomize that lives on the inherited PYTHONPATH
    # (/root/.axon_site) — overwriting it leaves JAX_PLATFORMS=axon
    # pointing at a backend that never registers (r3 sweep failure mode)
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep +
               os.environ.get("PYTHONPATH", ""))
    exp = os.path.join(root, "exp")
    if not args.skip_train:
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bin/train.py"),
             "-config", cfg_path, "-exp_dir", exp,
             "-num_epochs", str(args.epochs), "-num_devices", "1",
             "-valid_interval_epochs", str(args.valid_interval),
             "-checkpoint_interval_epochs", str(args.ckpt_interval),
             "-log_interval", "20"],
            env=env, capture_output=True, text=True)
        train_s = time.time() - t0
        sys.stderr.write(r.stdout[-1500:] + r.stderr[-1500:])
        if r.returncode != 0:
            sys.exit(r.returncode)
        # steady-state pipeline throughput between the first and last
        # train flushes (excludes compile/startup); rows carry utts_cum
        # and wall_s (trainer.py _flush_metrics)
        rows = []
        with open(os.path.join(exp, "metrics.jsonl")) as f:
            for line in f:
                row = json.loads(line)
                if "utts_cum" in row:
                    rows.append(row)
        steps = rows[-1]["step"] if rows else 0
        steady = None
        n_segments = 0
        if len(rows) >= 2:
            # utts_cum is the per-flush utterance count; wall_s is the
            # run's own wall clock, so it RESETS when auto_resume picks a
            # preempted run back up — accumulate du/dt per contiguous
            # segment, skipping each segment's first flush (which absorbs
            # compile/startup)
            du = dt_s = 0.0
            seg_start = 0
            for i in range(1, len(rows) + 1):
                if i == len(rows) or rows[i]["wall_s"] < rows[i - 1]["wall_s"]:
                    seg = rows[seg_start:i]
                    n_segments += 1
                    if len(seg) >= 2:
                        du += sum(r["utts_cum"] for r in seg[1:])
                        dt_s += seg[-1]["wall_s"] - seg[0]["wall_s"]
                    seg_start = i
            if dt_s > 0:
                steady = round(du / dt_s, 1)
        ckpt_mb = 0
        for dirpath, _, files in os.walk(os.path.join(exp, "checkpoints")):
            ckpt_mb += sum(os.path.getsize(os.path.join(dirpath, x))
                           for x in files)
        print(json.dumps({
            "stage": "train", "wall_s": round(train_s, 1),
            "steps": steps,
            "epochs": args.epochs,
            "train_utts_total": args.utts * args.epochs,
            # this run's wall clock only; meaningless after a resume —
            # use steady_utts_per_sec (resume-aware) for the BASELINE row
            "pipeline_utts_per_sec": round(args.utts * args.epochs
                                           / train_s, 1),
            "steady_utts_per_sec": steady,
            "train_segments": n_segments,
            "ckpt_dir_mb": round(ckpt_mb / 2 ** 20, 1)}), flush=True)

    out_file = os.path.join(root, "hyp.txt")
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin/decode.py"),
         "-train_config", os.path.join(exp, "hparams.yaml"),
         "-decode_config", dec_path,
         "-model_path", os.path.join(exp, "checkpoints"),
         "-avg", "5", "-choose", "last",
         "-output_file", out_file],
        env=env, capture_output=True, text=True)
    decode_s = time.time() - t0
    sys.stderr.write(r.stdout[-800:] + r.stderr[-800:])
    if r.returncode != 0:
        sys.exit(r.returncode)
    wer = None
    timing = {}
    for line in r.stdout.splitlines():
        if "Totol WER is" in line:
            wer = float(line.split()[-1])
        elif line.startswith('{"decode_batches"'):
            timing = json.loads(line)
    # dev audio seconds for RTF
    from lasr_tpu.data.reader import get_audio_duration, read_scp
    dev_secs = sum(get_audio_duration(p) for _, p in
                   read_scp(os.path.join(data, "dev", "wav.scp")))
    print(json.dumps({"stage": "decode", "wall_s": round(decode_s, 1),
                      "dev_audio_s": round(dev_secs, 1),
                      "rtf_incl_compile": round(decode_s / dev_secs, 3),
                      # bin/decode.py's own per-batch split: steady
                      # excludes each padded shape's first (compiling)
                      # batch — the deployment-shaped decode RTF
                      "rtf_steady": timing.get("rtf_steady"),
                      "decode_steady_s": timing.get("decode_steady_s"),
                      "synthetic_wer": wer,
                      "hparams": os.path.join(exp, "hparams.yaml"),
                      "checkpoints": os.path.join(exp, "checkpoints")}),
          flush=True)


if __name__ == "__main__":
    main()
