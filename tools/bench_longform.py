"""Long-form decode RTF vs utterance length (VERDICT round-1 item 10).

Decodes synthetic utterances of increasing duration with the baseline-
recipe Conformer and the production joint beam search, comparing the
sequential CTC-prefix scan against the O(log T) parallel scan
(decode/beam.py parallel_scan) — the hybrid question: at what T does the
parallel formulation win?

Prints an RTF table; run on the real chip:
    python tools/bench_longform.py [--durations 15,30,60,120]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# honor JAX_PLATFORMS=cpu even under the image's axon sitecustomize
from lasr_tpu.utils.env import respect_jax_platforms_env
respect_jax_platforms_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--durations", default="15,30,60,120")
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--ctc-beam", type=int, default=15)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (CPU smoke)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lasr_tpu.data.frontend import DeviceFrontend
    from lasr_tpu.decode.beam import CTCAttBeamDecoder
    from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC

    odim = 5000 if not args.tiny else 40
    kw = dict(idim=80, odim=odim,
              encoder_attention_dim=320, encoder_attention_heads=8,
              encoder_linear_units=2048, encoder_num_blocks=12,
              decoder_attention_dim=320, decoder_attention_heads=8,
              decoder_linear_units=2048, decoder_num_block=6,
              encoder_pos_enc_layer_type="rel_pos",
              encoder_selfattention_layer_type="rel_selfattn",
              dtype=jnp.bfloat16)
    if args.tiny:
        kw.update(encoder_attention_dim=32, encoder_attention_heads=2,
                  encoder_linear_units=64, encoder_num_blocks=2,
                  decoder_attention_dim=32, decoder_attention_heads=2,
                  decoder_linear_units=64, decoder_num_block=2,
                  encoder_cnn_kernel=7, dtype=jnp.float32)
    model = E2E_Conformer_CTC(**kw)
    fe = DeviceFrontend(["norm", "fbank:80"])

    rng = np.random.default_rng(0)
    durations = [float(d) for d in args.durations.split(",")]
    rows = []
    variables = None
    for secs in durations:
        n = int(secs * 16000)
        wav = (0.1 * rng.standard_normal((1, n))).astype(np.float32)
        feats, flen = fe(jnp.asarray(wav), jnp.asarray([n], jnp.int32))
        if variables is None:
            variables = model.init(jax.random.PRNGKey(0), feats[:, :400],
                                   jnp.asarray([400], jnp.int32),
                                   jnp.ones((1, 3), jnp.int32))
        modes = ["seq", "pscan", "segmented", "windowed"]
        if secs > 60:
            # the parallel-scan variant is off by default and its 3x3
            # matrix intermediates crash/OOM the worker at minutes scale
            modes.remove("pscan")
        if secs > 150:
            # the full quadratic encoder (direct AND full-encode
            # segmented) walls out past ~2-3 min — windowed only there
            modes = ["windowed"]
        tokens_by_mode = {}
        for mode in modes:
            dec = CTCAttBeamDecoder(model, variables, beam=args.beam,
                                    ctc_beam=args.ctc_beam, ctc_weight=0.5,
                                    parallel_scan=mode == "pscan")
            # maxlenratio keeps hypothesis length (and compile cost)
            # realistic for long audio: ~12.5 tokens/s of speech
            dec.maxlenratio = min(1.0, (14.0 * secs) /
                                  (feats.shape[1] / 4 + 1))
            if mode in ("segmented", "windowed"):
                from lasr_tpu.decode.longform import LongFormCTCAttDecoder
                dec.maxlenratio = 0.0
                # windowed: 512-frame centers + 128-frame halo keeps the
                # per-window T at 768 (within the rel-pos fold cap) and
                # ~5 s of attention context each side
                run = LongFormCTCAttDecoder(
                    dec, segment_frames=512,
                    encoder_window_frames=(512 if mode == "windowed"
                                           else 10 ** 9),
                    encoder_halo_frames=128)
                n_tok = lambda o: len(o[0])
            else:
                run = dec
                n_tok = lambda o: int(o.lengths[0, 0])
            try:
                t0 = time.time()
                out = run(np.asarray(feats), np.asarray(flen))
                compile_s = time.time() - t0
                t0 = time.time()
                iters = 3 if secs <= 300 else 1
                for _ in range(iters):
                    out = run(np.asarray(feats), np.asarray(flen))
                dt = (time.time() - t0) / iters
                if mode in ("segmented", "windowed"):
                    tokens_by_mode[mode] = list(out[0])
                mem = jax.devices()[0].memory_stats() or {}
                rows.append({"secs": secs, "mode": mode,
                             "decode_s": round(dt, 3),
                             "rtf": round(dt / secs, 4),
                             "compile_s": round(compile_s, 1),
                             "n_tokens": n_tok(out),
                             "peak_hbm_gb": round(mem.get(
                                 "peak_bytes_in_use", 0) / 2 ** 30, 2)})
            except Exception as e:  # HBM OOM at long T — part of the story
                rows.append({"secs": secs, "mode": mode,
                             "error": type(e).__name__,
                             "detail": str(e).split("\n")[0][:120]})
            print(json.dumps(rows[-1]), flush=True)
        if "segmented" in tokens_by_mode and "windowed" in tokens_by_mode:
            # NOTE: compares two different long-form APPROXIMATIONS on an
            # untrained model (segmented = hard boundaries, windowed =
            # halo'd windows), so a large edit distance here is expected
            # noise, not a correctness signal — windowed-encoder numerics
            # vs the true full forward are pinned by tests/test_decode.py
            # (test_longform_windowed_encoder_alignment) on window centers.
            from lasr_tpu.utils.text import edit_distance
            a, b = tokens_by_mode["segmented"], tokens_by_mode["windowed"]
            d = edit_distance(a, b)
            print(json.dumps({"secs": secs,
                              "windowed_vs_segmented_edit": d,
                              "ref_tokens": len(a)}), flush=True)
    print("\nRTF table (chip=%s):" % jax.devices()[0].platform)
    print(f"{'secs':>6} {'seq RTF':>9} {'pscan RTF':>10} {'segmented':>10}"
          f" {'windowed':>9}")
    nan = float("nan")
    by = {}
    for r in rows:
        by.setdefault(r["secs"], {})[r["mode"]] = r.get("rtf", nan)
    for secs, d in by.items():
        print(f"{secs:6.0f} {d.get('seq', nan):9.4f} "
              f"{d.get('pscan', nan):10.4f} {d.get('segmented', nan):10.4f}"
              f" {d.get('windowed', nan):9.4f}")


if __name__ == "__main__":
    main()
