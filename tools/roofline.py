"""Quantitative roofline for the recipe train step (VERDICT r2 item 1).

Enumerates every FLOP-significant op in the production train step
(B=32 x 15.6 s, the 500 s-audio recipe batch; bf16 compute) as explicit
GEMM/conv shapes, and derives for each:

  - ideal ms at v5e bf16 peak (197 TFLOP/s),
  - tiling-adjusted attainable ms: the MXU processes 128-lane x 8-sublane
    tiles, so a contraction over K lanes runs at ~K/ceil128(K) of peak and
    an N-lane output at ~N/ceil128(N) (M streams in sublane groups of 8,
    negligible for our M >= 2048 rows).  This is the *attainable* floor
    for the given shapes without reshaping the computation,
  - an HBM byte floor (819 GB/s): weights + unavoidable activation
    traffic assuming perfect fusion of elementwise ops into neighbors.

The per-op table localises the remaining headroom; totals are compared
against the measured step (BASELINE.md round-2/3 rows) and the analytic
FLOP total is cross-checked against XLA's own HLO cost analysis of the
real jitted step (--xla-check, any backend).

Reference hot path being modelled: the same recipe model the reference
trains (example/asr_en/conf/config_baseline.yaml; reference
lasr/modules/net/transformer/attention.py:141-203 for the rel-pos
attention term structure).

Run: python tools/roofline.py [--measured-ms 115.9] [--xla-check]
     [--pos-dropout-mode table|rotated|rotated+pallas]  (reprices the
     attention area for the rotated fold / the fused flash kernel)
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS = 197e12   # v5e bf16 MXU peak
PEAK_HBM = 819e9      # v5e HBM bandwidth, bytes/s
LANE = 128
BF16 = 2


def ceil_to(x, m):
    return m * math.ceil(x / m)


def lane_eff(k):
    """MXU utilisation of a K-wide contraction or N-wide output: real
    lanes over padded lanes."""
    return k / ceil_to(k, LANE)


class Table:
    def __init__(self):
        self.rows = []

    def gemm(self, name, M, K, N, count=1, bwd=True, extra_bytes=0,
             weight_params=0):
        """One (M,K)x(K,N) GEMM, `count` times.  bwd=True adds the two
        backward GEMMs (dX: (M,N)x(N,K), dW: (K,M)x(M,N)) with their own
        tiling efficiencies.  Bytes: activations in+out once at bf16
        (fusion-ideal) + weights once fwd, twice bwd (read for dX, grad
        written)."""
        terms = [("fwd", M, K, N)]
        if bwd:
            terms += [("dx", M, N, K), ("dw", K, M, N)]
        flops = ideal = attain = 0.0
        for _t, m, k, n in terms:
            f = 2.0 * m * k * n * count
            flops += f
            ideal += f / PEAK_FLOPS
            attain += f / (PEAK_FLOPS * lane_eff(k) * lane_eff(n))
        wbytes = weight_params * BF16 * (3 if bwd else 1)
        abytes = (M * K + M * N) * BF16 * count * (3 if bwd else 1)
        byte_s = (abytes + wbytes + extra_bytes) / PEAK_HBM
        self.rows.append(dict(name=name, gflops=flops / 1e9,
                              ideal_ms=ideal * 1e3, attain_ms=attain * 1e3,
                              bytes_ms=byte_s * 1e3))

    def conv2d(self, name, B, H, W, Cin, Cout, k, bwd=True):
        """kxk conv producing (B,H,W,Cout).  Contraction K = k*k*Cin."""
        K = k * k * Cin
        self.gemm(name, B * H * W, K, Cout, bwd=bwd,
                  weight_params=K * Cout)

    def bytes_only(self, name, nbytes, note=""):
        self.rows.append(dict(name=name, gflops=0.0, ideal_ms=0.0,
                              attain_ms=nbytes / PEAK_HBM * 1e3,
                              bytes_ms=nbytes / PEAK_HBM * 1e3, note=note))

    def total(self, key):
        return sum(r[key] for r in self.rows)


def build(B=32, secs=15.6, L=64, V=5000, mode="table"):
    d, H, ffn, nenc, ndec, cker = 320, 8, 2048, 12, 6, 31
    dk = d // H
    Tw = int(secs * 16000)
    T0 = 1 + (Tw - 400) // 160          # fbank frames
    T1 = (T0 - 1) // 2                  # after subsampling conv1
    T = (T1 - 1) // 2                   # encoder frames
    F1 = (80 - 1) // 2
    F2 = (F1 - 1) // 2                  # freq dim after conv2

    t = Table()
    # ---- frontend (no bwd) ----
    t.gemm("fbank rDFT matmul", B * T0, 400, 2 * 257, bwd=False,
           weight_params=400 * 2 * 257)
    t.gemm("fbank mel matmul", B * T0, 257, 80, bwd=False,
           weight_params=257 * 80)
    # specaug masks + 4-tap warp interp: elementwise/gather — bytes only
    t.bytes_only("specaug (masks+warp)", 2 * B * T0 * 80 * 4 * 2,
                 "elementwise over the f32 spectrogram")

    # ---- subsampling ----
    t.conv2d("subsample conv1 3x3/2", B, T1, F1, 1, d, 3)
    t.conv2d("subsample conv2 3x3/2", B, T, F2, d, d, 3)
    t.gemm("subsample out linear", B * T, F2 * d, d,
           weight_params=F2 * d * d)

    # ---- encoder blocks ----
    M = B * T
    t.gemm("enc FFN (2 macaron x 2 mm)", M, d, ffn, count=2 * nenc,
           weight_params=d * ffn)
    t.gemm("enc FFN out mm", M, ffn, d, count=2 * nenc,
           weight_params=ffn * d)
    t.gemm("enc attn q/k/v/out proj", M, d, d, count=4 * nenc,
           weight_params=d * d)
    if mode == "table":
        t.gemm("enc attn pos proj (2T-1 rows)", (2 * T - 1), d, d,
               count=nenc, weight_params=d * d)
        # scores: contraction over dk=40 (pad to 128) — the known-bad shape
        t.gemm("enc attn ac scores", B * H * T, dk, T, count=nenc)
        t.gemm("enc attn bd rel scores", B * H * T, dk, 2 * T - 1,
               count=nenc)
    else:
        # rotated fold: z = q_v @ W_pos (per head), rotate (elementwise),
        # then ONE merged score matmul over dk+d = 360 lanes.  No 2T-1
        # table projection, no skew.
        t.gemm("enc rot z proj", B * H * T, dk, d, count=nenc,
               weight_params=d * d)
        t.bytes_only("enc rot u rotation traffic",
                     nenc * B * T * d * BF16 * 2 * 3,
                     "u (B,T,H*dk->d) rw fwd + bwd")
        t.gemm("enc attn merged scores", B * H * T, dk + d, T, count=nenc)
    t.gemm("enc attn AV", B * H * T, T, dk, count=nenc)
    t.gemm("enc conv pw1 (GLU)", M, d, 2 * d, count=nenc,
           weight_params=d * 2 * d)
    # depthwise k31: no cross-channel contraction -> runs on the VPU
    # (vector unit, ~3.9 TFLOP/s f32), bounded by max(VPU flops, HBM)
    dw_flops = 2.0 * M * d * cker * 3 * nenc          # fwd + dx + dw
    dw_vpu_ms = dw_flops / 3.9e12 * 1e3
    dw_bytes_ms = (M * d * BF16 * 2 * 3 * nenc) / PEAK_HBM * 1e3
    t.rows.append(dict(name="enc conv depthwise k31 (VPU)",
                       gflops=dw_flops / 1e9,
                       ideal_ms=max(dw_vpu_ms, dw_bytes_ms),
                       attain_ms=max(dw_vpu_ms, dw_bytes_ms),
                       bytes_ms=dw_bytes_ms))
    t.gemm("enc conv pw2", M, d, d, count=nenc, weight_params=d * d)
    # per-block residual/LN traffic that cannot fuse away: ~6 tensor
    # read+writes of (M,d) bf16 per block
    t.bytes_only("enc LN/residual traffic",
                 6 * nenc * M * d * BF16 * 2 * 3,
                 "6 rw/block fwd, x3 for bwd")
    # score-tensor elementwise traffic: softmax+mask over (B,H,T,T)
    # (1 rw fwd, x3 bwd); in the flash kernel scores never reach HBM
    if mode != "rotated+pallas":
        t.bytes_only("enc attn softmax/mask traffic",
                     nenc * B * H * T * T * BF16 * 2 * 3,
                     "(B,H,T,T) rw fwd + bwd")
    if mode == "table":
        # the rel-shift skew copy of (B,H,T,2T-1)
        t.bytes_only("enc attn rel-shift skew copy",
                     nenc * B * H * T * (2 * T - 1) * BF16 * 2 * 3,
                     "pad/reshape copy of bd")

    # ---- decoder blocks ----
    Md = B * L
    t.gemm("dec self q/k/v/out", Md, d, d, count=4 * ndec,
           weight_params=d * d)
    t.gemm("dec self scores+AV", B * H * L, dk, L, count=2 * ndec)
    t.gemm("dec cross kv proj (enc rows)", M, d, d, count=2 * ndec,
           weight_params=d * d)
    t.gemm("dec cross q/out proj", Md, d, d, count=2 * ndec,
           weight_params=d * d)
    t.gemm("dec cross scores", B * H * L, dk, T, count=ndec)
    t.gemm("dec cross AV", B * H * L, T, dk, count=ndec)
    t.gemm("dec FFN in", Md, d, ffn, count=ndec, weight_params=d * ffn)
    t.gemm("dec FFN out", Md, ffn, d, count=ndec, weight_params=ffn * d)
    t.gemm("dec output proj to V", Md, d, V, weight_params=d * V)

    # ---- heads / loss ----
    t.gemm("CTC head (T rows to V)", M, d, V, weight_params=d * V)
    # CTC lattice: (B, T, 2L+1) f32 scan — latency/bytes, not flops
    t.bytes_only("CTC lattice scan", B * T * (2 * L + 1) * 4 * 2 * 3,
                 "alpha rw fwd+bwd")
    t.bytes_only("CE + label smoothing", Md * V * BF16 * 2 * 3,
                 "logits rw fwd+bwd")

    # ---- optimizer ----
    n_params = 46.3e6
    # Adam: read g, p, m, v; write p, m, v (f32 master + moments)
    t.bytes_only("Adam update (f32 state)", n_params * 4 * 7,
                 "46.3M params x 7 f32 touches")
    return t, dict(T0=T0, T=T, B=B, L=L)


def build_online(B=32, secs=15.6, L=64, V=5000):
    """Roofline for the ONLINE (streaming ChunkEncoder, layer-major) train
    step at the recipe geometry (VERDICT round-3 weak 6: the 145 ms step
    had no analytic treatment).

    Geometry mirrors modules/streaming.py: raw-frame chunks of
    cur=right=64 (hop 64), conv2d /4 subsampling of a (cur+right+6)-frame
    window per chunk → Tc rows per chunk, attending over
    [mem M=left/4 ‖ Tc] keys.  Structural costs vs the offline step:
      - every chunk carries its right-context rows through q/FFN
        (~2x the row count of the offline encoder),
      - the subsampling conv re-runs over overlapping chunk windows
        (~2.1x offline conv cost),
      - attention is LOCAL: keys = M+Tc ≈ 48 instead of T ≈ 388 — the
        score/AV area almost vanishes (no (B,H,T,T) tensor exists),
      - plain sinusoid MHA: no rel-pos bd term, no skew copy.
    """
    d, H, ffn, nenc, ndec = 320, 8, 2048, 12, 6
    dk = d // H
    cur = right = hop = 64
    Tw = int(secs * 16000)
    T0 = 1 + (Tw - 400) // 160            # fbank frames
    win = cur + right + 6                 # conv window per chunk
    T1c = (win - 1) // 2
    Tc = (T1c - 1) // 2                   # rows per chunk after /4
    M = 64 // 4                           # carried memory rows
    # chunk count (streaming.py _chunk_grid with left=0, pad right+6)
    padded = T0 + right + 6
    n = 0
    i = 0
    while i + cur + right < padded - 6 + hop:
        n += 1
        i += hop
    NB = n * B
    F1 = (80 - 1) // 2
    F2 = (F1 - 1) // 2

    t = Table()
    t.gemm("fbank rDFT matmul", B * T0, 400, 2 * 257, bwd=False,
           weight_params=400 * 2 * 257)
    t.gemm("fbank mel matmul", B * T0, 257, 80, bwd=False,
           weight_params=257 * 80)
    t.bytes_only("specaug (masks+warp)", 2 * B * T0 * 80 * 4 * 2,
                 "elementwise over the f32 spectrogram")

    # subsampling convs run per chunk over overlapping windows
    t.conv2d("subsample conv1 3x3/2 (per chunk)", NB, T1c, F1, 1, d, 3)
    t.conv2d("subsample conv2 3x3/2 (per chunk)", NB, Tc, F2, d, d, 3)
    t.gemm("subsample out linear", NB * Tc, F2 * d, d,
           weight_params=F2 * d * d)

    rows_q = NB * Tc
    rows_k = NB * (M + Tc)
    t.gemm("enc q/out proj", rows_q, d, d, count=2 * nenc,
           weight_params=d * d)
    t.gemm("enc k/v proj (mem-dup rows)", rows_k, d, d, count=2 * nenc,
           weight_params=d * d)
    t.gemm("enc local scores", NB * H * Tc, dk, M + Tc, count=nenc)
    t.gemm("enc local AV", NB * H * Tc, M + Tc, dk, count=nenc)
    t.gemm("enc FFN in", rows_q, d, ffn, count=nenc,
           weight_params=d * ffn)
    t.gemm("enc FFN out", rows_q, ffn, d, count=nenc,
           weight_params=ffn * d)
    t.bytes_only("enc LN/residual traffic",
                 6 * nenc * rows_q * d * BF16 * 2 * 3,
                 "6 rw/block fwd, x3 for bwd")
    t.bytes_only("enc memory-view gather",
                 nenc * NB * M * d * BF16 * 2 * 3,
                 "per-layer chunk-shifted memory views (stop_gradient)")
    t.bytes_only("enc softmax/mask traffic",
                 nenc * NB * H * Tc * (M + Tc) * BF16 * 2 * 3,
                 "local (Tc, M+Tc) score tensors rw fwd+bwd")

    Md = B * L
    t.gemm("dec self q/k/v/out", Md, d, d, count=4 * ndec,
           weight_params=d * d)
    t.gemm("dec self scores+AV", B * H * L, dk, L, count=2 * ndec)
    t.gemm("dec cross kv proj (enc rows)", B * (n * 16), d, d,
           count=2 * ndec, weight_params=d * d)
    t.gemm("dec cross q/out proj", Md, d, d, count=2 * ndec,
           weight_params=d * d)
    t.gemm("dec cross scores", B * H * L, dk, n * 16, count=ndec)
    t.gemm("dec cross AV", B * H * L, n * 16, dk, count=ndec)
    t.gemm("dec FFN in", Md, d, ffn, count=ndec, weight_params=d * ffn)
    t.gemm("dec FFN out", Md, ffn, d, count=ndec, weight_params=ffn * d)
    t.gemm("dec output proj to V", Md, d, V, weight_params=d * V)

    t.gemm("CTC head", B * n * 16, d, V, weight_params=d * V)
    t.bytes_only("CTC lattice scan", B * n * 16 * (2 * L + 1) * 4 * 2 * 3,
                 "alpha rw fwd+bwd")
    t.bytes_only("CE + label smoothing", Md * V * BF16 * 2 * 3,
                 "logits rw fwd+bwd")
    n_params = 44.6e6
    t.bytes_only("Adam update (f32 state)", n_params * 4 * 7,
                 "params x 7 f32 touches")
    return t, dict(T0=T0, n_chunks=n, Tc=Tc, M=M, rows_q=rows_q, B=B, L=L)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="measured full-step ms to compare against")
    ap.add_argument("--xla-check", action="store_true",
                    help="cross-check analytic FLOPs vs XLA HLO cost "
                         "analysis of the real jitted step")
    ap.add_argument("--pos-dropout-mode", default="table",
                    choices=["table", "rotated", "rotated+pallas"])
    ap.add_argument("--online", action="store_true",
                    help="roofline the ONLINE (ChunkEncoder layer-major) "
                         "train step instead of the offline conformer")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    if args.online:
        t, dims = build_online()
    else:
        t, dims = build(mode=args.pos_dropout_mode)
    rows = sorted(t.rows, key=lambda r: -max(r["attain_ms"], r["bytes_ms"]))
    if not args.json:
        print(f"shapes: {dims}")
        print(f"{'op':38s} {'GFLOP':>9s} {'ideal':>7s} {'attain':>7s} "
              f"{'bytes':>7s}  bound")
        for r in rows:
            bound = "mem" if r["bytes_ms"] > r["attain_ms"] else "mxu"
            print(f"{r['name']:38s} {r['gflops']:9.1f} "
                  f"{r['ideal_ms']:7.2f} {r['attain_ms']:7.2f} "
                  f"{r['bytes_ms']:7.2f}  {bound}")
        tot_f = t.total("gflops")
        tot_i = t.total("ideal_ms")
        tot_a = t.total("attain_ms")
        # the true floor: each op bounded by max(compute, bytes)
        tot_m = sum(max(r["attain_ms"], r["bytes_ms"]) for r in t.rows)
        print("-" * 80)
        print(f"{'TOTAL':38s} {tot_f:9.1f} {tot_i:7.2f} {tot_a:7.2f}")
        print(f"roofline floor (sum of per-op max(mxu, hbm)): {tot_m:.1f} ms")
        if args.measured_ms:
            print(f"measured step: {args.measured_ms:.1f} ms -> "
                  f"{100 * tot_m / args.measured_ms:.0f}% of attainable; "
                  f"ideal-MFU {100 * tot_i / args.measured_ms:.0f}%")
    else:
        print(json.dumps(dict(rows=rows, total_gflops=t.total("gflops"),
                              ideal_ms=t.total("ideal_ms"),
                              attain_ms=t.total("attain_ms"))))

    if args.xla_check:
        xla_flops = _xla_flops(online=args.online)
        if xla_flops:
            print(f"XLA HLO cost analysis: {xla_flops / 1e9:.1f} GFLOP "
                  f"(analytic {t.total('gflops'):.1f}; "
                  f"ratio {t.total('gflops') * 1e9 / xla_flops:.2f})")


def _xla_flops(online=False):
    from lasr_tpu.utils.env import respect_jax_platforms_env
    respect_jax_platforms_env()
    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_prng_impl", "rbg")
    from lasr_tpu.data.frontend import DeviceFrontend
    from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC
    from lasr_tpu.models.e2e_online import E2E_Transformer_CTC_Online
    from lasr_tpu.models.losses import E2E_Loss
    from lasr_tpu.parallel.mesh import make_mesh, shard_batch
    from lasr_tpu.train.optimizer import Noam
    from lasr_tpu.train.trainer import Trainer

    odim = 5000
    if online:
        model = E2E_Transformer_CTC_Online(
            idim=80, odim=odim,
            encoder_attention_dim=320, encoder_attention_heads=8,
            encoder_linear_units=2048, encoder_num_blocks=12,
            encoder_left_chunk=64, encoder_center_chunk=64,
            encoder_right_chunk=64,
            decoder_attention_dim=320, decoder_self_attention_heads=8,
            decoder_src_attention_heads=8, decoder_linear_units=2048,
            decoder_num_block=6, encoder_layer_major_rows=384,
            dtype=jnp.bfloat16)
    else:
        model = E2E_Conformer_CTC(
            idim=80, odim=odim,
            encoder_attention_dim=320, encoder_attention_heads=8,
            encoder_linear_units=2048, encoder_num_blocks=12,
            decoder_attention_dim=320, decoder_attention_heads=8,
            decoder_linear_units=2048, decoder_num_block=6,
            encoder_pos_enc_layer_type="rel_pos",
            encoder_selfattention_layer_type="rel_selfattn",
            dtype=jnp.bfloat16)
    criterion = E2E_Loss(size=odim, padding_idx=-1, smoothing=0.1, rate=0.3)
    frontend = DeviceFrontend(["norm", "fbank:80", "specaug"])
    noam = Noam(model_size=320, factor=3.0, warm_step=25000)
    mesh = make_mesh(data=1, devices=jax.devices()[:1])
    trainer = Trainer(model, criterion, noam.make(), frontend, mesh=mesh,
                      log_interval=10**9)
    B, secs, Ltok = 32, 15.6, 64
    S = int(secs * 16000)
    rng = np.random.default_rng(0)
    batch = {
        "wav_array": (0.1 * rng.standard_normal((B, S))).astype(np.float32),
        "wav_len": np.full((B,), S, np.int32),
        "token_id": rng.integers(6, odim, (B, Ltok)).astype(np.int32),
        "token_len": np.full((B,), Ltok, np.int32),
        "n_utts": B,
    }
    state = trainer.init_state(batch)
    sb = batch  # shard_batch is identity-shaped on a 1-device mesh
    sb = shard_batch(trainer.mesh, batch)
    args_ = (state, sb["wav_array"], sb["wav_len"], sb["token_id"],
             sb["token_len"], trainer.rng)
    lowered = trainer._jit_train.lower(*args_)
    for fn in (lambda: lowered.compile().cost_analysis(),
               lowered.cost_analysis):
        try:
            ca = fn()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            f = float(ca["flops"])
            if f > 0:
                return f
        except Exception:
            continue
    return None


if __name__ == "__main__":
    main()
