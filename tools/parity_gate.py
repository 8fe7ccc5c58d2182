"""Beam-decode agreement gate vs the ACTUAL reference decoder.

The strongest offline stand-in for the WER-parity run (the published
lighting-asr checkpoints need network access): drive the reference torch
``CTC_ATT_Decoder.decode_feat`` (/root/reference/lasr/decode/
ctc_att_decoder.py:163-334) directly on a briefly-trained tiny model, map
the identical weights into our Flax model (utils/torch_compat), batch-decode
the same utterances with ``lasr_tpu.decode.beam.CTCAttBeamDecoder``, and
report 1-best token agreement, cross-WER, and score deltas.

Run (CPU):  JAX_PLATFORMS=cpu python tools/parity_gate.py --model conformer

Training first matters: with random weights every hypothesis scores within
noise of every other and tie-breaking order dominates; after ~100 Adam
steps on a synthetic corpus the posteriors are peaked and agreement is a
real statement about the search semantics.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "/root/reference" not in sys.path:
    sys.path.append("/root/reference")

# honor JAX_PLATFORMS=cpu even under the image's axon sitecustomize
from lasr_tpu.utils.env import respect_jax_platforms_env
respect_jax_platforms_env()

TINY = dict(idim=20, odim=40,
            encoder_attention_dim=32, encoder_attention_heads=2,
            encoder_linear_units=64, encoder_num_blocks=2,
            decoder_attention_dim=32, decoder_attention_heads=2,
            decoder_linear_units=64, decoder_num_block=2)
SOS, EOS, BLANK, IGNORE = 1, 2, 0, -1


def make_corpus(n, idim, odim, seed=0):
    """Synthetic utterances whose features correlate with their labels so a
    tiny model can learn real structure (each token paints a distinctive
    band of frames)."""
    rng = np.random.default_rng(seed)
    utts = []
    for _ in range(n):
        L = int(rng.integers(3, 9))
        toks = rng.integers(6, odim, L)
        frames = []
        for t in toks:
            f = rng.integers(6, 12)
            proto = np.zeros(idim, np.float32)
            proto[t % idim] = 2.0
            proto[(t * 7) % idim] = -1.5
            frames.append(proto[None].repeat(f, 0)
                          + 0.3 * rng.standard_normal((f, idim)))
        x = np.concatenate(frames, 0).astype(np.float32)
        utts.append((x, toks.astype(np.int64)))
    return utts


def pad_feats(utts):
    T = max(x.shape[0] for x, _ in utts)
    D = utts[0][0].shape[1]
    feats = np.zeros((len(utts), T, D), np.float32)
    flen = np.zeros(len(utts), np.int64)
    for i, (x, _) in enumerate(utts):
        feats[i, : x.shape[0]] = x
        flen[i] = x.shape[0]
    return feats, flen


def train_torch(tm, utts, steps, lr=3e-3, seed=0):
    import torch
    rng = np.random.default_rng(seed)
    opt = torch.optim.Adam(tm.parameters(), lr=lr)
    ctc = torch.nn.CTCLoss(blank=BLANK, zero_infinity=True)
    tm.train()
    n = len(utts)
    for step in range(steps):
        idx = rng.choice(n, size=min(16, n), replace=False)
        batch = [utts[i] for i in idx]
        feats, flen = pad_feats(batch)
        Lmax = max(len(t) for _, t in batch)
        ys_in = np.full((len(batch), Lmax + 1), EOS, np.int64)
        att_lab = np.full((len(batch), Lmax + 1), IGNORE, np.int64)
        ylen = np.zeros(len(batch), np.int64)
        for i, (_, t) in enumerate(batch):
            ys_in[i, 0] = SOS
            ys_in[i, 1 : 1 + len(t)] = t
            att_lab[i, : len(t)] = t
            att_lab[i, len(t)] = EOS
            ylen[i] = len(t) + 1
        att_out, ctc_out, hs_len = tm(
            torch.from_numpy(feats), torch.from_numpy(flen),
            torch.from_numpy(ys_in), None)
        att_loss = torch.nn.functional.cross_entropy(
            att_out.reshape(-1, att_out.shape[-1]),
            torch.from_numpy(att_lab).reshape(-1), ignore_index=IGNORE)
        logp = torch.log_softmax(ctc_out, -1).transpose(0, 1)
        tgt = torch.from_numpy(
            np.concatenate([t for _, t in batch]))
        tlen = torch.from_numpy(np.asarray([len(t) for _, t in batch]))
        ctc_loss = ctc(logp, tgt, hs_len, tlen)
        loss = 0.7 * att_loss + 0.3 * ctc_loss
        opt.zero_grad()
        loss.backward()
        opt.step()
        if step % 20 == 0:
            print(f"  train step {step}: loss={float(loss):.3f}", flush=True)
    tm.eval()
    return tm


def build_models(which):
    import torch  # noqa: F401
    if which == "transformer":
        from lasr.model.e2e_ctc_att.e2e_transformer import (
            E2E_Transformer_CTC as TorchModel)
        from lasr_tpu.models.e2e_ctc_att import E2E_Transformer_CTC as Ours
        kw = dict(TINY)
    else:
        from lasr.model.e2e_ctc_att.e2e_conformer import (
            E2E_Conformer_CTC as TorchModel)
        from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC as Ours
        kw = dict(TINY, encoder_pos_enc_layer_type="rel_pos",
                  encoder_selfattention_layer_type="rel_selfattn",
                  encoder_use_cnn=True, encoder_cnn_kernel=7)
    return TorchModel(**kw), Ours(**kw)


def edit_distance(a, b):
    la, lb = len(a), len(b)
    d = np.arange(lb + 1)
    for i in range(1, la + 1):
        prev = d.copy()
        d[0] = i
        for j in range(1, lb + 1):
            d[j] = min(prev[j] + 1, d[j - 1] + 1,
                       prev[j - 1] + (a[i - 1] != b[j - 1]))
    return int(d[lb])


def train_flax_online(fm, utts, steps, lr=3e-3, seed=0):
    """Brief Adam training of the flax ONLINE model on the synthetic corpus
    (attention CE + first-party CTC), so online-decode agreement is tested
    on peaked posteriors, not tie-breaking noise."""
    import jax
    import jax.numpy as jnp
    import optax
    from lasr_tpu.ops.ctc import ctc_forward_from_logits

    rng = np.random.default_rng(seed)
    feats0, flen0 = pad_feats(utts[:2])
    variables = fm.init(jax.random.PRNGKey(seed), jnp.asarray(feats0),
                        jnp.asarray(flen0), jnp.full((2, 3), 5, jnp.int32))
    params = variables["params"]
    tx = optax.adam(lr)
    opt = tx.init(params)

    def make_batch(idx):
        batch = [utts[i] for i in idx]
        feats, flen = pad_feats(batch)
        Lmax = max(len(t) for _, t in batch)
        ys_in = np.full((len(batch), Lmax + 1), EOS, np.int64)
        att_lab = np.full((len(batch), Lmax + 1), IGNORE, np.int64)
        labels = np.zeros((len(batch), Lmax), np.int32)
        llen = np.zeros(len(batch), np.int32)
        for i, (_, t) in enumerate(batch):
            ys_in[i, 0] = SOS
            ys_in[i, 1: 1 + len(t)] = t
            att_lab[i, : len(t)] = t
            att_lab[i, len(t)] = EOS
            labels[i, : len(t)] = t
            llen[i] = len(t)
        return (jnp.asarray(feats), jnp.asarray(flen, jnp.int32),
                jnp.asarray(ys_in, jnp.int32), jnp.asarray(att_lab),
                jnp.asarray(labels), jnp.asarray(llen))

    @jax.jit
    def step_fn(params, opt, feats, flen, ys_in, att_lab, labels, llen):
        def loss_fn(p):
            out = fm.apply({"params": p}, feats, flen, ys_in,
                           deterministic=True)
            att_out, ctc_out, hs_len = (out["att_out"], out["ctc_out"],
                                        out["hs_len"])
            V = att_out.shape[-1]
            mask = att_lab != IGNORE
            logp = jax.nn.log_softmax(att_out, -1)
            onehot = jax.nn.one_hot(jnp.maximum(att_lab, 0), V)
            ce = -jnp.sum(jnp.sum(logp * onehot, -1) * mask) \
                / jnp.maximum(jnp.sum(mask), 1)
            ll = ctc_forward_from_logits(ctc_out, hs_len, labels, llen)
            ctc = -jnp.mean(ll / jnp.maximum(llen, 1))
            return 0.7 * ce + 0.3 * ctc
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, new_opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), new_opt, loss

    n = len(utts)
    for s in range(steps):
        idx = rng.choice(n, size=min(16, n), replace=False)
        params, opt, loss = step_fn(params, opt, *make_batch(idx))
        if s % 20 == 0:
            print(f"  flax train step {s}: loss={float(loss):.3f}",
                  flush=True)
    return {"params": params}


ONLINE_TINY = dict(idim=20, odim=40,
                   encoder_attention_dim=32, encoder_attention_heads=2,
                   encoder_left_chunk=16, encoder_center_chunk=16,
                   encoder_right_chunk=16,
                   encoder_linear_units=64, encoder_num_blocks=2,
                   decoder_attention_dim=32, decoder_self_attention_heads=2,
                   decoder_src_attention_heads=2, decoder_linear_units=64,
                   decoder_num_block=2, encoder_dropout_rate=0.0,
                   decoder_dropout_rate=0.0, ctc_dropout=0.0,
                   decoder_src_attention_sigmoid_noise=0.0)


def run_online_ref_gate(args):
    """Online gate vs the ACTUAL reference decoder: train the reference
    torch ``E2E_Transformer_CTC_Online``, drive its own
    ``decode_feat_online`` loop per utterance (ChunkEncoder streaming
    forward, MTA endpoint decoding, TCTCPrefixScore, online end detection,
    final rescore — /root/reference/lasr/decode/ctc_att_decoder.py:336-519),
    and compare our batched fixed-shape ``online=True`` search on the
    identical mapped weights."""
    import torch
    import jax
    import jax.numpy as jnp
    from lasr.model.e2e_ctc_att.e2e_transformer_online import (
        E2E_Transformer_CTC_Online as TorchModel)
    from lasr.decode.ctc_att_decoder import CTC_ATT_Decoder
    from lasr_tpu.models.e2e_online import (
        E2E_Transformer_CTC_Online as FlaxModel)
    from lasr_tpu.decode.beam import CTCAttBeamDecoder
    from lasr_tpu.utils.torch_compat import torch_to_flax

    torch.manual_seed(args.seed)
    tm = TorchModel(**ONLINE_TINY)
    fm = FlaxModel(**ONLINE_TINY)
    utts = make_corpus(args.n, ONLINE_TINY["idim"], ONLINE_TINY["odim"],
                       seed=args.seed)
    print(f"training tiny torch online model on {args.n} synthetic utts "
          f"({args.train_steps} steps)...", flush=True)
    tm = train_torch(tm, utts, args.train_steps, seed=args.seed)

    feats, flen = pad_feats(utts)
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(feats[:1]),
                       jnp.asarray(flen[:1], jnp.int32),
                       jnp.full((1, 3), 5, jnp.int32))
    variables = torch_to_flax(tm.state_dict(), template=template)

    ref_dec = CTC_ATT_Decoder(tm, SOS, EOS, beam=args.beam,
                              ctc_beam=args.ctc_beam, nbest=args.beam,
                              ctc_weight=args.ctc_weight,
                              penalty=args.penalty)
    t0 = time.time()
    ref_hyps = []
    with torch.no_grad():
        for x, _ in utts:
            nb = ref_dec.decode_feat_online(x, torch.tensor([x.shape[0]]))
            ref_hyps.append([(list(h["yseq"]), float(h["score"]))
                             for h in nb])
    t_ref = time.time() - t0

    our_dec = CTCAttBeamDecoder(fm, variables, sos=SOS, eos=EOS,
                                beam=args.beam, ctc_beam=args.ctc_beam,
                                nbest=args.beam, ctc_weight=args.ctc_weight,
                                penalty=args.penalty, online=True)
    t0 = time.time()
    out = our_dec(feats, flen)
    t_ours = time.time() - t0

    agree = 0
    errs = tot = 0
    score_deltas = []
    mismatches = []
    for b in range(args.n):
        ref_best, ref_score = ref_hyps[b][0]
        our_best = out.tokens[b, 0, : int(out.lengths[b, 0])].tolist()
        our_score = float(out.scores[b, 0])
        if ref_best == our_best:
            agree += 1
            score_deltas.append(abs(ref_score - our_score))
        else:
            mismatches.append((b, ref_best, our_best, ref_score, our_score))
        r = ref_best[1:-1]
        errs += edit_distance(r, our_best[1:-1])
        tot += len(r)
    report = {
        "model": "transformer_online (vs ACTUAL reference "
                 "decode_feat_online)",
        "n_utts": args.n,
        "beam": args.beam, "ctc_beam": args.ctc_beam,
        "ctc_weight": args.ctc_weight,
        "one_best_agreement": agree / args.n,
        "cross_wer": errs / max(tot, 1),
        "max_score_delta_on_agreeing": (max(score_deltas)
                                        if score_deltas else None),
        "ref_decode_s": round(t_ref, 2),
        "our_decode_s": round(t_ours, 2),
    }
    print(json.dumps(report, indent=2))
    for b, rb, ob, rs, os_ in mismatches[:10]:
        print(f"  mismatch utt {b}: ref {rb} ({rs:.4f})  ours {ob} ({os_:.4f})")
    return report


def run_online_gate(args):
    """Online-decode agreement gate: the batched fixed-shape online search
    (decode/beam.py online=True) vs the per-utterance replica driving the
    ACTUAL reference TCTCPrefixScore (tests/ref_beam_online.py — the
    truncation/end-detect/rescore semantics are the reference's own,
    ctc_prefix_score.py:191-334, ctc_att_decoder.py:336-594)."""
    import jax  # noqa: F401
    from lasr_tpu.decode.beam import CTCAttBeamDecoder
    from lasr_tpu.models.e2e_online import E2E_Transformer_CTC_Online
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tests.ref_beam_online import ref_online_beam_search

    kw = dict(idim=TINY["idim"], odim=TINY["odim"],
              encoder_attention_dim=32, encoder_attention_heads=2,
              encoder_left_chunk=8, encoder_center_chunk=8,
              encoder_right_chunk=8,
              encoder_linear_units=64, encoder_num_blocks=2,
              decoder_attention_dim=32, decoder_self_attention_heads=2,
              decoder_src_attention_heads=2, decoder_linear_units=64,
              decoder_num_block=2, encoder_dropout_rate=0.0,
              decoder_dropout_rate=0.0, ctc_dropout=0.0,
              decoder_src_attention_sigmoid_noise=0.0)
    fm = E2E_Transformer_CTC_Online(**kw)
    utts = make_corpus(args.n, TINY["idim"], TINY["odim"], seed=args.seed)
    print(f"training tiny flax online model on {args.n} synthetic utts "
          f"({args.train_steps} steps)...", flush=True)
    variables = train_flax_online(fm, utts, args.train_steps, seed=args.seed)

    feats, flen = pad_feats(utts)
    dec = CTCAttBeamDecoder(fm, variables, sos=SOS, eos=EOS, beam=args.beam,
                            ctc_beam=args.ctc_beam, nbest=args.beam,
                            ctc_weight=args.ctc_weight, online=True)
    t0 = time.time()
    out = dec(feats, flen)
    t_ours = time.time() - t0

    t0 = time.time()
    agree = 0
    errs = tot = 0
    score_deltas = []
    mismatches = []
    import jax.numpy as jnp
    for b in range(args.n):
        ref = ref_online_beam_search(
            fm, variables, jnp.asarray(feats[b: b + 1]),
            jnp.asarray(flen[b: b + 1], jnp.int32),
            beam=args.beam, ctc_beam=args.ctc_beam,
            ctc_weight=args.ctc_weight)
        if not ref:
            continue
        ref_best, ref_score = ref[0]["yseq"], float(ref[0]["score"])
        our_best = out.tokens[b, 0, : int(out.lengths[b, 0])].tolist()
        our_score = float(out.scores[b, 0])
        if list(ref_best) == our_best:
            agree += 1
            score_deltas.append(abs(ref_score - our_score))
        else:
            mismatches.append((b, list(ref_best), our_best, ref_score,
                               our_score))
        r = list(ref_best)[1:-1]
        errs += edit_distance(r, our_best[1:-1])
        tot += len(r)
    t_ref = time.time() - t0
    report = {
        "model": "transformer_online",
        "n_utts": args.n,
        "beam": args.beam, "ctc_beam": args.ctc_beam,
        "ctc_weight": args.ctc_weight,
        "one_best_agreement": agree / args.n,
        "cross_wer": errs / max(tot, 1),
        "max_score_delta_on_agreeing": (max(score_deltas)
                                        if score_deltas else None),
        "ref_decode_s": round(t_ref, 2),
        "our_decode_s": round(t_ours, 2),
    }
    print(json.dumps(report, indent=2))
    for b, rb, ob, rs, os_ in mismatches[:10]:
        print(f"  mismatch utt {b}: ref {rb} ({rs:.4f})  ours {ob} ({os_:.4f})")
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model",
                    choices=["transformer", "conformer",
                             "transformer_online"],
                    default="transformer",
                    help="transformer_online drives the ACTUAL reference "
                         "decode_feat_online on a trained torch online "
                         "model (mapped weights)")
    ap.add_argument("--online", action="store_true",
                    help="replica online gate: batched online=True search "
                         "vs the reference-TCTCPrefixScore replica on OUR "
                         "trained flax model")
    ap.add_argument("--n", type=int, default=120)
    ap.add_argument("--train-steps", type=int, default=120)
    ap.add_argument("--beam", type=int, default=10)
    ap.add_argument("--ctc-beam", type=int, default=15)
    ap.add_argument("--ctc-weight", type=float, default=0.5)
    ap.add_argument("--penalty", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.model == "transformer_online":
        return run_online_ref_gate(args)
    if args.online:
        return run_online_gate(args)

    import torch
    import jax
    import jax.numpy as jnp
    from lasr.decode.ctc_att_decoder import CTC_ATT_Decoder
    from lasr_tpu.decode.beam import CTCAttBeamDecoder
    from lasr_tpu.utils.torch_compat import torch_to_flax

    torch.manual_seed(args.seed)
    tm, fm = build_models(args.model)
    utts = make_corpus(args.n, TINY["idim"], TINY["odim"], seed=args.seed)
    print(f"training tiny torch {args.model} on {args.n} synthetic utts "
          f"({args.train_steps} steps)...", flush=True)
    tm = train_torch(tm, utts, args.train_steps, seed=args.seed)

    feats, flen = pad_feats(utts)
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(feats[:1]),
                       jnp.asarray(flen[:1]), jnp.full((1, 3), 5, jnp.int32))
    variables = torch_to_flax(tm.state_dict(), template=template)

    # ---- reference decode (per utterance) ----
    ref_dec = CTC_ATT_Decoder(tm, SOS, EOS, beam=args.beam,
                              ctc_beam=args.ctc_beam, nbest=args.beam,
                              ctc_weight=args.ctc_weight,
                              penalty=args.penalty)
    t0 = time.time()
    ref_hyps = []
    with torch.no_grad():
        for x, _ in utts:
            nb = ref_dec.decode_feat(x, torch.tensor([x.shape[0]]))
            ref_hyps.append([(list(h["yseq"]), float(h["score"]))
                             for h in nb])
    t_ref = time.time() - t0

    # ---- ours (batched) ----
    our_dec = CTCAttBeamDecoder(fm, variables, sos=SOS, eos=EOS,
                                beam=args.beam, ctc_beam=args.ctc_beam,
                                nbest=args.beam,
                                ctc_weight=args.ctc_weight,
                                penalty=args.penalty)
    t0 = time.time()
    out = our_dec(feats, flen)
    t_ours = time.time() - t0

    agree = 0
    errs = tot = 0
    score_deltas = []
    mismatches = []
    for b in range(args.n):
        ref_best, ref_score = ref_hyps[b][0]
        our_best = out.tokens[b, 0, : int(out.lengths[b, 0])].tolist()
        our_score = float(out.scores[b, 0])
        if ref_best == our_best:
            agree += 1
            score_deltas.append(abs(ref_score - our_score))
        else:
            mismatches.append((b, ref_best, our_best, ref_score, our_score))
        r = ref_best[1:-1]
        errs += edit_distance(r, our_best[1:-1])
        tot += len(r)
    report = {
        "model": args.model,
        "n_utts": args.n,
        "beam": args.beam, "ctc_beam": args.ctc_beam,
        "ctc_weight": args.ctc_weight,
        "one_best_agreement": agree / args.n,
        "cross_wer": errs / max(tot, 1),
        "max_score_delta_on_agreeing": (max(score_deltas)
                                        if score_deltas else None),
        "ref_decode_s": round(t_ref, 2),
        "our_decode_s": round(t_ours, 2),
    }
    print(json.dumps(report, indent=2))
    for b, rb, ob, rs, os_ in mismatches[:10]:
        print(f"  mismatch utt {b}: ref {rb} ({rs:.4f})  ours {ob} ({os_:.4f})")
    return report


if __name__ == "__main__":
    main()
