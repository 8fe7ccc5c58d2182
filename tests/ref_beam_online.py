"""Host-side golden replication of the reference ONLINE beam search.

A slow dict-based implementation of CTC_ATT_Decoder.decode_feat_online
(ctc_att_decoder.py:336-519): streaming encoder forward, truncated CTC
prefix scoring, online end detection, final full-length CTC rescore.

The scorer is the ACTUAL reference ``TCTCPrefixScore`` imported from
/root/reference (read-only), so the truncation semantics — frontier
advance, eos s_sum, prefix-tree rescoring — are authoritative, not a
re-derivation.  Used only to validate lasr_tpu/decode/beam.py's
``online=True`` fixed-shape search.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

from lasr_tpu.utils.masks import target_mask

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

LOG0 = -1e10


def end_detect_online(ended, remained, i, T, M=3, D_end=-10.0):
    """ctc_att_decoder.py:555-594."""
    if not ended:
        return False
    if not remained:
        return True
    if min(h["end"] for h in remained) + 1 != T:
        return False
    long_hyps = [h for h in ended if len(h["yseq"]) == i + 2]
    if not long_hyps:
        return False
    best_long = max(h["score"] for h in long_hyps)
    count = 0
    for m in range(M):
        same = [h for h in ended if len(h["yseq"]) == i + 1 - m]
        if same and best_long - max(h["score"] for h in same) < D_end:
            count += 1
    return count == M


def ref_online_beam_search(model, variables, feats, feat_len, *, sos=1,
                           eos=2, blank=0, beam=5, ctc_beam=8,
                           ctc_weight=0.5, penalty=0.0):
    """Single-utterance reference online search. feats: (1, T_in, D)."""
    from lasr.utils.ctc_prefix_score import TCTCPrefixScore

    hs, hs_len = model.apply(variables, feats, feat_len, ref_tail=True,
                             method=model.encode_online)
    T = int(hs_len[0])
    hs = hs[:, :T]
    lpz = np.asarray(jax.nn.log_softmax(
        model.apply(variables, hs,
                    method=model.ctc_logits).astype(jnp.float32), -1))[0]
    scorer = TCTCPrefixScore(lpz, blank, eos, np)

    def att_logp(hyp, i):
        """One step of the reference's ONLINE one-step decoder
        (forward_one_step_online: cached self-attn + endpoint-truncated
        monotonic source attention, decoder.py:114-142) with the
        reference's cache threading: every beam child shares its parent's
        ``att_prev`` object (ctc_att_decoder.py:446) and the endpoint list
        is mutated IN PLACE by decode_attention (attention.py:109-117), so
        siblings expanded earlier in beam order advance the endpoints seen
        by later siblings.  ``hyp["ep_box"]`` is the shared mutable holder
        emulating that list."""
        cache = dict(hyp["cache"])
        cache["ep"] = hyp["ep_box"][0]
        logp, new_cache = model.apply(
            variables, jnp.asarray([hyp["yseq"][-1]], jnp.int32), i, cache,
            hs, method=model.decoder_step_online)
        hyp["ep_box"][0] = new_cache["ep"]
        return np.asarray(logp[0].astype(jnp.float32)), new_cache

    maxlen = T
    V = lpz.shape[-1]
    # online prescreen spans the full vocab incl. blank (:411-412)
    C = V if ctc_weight == 1.0 else min(ctc_beam, V)

    r0, hist0 = scorer.initial_state()
    cache0 = model.apply(variables, 1, maxlen + 2,
                         method=model.decoder_init_cache)
    hyps = [{"score": 0.0, "yseq": [sos], "r": r0, "hist": hist0,
             "psi": 0.0, "end": 0, "att_lm": 0.0,
             "cache": cache0, "ep_box": [cache0["ep"]]}]
    ended = []
    for i in range(maxlen):
        kept = []
        for hyp in hyps:
            logp, new_cache = att_logp(hyp, i)
            order = np.argsort(logp)[::-1][:C]
            psi, states, hists, ctc_end = scorer(
                hyp["yseq"], order, hyp["r"], hyp["hist"])
            local = (1.0 - ctc_weight) * logp[order] \
                + ctc_weight * (psi - hyp["psi"])
            att_lm_local = (1.0 - ctc_weight) * logp[order]
            top = np.argsort(local)[::-1][:beam]
            shared_box = [new_cache["ep"]]
            for j in top:
                kept.append({
                    "score": hyp["score"] + float(local[j]),
                    "yseq": hyp["yseq"] + [int(order[j])],
                    "r": states[j], "hist": hists,
                    "psi": float(psi[j]), "end": int(ctc_end),
                    "att_lm": hyp["att_lm"] + float(att_lm_local[j]),
                    "cache": new_cache, "ep_box": shared_box})
        hyps = sorted(kept, key=lambda x: -x["score"])[:beam]
        if i == maxlen - 1:
            for h in hyps:
                h["yseq"].append(eos)
        remained = []
        for h in hyps:
            if h["yseq"][-1] == eos:
                h["score"] += (i + 1) * penalty
                ended.append(h)
            else:
                remained.append(h)
        if end_detect_online(ended, remained, i, T):
            break
        hyps = remained
        if not hyps:
            break

    # final rescore of truncated enders: w·ctc_full + att score, REPLACING
    # the stored score incl. its penalty bonus (:498-504)
    for h in ended:
        if h["end"] + 1 < T:
            res = float(scorer.rescore(h["yseq"], h["r"]))
            h["score"] = ctc_weight * res + h["att_lm"]
    return sorted(ended, key=lambda x: -x["score"])
