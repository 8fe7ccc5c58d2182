"""Host-side golden replication of the reference beam-search algorithm.

A direct, slow, dict-based implementation of CTC_ATT_Decoder.decode_feat
(ctc_att_decoder.py:163-334) + CTCPrefixScore (ctc_prefix_score.py:110-187)
in numpy, scoring with the same Flax model via the full (uncached) decoder
forward.  Used only to validate lasr_tpu/decode/beam.py's fixed-shape
while_loop search.
"""

import numpy as np
import jax
import jax.numpy as jnp

from lasr_tpu.utils.masks import target_mask

LOG0 = -1e10


class RefCTCPrefixScore:
    def __init__(self, x, blank, eos):
        self.x = x  # (T, V) log-probs
        self.blank, self.eos = blank, eos
        self.T = len(x)

    def initial_state(self):
        r = np.full((self.T, 2), LOG0, dtype=np.float64)
        r[0, 1] = self.x[0, self.blank]
        for i in range(1, self.T):
            r[i, 1] = r[i - 1, 1] + self.x[i, self.blank]
        return r

    def __call__(self, y, cs, r_prev):
        out_len = len(y) - 1
        r = np.full((self.T, 2, len(cs)), LOG0, dtype=np.float64)
        xs = self.x[:, cs]
        if out_len == 0:
            r[0, 0] = xs[0]

        r_sum = np.logaddexp(r_prev[:, 0], r_prev[:, 1])
        last = y[-1]
        log_phi = np.zeros((self.T, len(cs)))
        for i, c in enumerate(cs):
            log_phi[:, i] = r_prev[:, 1] if (out_len > 0 and c == last) \
                else r_sum

        start = max(out_len, 1)
        log_psi = r[start - 1, 0].copy()
        for t in range(start, self.T):
            r[t, 0] = np.logaddexp(r[t - 1, 0], log_phi[t - 1]) + xs[t]
            r[t, 1] = np.logaddexp(r[t - 1, 0], r[t - 1, 1]) \
                + self.x[t, self.blank]
            log_psi = np.logaddexp(log_psi, log_phi[t - 1] + xs[t])

        for i, c in enumerate(cs):
            if c == self.eos:
                log_psi[i] = r_sum[-1]
        return log_psi, np.rollaxis(r, 2)


def ref_beam_search(model, variables, feats, feat_len, *, sos=1, eos=2,
                    blank=0, beam=5, ctc_beam=8, ctc_weight=0.5,
                    lm=None, lm_weight=0.0):
    """Single-utterance reference search. feats: (1, T, D).

    With ``lm`` (an RNNLM wrapper): shallow fusion per the reference —
    attention-only prescreen, joint += lm_weight·lm[cs]
    (ctc_att_decoder.py:231-251)."""
    hs, hs_len = model.apply(variables, feats, feat_len, method=model.encode)
    T = int(hs_len[0])
    hs = hs[:, :T]
    lpz = np.asarray(jax.nn.log_softmax(
        model.apply(variables, hs, method=model.ctc_logits), axis=-1),
        dtype=np.float64)[0]
    scorer = RefCTCPrefixScore(lpz, blank, eos)

    def att_logp(yseq):
        ys = jnp.asarray([yseq])
        mask = target_mask(ys, ignore_id=-1)
        out = model.apply(variables, ys, mask, hs,
                          jnp.ones((1, 1, T), bool),
                          method=lambda m, *a: m.decoder(*a))
        return np.asarray(jax.nn.log_softmax(out[0, -1].astype(jnp.float32)),
                          dtype=np.float64)

    maxlen = T
    hyp = {"score": 0.0, "yseq": [sos],
           "ctc_state": scorer.initial_state(), "ctc_score": 0.0,
           "lm_state": None}
    hyps = [hyp]
    ended = []
    V = lpz.shape[-1]
    C = min(ctc_beam, V - 1)
    for i in range(maxlen):
        best_kept = []
        for hyp in hyps:
            logp = att_logp(hyp["yseq"])
            order = np.argsort(logp[1:])[::-1][:C] + 1
            psi, states = scorer(hyp["yseq"], order, hyp["ctc_state"])
            local = (1.0 - ctc_weight) * logp[order] \
                + ctc_weight * (psi - hyp["ctc_score"])
            lm_state = hyp["lm_state"]
            if lm is not None:
                lm_state, lm_logp = lm.predict(
                    np.asarray([hyp["yseq"][-1]]), hyp["lm_state"])
                local = local + lm_weight * np.asarray(
                    lm_logp[0], np.float64)[order]
            top = np.argsort(local)[::-1][:beam]
            for j in top:
                best_kept.append({
                    "score": hyp["score"] + float(local[j]),
                    "yseq": hyp["yseq"] + [int(order[j])],
                    "ctc_state": states[j], "ctc_score": float(psi[j]),
                    "lm_state": lm_state})
        hyps = sorted(best_kept, key=lambda x: -x["score"])[:beam]
        if i == maxlen - 1:
            for h in hyps:
                h["yseq"].append(eos)
        remained = []
        for h in hyps:
            if h["yseq"][-1] == eos:
                ended.append(h)
            else:
                remained.append(h)
        if end_detect(ended, i):
            break
        hyps = remained
        if not hyps:
            break
    return sorted(ended, key=lambda x: -x["score"])


def end_detect(ended, i, M=3, D_end=-10.0):
    if not ended:
        return False
    best = max(h["score"] for h in ended)
    count = 0
    for m in range(M):
        same = [h for h in ended if len(h["yseq"]) == i - m]
        if same and max(h["score"] for h in same) - best < D_end:
            count += 1
    return count == M
