"""Beam-decode agreement gate vs the ACTUAL reference decoder.

Drives /root/reference's ``CTC_ATT_Decoder.decode_feat``
(ctc_att_decoder.py:163-334) on a briefly-trained tiny torch model and
compares our batched ``CTCAttBeamDecoder`` on identical (torch-mapped)
weights: 1-best token agreement and scores.  This removes the shared-author
risk of the replica tests (tests/ref_beam.py) — the comparison target here
is the reference code itself, end to end (encoder, one-step decoder cache,
CTC prefix scoring, end detection, final selection).

The full 120-utterance version of this gate (both models, recipe decode
settings) is ``tools/parity_gate.py``; its results are recorded in
PARITY.md.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

from tools.parity_gate import (  # noqa: E402
    TINY, ONLINE_TINY, SOS, EOS, make_corpus, pad_feats, train_torch,
    build_models)


@pytest.mark.parametrize("which", ["transformer", "conformer"])
def test_beam_matches_reference_decoder(which):
    import jax
    import jax.numpy as jnp
    from lasr.decode.ctc_att_decoder import CTC_ATT_Decoder
    from lasr_tpu.decode.beam import CTCAttBeamDecoder
    from lasr_tpu.utils.torch_compat import torch_to_flax

    torch.manual_seed(0)
    tm, fm = build_models(which)
    n = 16
    utts = make_corpus(n, TINY["idim"], TINY["odim"], seed=0)
    tm = train_torch(tm, utts, steps=60, seed=0)

    feats, flen = pad_feats(utts)
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(feats[:1]),
                       jnp.asarray(flen[:1]), jnp.full((1, 3), 5, jnp.int32))
    variables = torch_to_flax(tm.state_dict(), template=template)

    ref_dec = CTC_ATT_Decoder(tm, SOS, EOS, beam=5, ctc_beam=8, nbest=1,
                              ctc_weight=0.5, penalty=0.0)
    our_dec = CTCAttBeamDecoder(fm, variables, sos=SOS, eos=EOS, beam=5,
                                ctc_beam=8, nbest=1, ctc_weight=0.5,
                                penalty=0.0)
    out = our_dec(feats, flen)
    for b in range(n):
        with torch.no_grad():
            nb = ref_dec.decode_feat(utts[b][0],
                                     torch.tensor([utts[b][0].shape[0]]))
        ref_best, ref_score = list(nb[0]["yseq"]), float(nb[0]["score"])
        our_best = out.tokens[b, 0, : int(out.lengths[b, 0])].tolist()
        assert our_best == ref_best, f"utt {b}: {our_best} != {ref_best}"
        assert abs(float(out.scores[b, 0]) - ref_score) < 1e-4


def test_online_beam_matches_reference_decode_feat_online():
    """Drives the ACTUAL reference ``decode_feat_online`` loop
    (ctc_att_decoder.py:336-519 — ChunkEncoder streaming forward, MTA
    endpoint-truncated decoder steps, TCTCPrefixScore, online end
    detection, final full-length rescore) on a briefly-trained torch
    ``E2E_Transformer_CTC_Online`` and compares our batched
    ``online=True`` search on identical mapped weights."""
    import jax
    import jax.numpy as jnp
    from lasr.decode.ctc_att_decoder import CTC_ATT_Decoder
    from lasr.model.e2e_ctc_att.e2e_transformer_online import (
        E2E_Transformer_CTC_Online as TorchModel)
    from lasr_tpu.models.e2e_online import (
        E2E_Transformer_CTC_Online as FlaxModel)
    from lasr_tpu.decode.beam import CTCAttBeamDecoder
    from lasr_tpu.utils.torch_compat import torch_to_flax

    torch.manual_seed(0)
    tm = TorchModel(**ONLINE_TINY)
    fm = FlaxModel(**ONLINE_TINY)
    n = 8
    utts = make_corpus(n, ONLINE_TINY["idim"], ONLINE_TINY["odim"], seed=0)
    tm = train_torch(tm, utts, steps=60, seed=0)

    feats, flen = pad_feats(utts)
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(feats[:1]),
                       jnp.asarray(flen[:1], jnp.int32),
                       jnp.full((1, 3), 5, jnp.int32))
    variables = torch_to_flax(tm.state_dict(), template=template)

    ref_dec = CTC_ATT_Decoder(tm, SOS, EOS, beam=5, ctc_beam=8, nbest=1,
                              ctc_weight=0.5, penalty=0.0)
    our_dec = CTCAttBeamDecoder(fm, variables, sos=SOS, eos=EOS, beam=5,
                                ctc_beam=8, nbest=1, ctc_weight=0.5,
                                penalty=0.0, online=True)
    out = our_dec(feats, flen)
    for b in range(n):
        with torch.no_grad():
            nb = ref_dec.decode_feat_online(
                utts[b][0], torch.tensor([utts[b][0].shape[0]]))
        ref_best, ref_score = list(nb[0]["yseq"]), float(nb[0]["score"])
        our_best = out.tokens[b, 0, : int(out.lengths[b, 0])].tolist()
        assert our_best == ref_best, f"utt {b}: {our_best} != {ref_best}"
        # briefly-trained posteriors are flat, so the truncated-CTC
        # frontier sits on near-tied psi comparisons and f32 drift
        # accumulates through the rescore chain; the 120-utt recipe-scale
        # gate (tools/parity_gate.py --model transformer_online) holds
        # 3.3e-6 on a properly trained model
        assert abs(float(out.scores[b, 0]) - ref_score) < 3e-3
