"""Decode RTF benchmark: batched joint CTC/attention beam search on-device.

Prints ONE JSON line {"metric": "decode_rtf", ...}.  RTF = wall time /
audio seconds decoded (lower is better); the reference decodes utterance by
utterance on CPU/one GPU with a python beam loop — here a whole batch of
beams advances inside one while_loop on the chip.
"""

import json
import time

import numpy as np


def main():
    from lasr_tpu.utils.env import respect_jax_platforms_env
    respect_jax_platforms_env()
    import jax
    import jax.numpy as jnp

    from lasr_tpu.data.frontend import DeviceFrontend
    from lasr_tpu.decode.beam import CTCAttBeamDecoder
    from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC

    odim = 5000
    model = E2E_Conformer_CTC(
        idim=80, odim=odim,
        encoder_attention_dim=320, encoder_attention_heads=8,
        encoder_linear_units=2048, encoder_num_blocks=12,
        decoder_attention_dim=320, decoder_attention_heads=8,
        decoder_linear_units=2048, decoder_num_block=6,
        encoder_pos_enc_layer_type="rel_pos",
        encoder_selfattention_layer_type="rel_selfattn",
        dtype=jnp.bfloat16)

    B, secs = 8, 10.0
    S = int(secs * 16000)
    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal((B, S))).astype(np.float32)
    wav_len = np.full((B,), S, np.int32)
    frontend = DeviceFrontend(["norm", "fbank:80"])
    feats, feat_len = frontend(jnp.asarray(wav), jnp.asarray(wav_len))

    ys = jnp.asarray(rng.integers(6, odim, (B, 8)))
    variables = model.init(jax.random.PRNGKey(0), feats, feat_len, ys)

    decoder = CTCAttBeamDecoder(model, variables, beam=10, ctc_beam=15,
                                ctc_weight=0.5)
    # warmup/compile
    out = decoder(feats, feat_len)
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        out = decoder(feats, feat_len)
    dt = time.perf_counter() - t0
    audio = B * secs * iters
    rtf = dt / audio
    print(json.dumps({
        "metric": "decode_rtf_ctc_att_beam10",
        "value": round(rtf, 5),
        "unit": "RTF (lower=better)",
        "vs_baseline": 1.0,
        "detail": {"batch": B, "utt_secs": secs,
                   "audio_secs_per_sec": round(audio / dt, 1),
                   "device": str(jax.devices()[0])},
    }))


if __name__ == "__main__":
    main()
