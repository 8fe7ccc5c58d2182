"""Learnability: the full pipeline must actually fit a separable toy task.

Trains the tiny transformer on tone-coded words and checks the greedy CTC
transcription error drops well below chance — this catches sign/masking/
label-packing bugs that shape tests cannot.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lasr_tpu.data.dataset import BatchAudioDataSet
from lasr_tpu.data.frontend import DeviceFrontend
from lasr_tpu.data.reader import write_wav
from lasr_tpu.data.tokenizer import CharTokenizer
from lasr_tpu.decode.greedy import ctc_greedy_decode
from lasr_tpu.models.e2e_ctc_att import E2E_Transformer_CTC
from lasr_tpu.models.losses import E2E_Loss
from lasr_tpu.parallel.mesh import make_mesh
from lasr_tpu.train.optimizer import Adam, WarmupScheduler
from lasr_tpu.train.trainer import Trainer
from lasr_tpu.utils.text import ErrorRateAccumulator

TONES = {"A": 250.0, "B": 710.0, "E": 1610.0}


@pytest.mark.slow
def test_pipeline_learns_toy_task(tmp_path):
    rng = np.random.default_rng(0)
    names = list(TONES)
    scp, txt = [], []
    for i in range(24):
        words = [names[rng.integers(3)] for _ in range(rng.integers(1, 4))]
        parts = []
        for w in words:
            t = np.arange(3200) / 16000.0
            parts.append(0.4 * np.sin(2 * np.pi * TONES[w] * t)
                         * np.hanning(3200))
            parts.append(np.zeros(800))
        wav = np.concatenate(parts) + 0.01 * rng.standard_normal(1)[0]
        p = tmp_path / f"u{i:02d}.wav"
        write_wav(str(p), wav, 16000)
        scp.append(f"u{i:02d} {p}")
        txt.append(f"u{i:02d} {''.join(words)}")
    (tmp_path / "wav.scp").write_text("\n".join(scp) + "\n")
    (tmp_path / "text").write_text("\n".join(txt) + "\n")
    (tmp_path / "dict.txt").write_text("\n".join(names) + "\n")

    tok = CharTokenizer(str(tmp_path / "dict.txt"))
    ds = BatchAudioDataSet(
        wav_list=str(tmp_path / "wav.scp"), text_list=str(tmp_path / "text"),
        tokenizer=tok, audio_trans=["norm", "fbank:80"],
        batch_type="size", batch_size=12, min_duration=0.0, text_freq=0.0)
    ds.load_check_data()

    model = E2E_Transformer_CTC(
        idim=80, odim=tok.dict_size(),
        encoder_attention_dim=32, encoder_attention_heads=2,
        encoder_linear_units=64, encoder_num_blocks=1,
        decoder_attention_dim=32, decoder_attention_heads=2,
        decoder_linear_units=64, decoder_num_block=1,
        encoder_dropout_rate=0.0, decoder_dropout_rate=0.0, ctc_dropout=0.0)
    crit = E2E_Loss(size=tok.dict_size(), padding_idx=-1, smoothing=0.1,
                    rate=0.5)
    sched = WarmupScheduler(model_size=32, factor=3.0, warm_step=60)
    trainer = Trainer(model, crit, Adam(betas=(0.9, 0.98)).make(sched),
                      DeviceFrontend(["norm", "fbank:80"]), tokenizer=tok,
                      schedule=sched,
                      mesh=make_mesh(data=1, devices=jax.devices()[:1]),
                      log_interval=10**9)
    batches = list(ds.batches())
    state = trainer.init_state(batches[0])
    for step in range(150):
        state, metrics = trainer.train_step(state, batches[step % len(batches)])

    # greedy CTC on the training data
    fe = DeviceFrontend(["norm", "fbank:80"])
    acc = ErrorRateAccumulator()
    variables = {"params": state.params}
    for batch in batches:
        feats, feat_len = fe(jnp.asarray(batch["wav_array"]),
                             jnp.asarray(batch["wav_len"]))
        hs, hs_len = model.apply(variables, feats, feat_len,
                                 method=model.encode)
        logits = model.apply(variables, hs, method=model.ctc_logits)
        hyps = ctc_greedy_decode(logits, hs_len)
        for b in range(batch["n_utts"]):
            _, ref = tok.decode(
                [int(t) for t in batch["token_id"][b][: batch["token_len"][b]]],
                no_special=True)
            _, hyp = tok.decode(hyps[b], no_special=True)
            acc.add(ref, hyp)
    assert acc.rate < 0.3, acc.report()


@pytest.mark.slow
def test_conformer_relpos_learns_toy_task(tmp_path):
    """The flagship conformer (rel-pos attention + BatchNorm conv module)
    also fits the toy task — covers the recipe path end to end."""
    from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC
    rng = np.random.default_rng(1)
    names = list(TONES)
    scp, txt = [], []
    for i in range(16):
        words = [names[rng.integers(3)] for _ in range(rng.integers(1, 3))]
        parts = []
        for w in words:
            t = np.arange(3200) / 16000.0
            parts.append(0.4 * np.sin(2 * np.pi * TONES[w] * t)
                         * np.hanning(3200))
            parts.append(np.zeros(800))
        wav = np.concatenate(parts)
        p = tmp_path / f"c{i:02d}.wav"
        write_wav(str(p), wav, 16000)
        scp.append(f"c{i:02d} {p}")
        txt.append(f"c{i:02d} {''.join(words)}")
    (tmp_path / "wav.scp").write_text("\n".join(scp) + "\n")
    (tmp_path / "text").write_text("\n".join(txt) + "\n")
    (tmp_path / "dict.txt").write_text("\n".join(names) + "\n")

    tok = CharTokenizer(str(tmp_path / "dict.txt"))
    ds = BatchAudioDataSet(
        wav_list=str(tmp_path / "wav.scp"), text_list=str(tmp_path / "text"),
        tokenizer=tok, audio_trans=["norm", "fbank:80"],
        batch_type="size", batch_size=16, min_duration=0.0, text_freq=0.0)
    ds.load_check_data()

    model = E2E_Conformer_CTC(
        idim=80, odim=tok.dict_size(),
        encoder_attention_dim=32, encoder_attention_heads=2,
        encoder_linear_units=64, encoder_num_blocks=1,
        decoder_attention_dim=32, decoder_attention_heads=2,
        decoder_linear_units=64, decoder_num_block=1,
        encoder_pos_enc_layer_type="rel_pos",
        encoder_selfattention_layer_type="rel_selfattn",
        encoder_cnn_kernel=7,
        encoder_dropout_rate=0.0, decoder_dropout_rate=0.0, ctc_dropout=0.0)
    crit = E2E_Loss(size=tok.dict_size(), padding_idx=-1, smoothing=0.1,
                    rate=0.5)
    sched = WarmupScheduler(model_size=32, factor=3.0, warm_step=50)
    trainer = Trainer(model, crit, Adam(betas=(0.9, 0.98)).make(sched),
                      DeviceFrontend(["norm", "fbank:80"]), tokenizer=tok,
                      schedule=sched,
                      mesh=make_mesh(data=1, devices=jax.devices()[:1]),
                      log_interval=10**9)
    batch = next(iter(ds.batches()))
    state = trainer.init_state(batch)
    for _ in range(120):
        state, metrics = trainer.train_step(state, batch)

    fe = DeviceFrontend(["norm", "fbank:80"])
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    feats, feat_len = fe(jnp.asarray(batch["wav_array"]),
                         jnp.asarray(batch["wav_len"]))
    hs, hs_len = model.apply(variables, feats, feat_len, method=model.encode)
    logits = model.apply(variables, hs, method=model.ctc_logits)
    hyps = ctc_greedy_decode(logits, hs_len)
    acc = ErrorRateAccumulator()
    for b in range(batch["n_utts"]):
        ref = [int(t) for t in batch["token_id"][b][: batch["token_len"][b]]]
        acc.add(ref, hyps[b])
    assert acc.rate < 0.35, acc.report()
