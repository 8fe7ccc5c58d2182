"""ASRProcess one-call API: config + checkpoint → ("test.wav") → (tokens, text)."""

import os

import numpy as np
import jax
import pytest
import yaml

from lasr_tpu.data.dataset import BatchAudioDataSet
from lasr_tpu.data.frontend import DeviceFrontend
from lasr_tpu.data.reader import write_wav
from lasr_tpu.data.tokenizer import CharTokenizer
from lasr_tpu.models.e2e_ctc_att import E2E_Transformer_CTC
from lasr_tpu.models.losses import E2E_Loss
from lasr_tpu.parallel.mesh import make_mesh
from lasr_tpu.process.asrprocess import ASRProcess
from lasr_tpu.train.optimizer import Adam, WarmupScheduler
from lasr_tpu.train.trainer import Trainer


def test_asrprocess_one_call(tmp_path):
    # tiny corpus + dict
    rng = np.random.default_rng(0)
    n = 9600
    wav = 0.3 * np.sin(2 * np.pi * 300 * np.arange(n) / 16000)
    wav_path = str(tmp_path / "test.wav")
    write_wav(wav_path, wav, 16000)
    (tmp_path / "wav.scp").write_text(f"u0 {wav_path}\n")
    (tmp_path / "text").write_text("u0 GO\n")
    (tmp_path / "dict.txt").write_text("G\nO\n \n")

    tok_cfg = {"name": "lasr_tpu.data.tokenizer:CharTokenizer",
               "kwargs": {"dict_path": str(tmp_path / "dict.txt")}}
    model_cfg = {"name": "lasr_tpu.models.e2e_ctc_att:E2E_Transformer_CTC",
                 "kwargs": dict(
                     idim=80, odim=9,
                     encoder_attention_dim=16, encoder_attention_heads=2,
                     encoder_linear_units=32, encoder_num_blocks=1,
                     decoder_attention_dim=16, decoder_attention_heads=2,
                     decoder_linear_units=32, decoder_num_block=1,
                     encoder_dropout_rate=0.0, decoder_dropout_rate=0.0,
                     ctc_dropout=0.0)}
    exp = tmp_path / "exp"
    with open(tmp_path / "hparams.yaml", "w") as f:
        yaml.safe_dump({"model_config": model_cfg,
                        "tokenizer_config": tok_cfg}, f)
    with open(tmp_path / "decode.yaml", "w") as f:
        yaml.safe_dump({
            "decode_config": {"decode_method": "ctc_att", "beam": 3,
                              "ctc_beam": 5, "ctc_weight": 0.5, "lm_rate": 0},
            "test_data_config": {"kwargs": {
                "audio_trans": ["norm", "fbank:80"]}}}, f)

    # one training step to produce a checkpoint
    tok = CharTokenizer(str(tmp_path / "dict.txt"))
    ds = BatchAudioDataSet(
        wav_list=str(tmp_path / "wav.scp"), text_list=str(tmp_path / "text"),
        tokenizer=tok, audio_trans=["norm", "fbank:80"], batch_type="size",
        batch_size=1, min_duration=0.0, text_freq=0.0)
    ds.load_check_data()
    model = E2E_Transformer_CTC(**model_cfg["kwargs"])
    crit = E2E_Loss(size=9, padding_idx=-1, smoothing=0.1, rate=0.3)
    trainer = Trainer(model, crit,
                      Adam().make(WarmupScheduler(16, 1.0, 10)),
                      DeviceFrontend(["norm", "fbank:80"]), tokenizer=tok,
                      exp_dir=str(exp),
                      mesh=make_mesh(data=1, devices=jax.devices()[:1]))
    batch = next(iter(ds.batches()))
    state = trainer.init_state(batch)
    state, m = trainer.train_step(state, batch)
    trainer.save_checkpoint(state, {"loss_main": float(m["loss_main"])},
                            wait=True)

    asr = ASRProcess(str(tmp_path / "hparams.yaml"),
                     str(tmp_path / "decode.yaml"),
                     str(exp / "checkpoints"), choose="last", avg=1)
    tokens, text = asr(wav_path)
    assert isinstance(tokens, list) and isinstance(text, str)
