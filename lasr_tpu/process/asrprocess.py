"""One-call inference API: ``ASRProcess(...)("test.wav") → (tokens, text)``.

Behavioral port of ``lasr/process/asrprocess.py:9-74``: builds
tokenizer + model from the training config, loads a checkpoint (EMA shadow
preferred, like decode_lighting.py:66-78), re-applies the decode config's
``audio_trans`` frontend chain on-device, runs joint CTC/attention beam
search, strips sos/eos, and decodes to text.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np
import yaml

from lasr_tpu.data import reader
from lasr_tpu.data.frontend import DeviceFrontend
from lasr_tpu.decode.beam import CTCAttBeamDecoder
from lasr_tpu.utils.registry import BaseConfig


class ASRProcess:
    def __init__(self, train_config: str, decode_config: str, model_path: str,
                 choose: str = "last", avg: int = 1):
        with open(train_config) as f:
            tc = yaml.safe_load(f)
        with open(decode_config) as f:
            dc = yaml.safe_load(f)

        self.tokenizer = BaseConfig(**tc["tokenizer_config"]).generateExample()
        self.model = BaseConfig(**tc["model_config"]).generateExample()

        from lasr_tpu.train.trainer import (decode_variables,
                                            load_averaged_params)
        params, batch_stats = load_averaged_params(model_path, choose, avg)
        self.variables = decode_variables(params, batch_stats)

        cfg = dc.get("decode_config", {})
        trans = dc.get("test_data_config", {}).get("kwargs", {}).get(
            "audio_trans", ["norm", "fbank:80"])
        self.frontend = DeviceFrontend([t for t in trans if not t.startswith("specaug")])
        from lasr_tpu.decode.lm import build_lm
        lm, lm_weight = build_lm(cfg)
        self.method = cfg.get("decode_method", "ctc_att")
        self.decoder = None
        self.bs_decoder = None
        self.w2l_decoder = None
        self.wfst_decoder = None
        if self.method in ("ctc_att", "ctc_att_online"):
            self.decoder = CTCAttBeamDecoder(
                self.model, self.variables,
                sos=self.tokenizer.ID_VALUE_SOS,
                eos=self.tokenizer.ID_VALUE_EOS,
                beam=cfg.get("beam", 10), ctc_beam=cfg.get("ctc_beam", 15),
                ctc_weight=cfg.get("ctc_weight", 0.5),
                nbest=int(cfg.get("nbest", 1)), lm=lm, lm_weight=lm_weight,
                online=self.method == "ctc_att_online")
            seg = int(cfg.get("longform_segment_frames", 0))
            self.longform = None
            if seg > 0 and self.method == "ctc_att":
                # hour-scale audio: windowed linear-compute encoding +
                # blank-aligned segmented decoding
                from lasr_tpu.decode.longform import LongFormCTCAttDecoder
                self.longform = LongFormCTCAttDecoder(
                    self.decoder, segment_frames=seg,
                    encoder_window_frames=int(cfg.get(
                        "longform_encoder_window_frames", 0)),
                    encoder_halo_frames=int(cfg.get(
                        "longform_encoder_halo_frames", 128)))
        elif self.method == "ctc_bs":
            from lasr_tpu.decode.ctc_bs import CTC_Decoder
            self.bs_decoder = CTC_Decoder(
                beam_size=cfg.get("beam", 10),
                ctc_beam=cfg.get("ctc_beam", 15),
                sos=self.tokenizer.ID_VALUE_SOS, rnn_lm=lm,
                lm_rate=lm_weight)
        elif self.method in ("ctc_kenlm", "ctc_kenlm_lexcoin"):
            import math as _math
            from lasr_tpu.decode.ctc_w2l import CTC_KenLM_Decoder
            self.w2l_decoder = CTC_KenLM_Decoder(
                beam_size=cfg.get("beam", 10),
                beam_threshold=cfg.get("beam_threshold", 25.0),
                lexicon=cfg["lexicon"], tokens_dict=cfg["tokens_dict"],
                kenlm_model=cfg["kenlm_model"],
                sos="<eos>", blk="<blank>", unk="<unk>",
                sil=cfg.get("sil"),
                lm_weight=cfg.get("lm_weight", 2.0),
                word_score=cfg.get("word_score", -1.0),
                unk_score=-_math.inf,
                sil_score=cfg.get("sil_score", 0.0),
                log_add=bool(cfg.get("log_add", False)),
                beam_size_token=cfg.get("beam_size_token"))
        elif self.method == "wfst":
            from lasr_tpu.decode.wfst import Kaldi_Decoder
            self.wfst_decoder = Kaldi_Decoder(
                beam=cfg.get("wfst_beam", 16.0),
                max_active=cfg.get("max_active", 7000),
                mdl=cfg.get("mdl"), fst=cfg["fst"], word=cfg["word"],
                acoustic_scale=cfg.get("acoustic_scale", 0.1))
        elif self.method != "ctc_greedy":
            raise ValueError(f"unknown decode_method {self.method!r}")

    def frontend_wave(self, wav_path: str) -> Tuple[np.ndarray, int]:
        wav, sr = reader.read_audio(wav_path)
        wav = reader.average_channels(wav)
        if sr != 16000:
            # same windowed-sinc resampler as the training data path
            from lasr_tpu.data.resample import resample_kaiser
            wav = resample_kaiser(wav, sr, 16000)
        return np.asarray(wav, dtype=np.float32), len(wav)

    def model_forward(self, wav: np.ndarray, n: int) -> List[int]:
        import jax
        import jax.numpy as jnp
        feats, feat_len = self.frontend(
            jnp.asarray(wav[None, :]), jnp.asarray([n], dtype=jnp.int32))
        if getattr(self, "longform", None) is not None:
            return self.longform(feats, feat_len)[0]
        if self.decoder is not None:
            hyps = self.decoder(feats, feat_len)
            return hyps.best_ids(0)  # sos/eos stripped
        hs, hs_len = self.model.apply(self.variables, feats, feat_len,
                                      solo_pad=True, method=self.model.encode)
        logits = self.model.apply(self.variables, hs,
                                  method=self.model.ctc_logits)
        if self.bs_decoder is not None:
            lpz = np.asarray(jax.nn.log_softmax(
                logits.astype(jnp.float32), axis=-1))[0, : int(hs_len[0])]
            cands = self.bs_decoder.decode_problike(lpz)
            return list(cands[0][0][1:]) if cands else []
        if self.w2l_decoder is not None:
            lpz = np.asarray(jax.nn.log_softmax(
                logits.astype(jnp.float32), axis=-1))[0, : int(hs_len[0])]
            nb = self.w2l_decoder.decode_problike(lpz)
            return nb[0][0] if nb else []
        if self.wfst_decoder is not None:
            lpz = np.asarray(jax.nn.log_softmax(
                logits.astype(jnp.float32), axis=-1))[0, : int(hs_len[0])]
            # the graph emits word strings, not token ids — __call__
            # special-cases this return
            return self.wfst_decoder.decode_loglike(lpz)["text"]
        from lasr_tpu.decode.greedy import ctc_greedy_decode
        return ctc_greedy_decode(logits, hs_len)[0]

    def backend(self, token_ids: List[int]) -> Tuple[List[str], str]:
        return self.tokenizer.decode(token_ids, no_special=True)

    def __call__(self, wav_path: str) -> Tuple[List[str], str]:
        wav, n = self.frontend_wave(wav_path)
        ids = self.model_forward(wav, n)
        if self.wfst_decoder is not None:   # word text, not token ids
            return ids.split(), ids
        return self.backend(ids)
