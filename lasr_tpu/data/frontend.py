"""On-device frontend: YAML ``audio_trans`` chain → one jittable function.

The reference applies its transform registry per-utterance on host CPU
workers (``lasr/data/dataset.py:196-197`` over ``datatrans.py:8-151``); here
the same YAML list compiles into a single on-device function that the train
step fuses with the model forward — raw padded waveforms go in, log-mel
(optionally SpecAugmented) features come out, all on the TPU.

Supported transforms: ``norm`` (peak normalize), ``fbank:N`` (Kaldi log-mel,
N mel bins), ``specaug``.  Host-only transforms (``avgchannel``,
``resample:16k``) run at read time in the dataset; ``soxspeed`` speed
perturbation is not yet implemented on-device.
"""

from __future__ import annotations

import re
from dataclasses import replace
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from lasr_tpu.ops.fbank import KaldiFbankConfig, log_mel_fbank, peak_normalize
from lasr_tpu.ops.specaug import spec_augment


class DeviceFrontend:
    """Callable (wav, wav_len, key, train) → (feats, feat_len)."""

    def __init__(self, audio_trans: Sequence[str],
                 fbank: Optional[KaldiFbankConfig] = None,
                 specaug_kwargs: Optional[Dict] = None):
        self.audio_trans = list(audio_trans)
        self.specaug_kwargs = dict(specaug_kwargs or {})
        self.fbank_cfg = fbank or KaldiFbankConfig()
        self.feat_dim = None
        self._plan = []
        for trans in self.audio_trans:
            if trans == "norm":
                self._plan.append(("norm", None))
            elif m := re.fullmatch(r"fbank:(\d+)", trans):
                bins = int(m.group(1))
                self.fbank_cfg = replace(self.fbank_cfg, num_mel_bins=bins)
                self.feat_dim = bins
                self._plan.append(("fbank", None))
            elif m := re.fullmatch(r"specaug(?::(.+))?", trans):
                # configurable in the transform string, mirroring the
                # reference SpecAug's knobs (datatrans.py SpecAug args):
                # "specaug:W=5,F=27,mF=2,T=40,mT=2" — essential when the
                # corpus bandwidth makes the speech defaults destructive
                # (narrowband material under F=27 freq masks loses whole
                # phones; see tools/convergence_run.py)
                alias = {"W": "max_time_warp", "F": "max_freq_width",
                         "mF": "n_freq_mask", "T": "max_time_width",
                         "mT": "n_time_mask"}
                kw = {}
                for part in (m.group(1) or "").split(","):
                    if not part:
                        continue
                    k, _, v = part.partition("=")
                    if k not in alias:
                        raise ValueError(
                            f"unknown specaug knob {k!r} in {trans!r} "
                            f"(expected {sorted(alias)})")
                    kw[alias[k]] = int(v)
                self._plan.append(("specaug", kw or None))
            elif trans in ("avgchannel", "resample:16k", "soxspeed"):
                # wave-domain host transforms: channel averaging and
                # resampling happen at read time; speed perturbation is
                # applied per-utterance in dataset batch assembly
                # (dataset.py:_read_waves), as in the reference's sox path
                continue
            else:
                raise ValueError(f"unknown audio transform {trans!r}")
        if self.feat_dim is None:
            raise ValueError("audio_trans must include an fbank:N stage for "
                             "the on-device frontend")

    def __call__(self, wav: jnp.ndarray, wav_len: jnp.ndarray,
                 key=None, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if jnp.issubdtype(wav.dtype, jnp.integer):
            # int16 wire format (dataset wire_dtype='int16'): PCM ships at
            # source precision, dequantized here on device to the readers'
            # float/32768 convention (reader.py:89) — half the H2D bytes
            wav = wav.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)
        feats, feat_len = None, None
        for kind, arg in self._plan:
            if kind == "norm":
                wav = peak_normalize(wav)
            elif kind == "fbank":
                feats, feat_len = log_mel_fbank(wav, wav_len, self.fbank_cfg)
            elif kind == "specaug" and train:
                assert feats is not None, "specaug must come after fbank"
                assert key is not None, "specaug needs a PRNG key in train mode"
                kw = dict(self.specaug_kwargs)
                if arg:
                    kw.update(arg)
                feats = spec_augment(feats, feat_len, key, **kw)
        return feats, feat_len


def pack_s2s(token_id: jnp.ndarray, token_len: jnp.ndarray,
             sos: int = 1, eos: int = 2, ignore: int = -1
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build (ys_in, att_label, ctc_label) from PAD-padded labels.

    Matches the reference ``get_s2s_inout`` + PAD→IGNORE rewrite
    (data_utils.py:20-26, bin/train_lighting.py:104-126):
      ys_in     = [sos, y1..yL, eos, eos, ...]      (padded with eos)
      att_label = [y1..yL, eos, ignore, ignore, ...] (padded with ignore)
      ctc_label = [y1..yL, ignore, ...]
    """
    B, L = token_id.shape
    pos = jnp.arange(L, dtype=token_len.dtype)[None, :]
    valid = pos < token_len[:, None]
    tokens = jnp.where(valid, token_id, 0)

    ys_in = jnp.concatenate(
        [jnp.full((B, 1), sos, token_id.dtype),
         jnp.where(valid, tokens, eos)], axis=1)
    pos1 = jnp.arange(L + 1, dtype=token_len.dtype)[None, :]
    shifted = jnp.concatenate([tokens, jnp.zeros((B, 1), token_id.dtype)],
                              axis=1)
    att_label = jnp.where(
        pos1 < token_len[:, None], shifted,
        jnp.where(pos1 == token_len[:, None], eos, ignore))
    ctc_label = jnp.where(valid, tokens, ignore)
    return ys_in, att_label, ctc_label
