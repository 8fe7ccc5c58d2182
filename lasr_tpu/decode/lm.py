"""Decode-time language-model loading.

The reference decode CLI threads ``decode_config["lm_rate"]`` into the
joint decoder (decode_lighting.py:85-92) and its pure-CTC beam search takes
an ``rnn_lm`` with the ``predict`` contract (ctc_bs_decoder.py:12-132).
Here the LM is described by an optional ``lm_config`` block (same
``{name, kwargs}`` schema as every other component) plus ``lm_path``
(a checkpoint directory); shallow fusion is enabled when both are present
and ``lm_rate`` > 0.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Tuple

from lasr_tpu.modules.rnn import RNNLM
from lasr_tpu.utils.registry import BaseConfig


def load_lm_params(lm_path: str):
    """Restore an LM parameter tree from ``lm_path``: either a train
    checkpoints root (…/checkpoints with last/best managers — averaged via
    the newest checkpoint) or a single orbax checkpoint directory."""
    sub_last = os.path.join(lm_path, "last")
    if os.path.isdir(sub_last) or os.path.basename(
            os.path.normpath(lm_path)) in ("last", "best"):
        from lasr_tpu.train.trainer import load_averaged_params
        params, _ = load_averaged_params(lm_path, "last", avg=1)
        return params
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(lm_path))
    return tree.get("params", tree)


def build_lm(decode_cfg: dict) -> Tuple[Optional[RNNLM], float]:
    """(RNNLM | None, lm_weight) from a decode-config block.

    Fusion needs all three of ``lm_rate`` > 0, ``lm_config``, ``lm_path``;
    a positive lm_rate without a configured LM is a warning + weight 0
    (the reference silently passes rnnlm=None in that case,
    decode_lighting.py:91).
    """
    lm_rate = float(decode_cfg.get("lm_rate") or 0.0)
    lm_conf = decode_cfg.get("lm_config")
    lm_path = decode_cfg.get("lm_path")
    if lm_rate <= 0.0:
        return None, 0.0
    if not lm_conf or not lm_path:
        logging.warning("lm_rate=%s but lm_config/lm_path missing — "
                        "decoding without LM fusion", lm_rate)
        return None, 0.0
    module = BaseConfig(**lm_conf).generateExample()
    params = load_lm_params(lm_path)
    return RNNLM(module, {"params": params}), lm_rate
