"""Torch-checkpoint interop: reference state_dicts → Flax variable trees.

Loads checkpoints trained with the reference implementation (including the
published ``lighting-asr-en/zh`` model-zoo weights) into this framework's
models, handling the Lightning ``model.`` / ``model_ema.`` prefix split
(reference decode_lighting.py:66-78).  Covers the E2E transformer/conformer
families; tests validate full forward parity against the reference torch
modules run side by side.

Name mapping (torch → flax):
  encoder.embed.conv.{0,2,4}.*   → encoder/embed/Conv_{0,1,2}/*
  encoder.embed.out.0.*          → encoder/embed/Dense_0/*
  encoder.encoders.N.*           → encoder/layers_N/*
  decoder.decoders.N.*           → decoder/layers_N/*
  decoder.embed.0.weight         → decoder/embed_tok/embedding
  feed_forward.w_{1,2}           → feed_forward/Dense_{0,1}
  *.norm*.weight                 → */norm*/scale
  conv_module.norm.{running_*}   → batch_stats/.../norm/{mean,var}
  ctc.1.*                        → ctc/Dense_0/*

Tensor layout: Linear (out,in)→(in,out); Conv2d (out,in,kh,kw)→(kh,kw,in,out);
Conv1d (out,in/g,k)→(k,in/g,out); norms weight→scale; embeddings direct.
"""

from __future__ import annotations

import logging
import os
import re
from typing import Dict, Tuple

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict


def split_lightning_state_dict(state_dict: Dict) -> Dict[str, Dict]:
    """Split 'model.xxx' / 'model_ema.xxx' prefixes into sub-dicts."""
    out: Dict[str, Dict] = {}
    for k, v in state_dict.items():
        head, _, rest = k.partition(".")
        out.setdefault(head, {})[rest] = v
    return out


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _map_leaf(parts: Tuple[str, ...], arr: np.ndarray):
    """Map one torch parameter path (already '.'-split) to
    (collection, flax path tuple, converted array)."""
    name = list(parts)
    coll = "params"

    # module-level renames
    out: list = []
    i = 0
    while i < len(name):
        p = name[i]
        if p == "encoders" or p == "decoders":
            out.append(f"layers_{name[i + 1]}")
            i += 2
            continue
        if p == "embed" and i + 1 < len(name) and name[i + 1] == "conv":
            # encoder.embed.conv.K → embed/Conv_{K//2}
            k = int(name[i + 2])
            out += ["embed", f"Conv_{k // 2}"]
            i += 3
            continue
        if p == "embed" and i + 1 < len(name) and name[i + 1] == "out":
            out += ["embed", "Dense_0"]
            i += 3  # skip 'out', '0'
            continue
        if p == "embed" and i + 1 < len(name) and name[i + 1] == "0":
            # decoder.embed.0.weight (token embedding)
            out.append("embed_tok")
            i += 2
            continue
        if p == "feed_forward" or p == "feed_forward_macaron":
            out.append(p)
            if i + 1 < len(name) and name[i + 1] in ("w_1", "w_2"):
                out.append("Dense_0" if name[i + 1] == "w_1" else "Dense_1")
                i += 2
                continue
            i += 1
            continue
        if p == "ctc":
            out += ["ctc", "Dense_0"]
            i += 2  # skip the sequential index
            continue
        out.append(p)
        i += 1

    leaf = out[-1]
    parent = out[-2] if len(out) >= 2 else ""
    is_norm = parent.startswith("norm") or parent in ("after_norm",
                                                      "embed_norm") or \
        parent == "norm"
    is_batchnorm = parent == "norm" and len(out) >= 3 and \
        out[-3] == "conv_module"

    if leaf == "num_batches_tracked":
        return None  # torch bookkeeping, no flax equivalent
    if leaf == "running_mean":
        return ("batch_stats", tuple(out[:-1] + ["mean"]), arr)
    if leaf == "running_var":
        return ("batch_stats", tuple(out[:-1] + ["var"]), arr)

    if leaf == "weight":
        if parent == "embed_tok":
            return (coll, tuple(out[:-1] + ["embedding"]), arr)
        if is_norm:
            return (coll, tuple(out[:-1] + ["scale"]), arr)
        if arr.ndim == 2:   # Linear
            return (coll, tuple(out[:-1] + ["kernel"]), arr.T)
        if arr.ndim == 4:   # Conv2d
            return (coll, tuple(out[:-1] + ["kernel"]),
                    arr.transpose(2, 3, 1, 0))
        if arr.ndim == 3:   # Conv1d
            return (coll, tuple(out[:-1] + ["kernel"]),
                    arr.transpose(2, 1, 0))
        return (coll, tuple(out[:-1] + ["scale"]), arr)  # 1-D affine
    if leaf == "bias":
        return (coll, tuple(out), arr)
    # raw parameters (pos_bias_u/v, src_att_bias, alpha, ...)
    return (coll, tuple(out), arr)


def torch_to_flax(state_dict: Dict, strict: bool = True,
                  template=None) -> Dict:
    """Convert a reference torch state_dict (without the 'model.' prefix)
    into {'params': ..., 'batch_stats': ...} flax collections.

    With ``template`` (an initialized variables dict), shapes are validated
    and missing/unexpected keys raise when ``strict``.
    """
    flat: Dict[str, Dict[Tuple[str, ...], np.ndarray]] = {
        "params": {}, "batch_stats": {}}
    for k, v in state_dict.items():
        mapped = _map_leaf(tuple(k.split(".")), _to_numpy(v))
        if mapped is None:
            continue
        coll, path, arr = mapped
        flat[coll][path] = arr

    out = {c: unflatten_dict(d) for c, d in flat.items() if d}
    if template is not None:
        for coll in out:
            if coll not in template:
                continue
            want = flatten_dict(template[coll])
            got = flatten_dict(out[coll])
            missing = set(want) - set(got)
            extra = set(got) - set(want)
            if strict and (missing or extra):
                raise ValueError(
                    f"{coll}: missing={sorted('/'.join(m) for m in missing)} "
                    f"extra={sorted('/'.join(e) for e in extra)}")
            for path in want:
                if path in got and want[path].shape != got[path].shape:
                    raise ValueError(
                        f"shape mismatch at {'/'.join(path)}: "
                        f"{got[path].shape} vs {want[path].shape}")
    return out


def _lightning_state_to_flax(state: Dict, template=None,
                             prefer_ema: bool = True) -> Dict:
    """Prefix-split a Lightning state_dict (EMA preferred when present,
    reference decode_lighting.py:66-78) and convert to flax collections."""
    groups = split_lightning_state_dict(state)
    if "model" in groups:
        model_sd = groups["model"]
        if prefer_ema and "model_ema" in groups:
            ema = groups["model_ema"]
            # LitEma stores shadows keyed by name with '.' removed
            # (ema.py:25-30); remap onto the model's keys
            flat_names = {k.replace(".", ""): k for k in model_sd}
            for ema_key, v in ema.items():
                if ema_key in flat_names:
                    model_sd[flat_names[ema_key]] = v
        state = model_sd
    return torch_to_flax(state, template=template)


def load_reference_checkpoint(ckpt_path: str, template=None,
                              prefer_ema: bool = True) -> Dict:
    """Load a reference Lightning .ckpt (or bare state_dict .pt) into flax
    collections."""
    import torch
    blob = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state = blob.get("state_dict", blob)
    return _lightning_state_to_flax(state, template=template,
                                    prefer_ema=prefer_ema)


def average_reference_checkpoints(path: str, ids: str = "best",
                                  num: int = 10):
    """Average every ``*.ckpt`` under ``path`` with the reference's own
    selection semantics (average_checkpoints.py:7-38): filename sort,
    reversed for ``ids='last'`` (so ``last-step-*`` names win over
    ``best-val-*`` in a mixed Lightning output dir), first ``num`` summed
    then divided (integer tensors use ``//``).  Divides by the number of
    checkpoints actually found (the reference divides by ``num`` even when
    fewer exist — a latent bug not reproduced).

    Returns ``(state_dict, chosen_filenames)``.
    """
    import torch
    names = sorted((n for n in os.listdir(path) if n.endswith(".ckpt")),
                   reverse=(ids == "last"))
    choose = names[:num]
    if not choose:
        raise FileNotFoundError(f"no .ckpt files under {path}")
    avg = None
    for name in choose:
        blob = torch.load(os.path.join(path, name), map_location="cpu",
                          weights_only=False)
        states = blob.get("state_dict", blob)
        if avg is None:
            avg = {k: v.clone() if torch.is_tensor(v) else v
                   for k, v in states.items()}
        else:
            for k in avg:
                avg[k] += states[k]
    k_eff = len(choose)
    for k in avg:
        if torch.is_tensor(avg[k]) and not torch.is_floating_point(avg[k]):
            avg[k] //= k_eff
        else:
            avg[k] /= k_eff
    return avg, choose


def load_reference_averaged_params(model_path: str, choose: str = "best",
                                   avg: int = 10, template=None,
                                   prefer_ema: bool = True):
    """Decode weights from reference Lightning artifacts: a single
    ``.ckpt``/``.pt`` file, or a directory of ``.ckpt`` files (averaged
    with reference semantics).  Returns ``(params, batch_stats)`` matching
    ``lasr_tpu.train.trainer.load_averaged_params``."""
    if os.path.isfile(model_path):
        variables = load_reference_checkpoint(model_path, template=template,
                                              prefer_ema=prefer_ema)
    else:
        state, chosen = average_reference_checkpoints(model_path, ids=choose,
                                                      num=avg)
        logging.info("averaged reference checkpoints: %s", chosen)
        variables = _lightning_state_to_flax(state, template=template,
                                             prefer_ema=prefer_ema)
    return variables.get("params", {}), variables.get("batch_stats", {})


def is_reference_checkpoint_path(model_path: str) -> bool:
    """True when ``model_path`` points at reference Lightning artifacts
    (a ``.ckpt``/``.pt`` file or a directory containing ``.ckpt`` files)
    rather than an orbax checkpoints root."""
    if os.path.isfile(model_path):
        return model_path.endswith((".ckpt", ".pt", ".pth"))
    if os.path.isdir(model_path):
        try:
            return any(n.endswith(".ckpt") for n in os.listdir(model_path))
        except OSError:
            return False
    return False
