"""Op-level profile of the production train step on the real chip.

Captures a device trace with jax.profiler and aggregates per-op durations
from the perfetto trace json, so we can see exactly where the step time
goes (fusion names carry the originating HLO ops). Run:

    python tools/xprof_ops.py [--remat-attend N] [--pos-dropout-mode M]
"""

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(remat_attend=1, pos_dropout_mode="table"):
    from lasr_tpu.utils.env import respect_jax_platforms_env
    respect_jax_platforms_env()
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_prng_impl", "rbg")

    from lasr_tpu.data.frontend import DeviceFrontend
    from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC
    from lasr_tpu.models.losses import E2E_Loss
    from lasr_tpu.parallel.mesh import make_mesh
    from lasr_tpu.train.optimizer import Noam
    from lasr_tpu.train.trainer import Trainer

    odim = 5000
    model = E2E_Conformer_CTC(
        idim=80, odim=odim,
        encoder_attention_dim=320, encoder_attention_heads=8,
        encoder_linear_units=2048, encoder_num_blocks=12,
        decoder_attention_dim=320, decoder_attention_heads=8,
        decoder_linear_units=2048, decoder_num_block=6,
        encoder_pos_enc_layer_type="rel_pos",
        encoder_selfattention_layer_type="rel_selfattn",
        encoder_remat_attend=remat_attend,
        encoder_pos_dropout_mode=pos_dropout_mode,
        dtype=jnp.bfloat16)
    criterion = E2E_Loss(size=odim, padding_idx=-1, smoothing=0.1, rate=0.3)
    frontend = DeviceFrontend(["norm", "fbank:80", "specaug"])
    noam = Noam(model_size=320, factor=3.0, warm_step=25000)
    mesh = make_mesh(data=1, devices=jax.devices()[:1])
    trainer = Trainer(model, criterion, noam.make(), frontend, mesh=mesh,
                      log_interval=10**9)

    B, secs, L = 32, 15.6, 64
    S = int(secs * 16000)
    rng = np.random.default_rng(0)
    batch = {
        "wav_array": (0.1 * rng.standard_normal((B, S))).astype(np.float32),
        "wav_len": np.full((B,), S, np.int32),
        "token_id": rng.integers(6, odim, (B, L)).astype(np.int32),
        "token_len": np.full((B,), L, np.int32),
        "n_utts": B,
    }
    state = trainer.init_state(batch)
    batch = {k: (jax.device_put(jnp.asarray(v))
                 if isinstance(v, np.ndarray) else v)
             for k, v in batch.items()}
    return trainer, state, batch


def aggregate(trace_dir):
    paths = glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace files under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find TPU op-level track pids (XLA Ops / XLA TPU threads)
    name_by_pid = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name_by_pid[e["pid"]] = e["args"].get("name", "")
    op_time = defaultdict(float)
    op_count = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = name_by_pid.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        # keep only leaf op tracks (XLA Ops), skip module/step lines
        tname = e.get("tid")
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1000.0  # ms
        args = e.get("args", {})
        hlo_cat = args.get("hlo_category", "")
        if not hlo_cat:
            continue
        key = f"{hlo_cat:24s} {simplify(name)}"
        op_time[key] += dur
        op_count[key] += 1
        total += dur
    return op_time, op_count, total


def simplify(name):
    name = re.sub(r"\.\d+", "", name)
    name = re.sub(r"fusion", "fusion", name)
    return name[:90]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--remat-attend", type=int, default=1)
    ap.add_argument("--pos-dropout-mode", default="table")
    args = ap.parse_args()

    import jax
    trainer, state, batch = build_step(args.remat_attend,
                                       args.pos_dropout_mode)
    # warmup/compile
    for _ in range(2):
        state, metrics = trainer.train_step(state, batch)
    float(jax.device_get(metrics["loss_main"]))

    tdir = tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(tdir):
        for _ in range(args.iters):
            state, metrics = trainer.train_step(state, batch)
        float(jax.device_get(metrics["loss_main"]))

    op_time, op_count, total = aggregate(tdir)
    rows = sorted(op_time.items(), key=lambda kv: -kv[1])
    print(f"total device op time: {total:.1f} ms over {args.iters} steps "
          f"=> {total/args.iters:.1f} ms/step")
    print(f"{'ms/step':>9} {'%':>5} {'count':>6}  op")
    for k, v in rows[: args.top]:
        print(f"{v/args.iters:9.2f} {100*v/total:5.1f} {op_count[k]:6d}  {k}")
    # category rollup
    cat = defaultdict(float)
    for k, v in op_time.items():
        cat[k.split()[0]] += v
    print("\ncategory rollup (ms/step):")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1]):
        print(f"  {k:28s} {v/args.iters:9.2f}  {100*v/total:5.1f}%")


if __name__ == "__main__":
    main()
