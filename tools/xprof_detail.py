"""Fine-grained op attribution for the train step: per-HLO-op durations
with their metadata (source op names), so copies/fusions can be traced
back to model code. Run: python tools/xprof_detail.py [--iters 5]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xprof_ops import build_step  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=60)
    ap.add_argument("--cat", default=None,
                    help="only ops in this hlo_category (e.g. 'data formatting')")
    args = ap.parse_args()

    import jax
    trainer, state, batch = build_step()
    for _ in range(2):
        state, metrics = trainer.train_step(state, batch)
    float(jax.device_get(metrics["loss_main"]))

    tdir = tempfile.mkdtemp(prefix="xprofd_")
    with jax.profiler.trace(tdir):
        for _ in range(args.iters):
            state, metrics = trainer.train_step(state, batch)
        float(jax.device_get(metrics["loss_main"]))

    paths = glob.glob(os.path.join(
        tdir, "plugins", "profile", "*", "*.trace.json.gz"))
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    name_by_pid = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name_by_pid[e["pid"]] = e["args"].get("name", "")

    op_time = defaultdict(float)
    op_count = defaultdict(int)
    op_meta = {}
    total = 0.0
    printed_example = False
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = name_by_pid.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        a = e.get("args", {})
        hc = a.get("hlo_category", "")
        if not hc:
            continue
        if not printed_example:
            print("example event args:", json.dumps(a)[:600], "\n")
            printed_example = True
        if args.cat and args.cat not in hc:
            continue
        name = e.get("name", "")
        op_time[name] += e.get("dur", 0) / 1000.0
        op_count[name] += 1
        if name not in op_meta:
            op_meta[name] = {k: str(v)[:140] for k, v in a.items()}
        total += e.get("dur", 0) / 1000.0

    rows = sorted(op_time.items(), key=lambda kv: -kv[1])
    print(f"total (filtered) {total/args.iters:.2f} ms/step")
    for name, t in rows[: args.top]:
        m = op_meta[name]
        src = m.get("long_name") or m.get("tf_op") or ""
        print(f"{t/args.iters:8.3f} ms {op_count[name]:6d}x  {name[:60]:60s} "
              f"{m.get('hlo_category','')[:20]:20s} {src[:200]}")


if __name__ == "__main__":
    main()
