"""True multi-process data parallelism: 2 CPU processes x 2 devices via
jax.distributed (VERDICT round-1 item 7 — the 8-device single-process mesh
cannot exercise cross-host batch assembly, shape agreement, or orbax
multi-host checkpointing).

Covers:
  - straight 2-process training runs and both processes agree on the
    final (replicated) parameters;
  - kill both processes mid-epoch, auto-resume, and the final parameters
    equal the never-killed run's exactly (deterministic resharding).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _make_corpus(root):
    from lasr_tpu.data.reader import write_wav
    rng = np.random.default_rng(0)
    words = ["GO", "STOP"]
    scp, txt = [], []
    for i in range(16):
        n = int(rng.uniform(0.5, 0.8) * 16000)
        t = np.arange(n) / 16000.0
        wav = (0.3 * np.sin(2 * np.pi * (200 + 30 * i) * t)
               + 0.03 * rng.standard_normal(n))
        p = root / f"u{i:02d}.wav"
        write_wav(str(p), wav.astype(np.float32), 16000)
        scp.append(f"u{i:02d} {p}")
        txt.append(f"u{i:02d} {words[i % 2]}")
    (root / "wav.scp").write_text("\n".join(scp) + "\n")
    (root / "text").write_text("\n".join(txt) + "\n")
    (root / "dict.txt").write_text("\n".join(sorted(set("GOSTP"))) + "\n")


def _run_pair(root, exp, result, epochs=2, kill_after=-1, resume=False,
              timeout=600):
    port = _free_port()
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               PYTHONPATH=REPO)
    env.pop("JAX_NUM_PROCESSES", None)
    procs = []
    for pid in range(2):
        cmd = [sys.executable, WORKER, "--coord", f"127.0.0.1:{port}",
               "--nprocs", "2", "--pid", str(pid), "--root", str(root),
               "--exp", str(exp), "--epochs", str(epochs),
               "--kill-after", str(kill_after), "--result", str(result)]
        if resume:
            cmd.append("--resume")
        procs.append(subprocess.Popen(cmd, env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out.decode(errors="replace"))
    return [p.returncode for p in procs], outs


def _load(result, pid):
    d = np.load(f"{result}.{pid}.npz")
    return int(d["step"]), {k: d[k] for k in d.files if k != "step"}


def test_two_process_train_and_kill_resume(tmp_path):
    root = tmp_path / "corpus"
    root.mkdir()
    _make_corpus(root)

    # straight run
    resA = tmp_path / "resA"
    codes, outs = _run_pair(root, tmp_path / "expA", resA)
    assert codes == [0, 0], outs[0][-3000:] + outs[1][-3000:]
    stepA0, paramsA0 = _load(resA, 0)
    stepA1, paramsA1 = _load(resA, 1)
    assert stepA0 == stepA1 > 0
    for k in paramsA0:
        np.testing.assert_array_equal(paramsA0[k], paramsA1[k])

    # killed mid-epoch-1 on both processes, then auto-resumed
    resB = tmp_path / "resB"
    codes, outs = _run_pair(root, tmp_path / "expB", resB, kill_after=3)
    assert codes == [0, 0], outs[0][-3000:] + outs[1][-3000:]
    assert os.path.exists(f"{resB}.killed0")

    codes, outs = _run_pair(root, tmp_path / "expB", resB, resume=True)
    assert codes == [0, 0], outs[0][-3000:] + outs[1][-3000:]
    stepB, paramsB = _load(resB, 0)
    assert stepB == stepA0
    for k in paramsA0:
        np.testing.assert_allclose(paramsB[k], paramsA0[k],
                                   atol=1e-6, rtol=1e-6)
