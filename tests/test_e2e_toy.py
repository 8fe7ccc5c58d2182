"""End-to-end smoke: toy recipe train → checkpoint → averaged decode → WER.

This is BASELINE.json configs[0]: the CPU-runnable 10-utt pipeline through
the real CLIs (bin/train.py, bin/decode.py) — config parsing, tokenizer
injection, on-device frontend, fit loop, orbax checkpointing, checkpoint
averaging, batched beam decode, WER report.
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOY = os.path.join(REPO, "example", "asr_toy")


@pytest.mark.slow
def test_toy_recipe_end_to_end(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    workdir = tmp_path / "asr_toy"
    shutil.copytree(TOY, workdir)
    subprocess.run([sys.executable, "gen_data.py"], cwd=workdir, env=env,
                   check=True)

    exp = workdir / "exp"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "train.py"),
         "-config", "conf/config.yaml", "-exp_dir", str(exp),
         "-num_epochs", "8", "-num_devices", "2", "-ema", "1",
         "-log_interval", "5", "-num_workers", "2"],
        cwd=workdir, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-4000:]
    assert (exp / "hparams.yaml").exists()
    assert (exp / "metrics.jsonl").exists()
    assert (exp / "checkpoints" / "last").exists()

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", "decode.py"),
         "-train_config", str(exp / "hparams.yaml"),
         "-decode_config", "conf/decode.yaml",
         "-model_path", str(exp / "checkpoints"),
         "-avg", "2", "-choose", "last",
         "-output_file", str(exp / "decode.txt")],
        cwd=workdir, env=env, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-4000:]
    assert "Totol WER is" in r.stdout
    assert (exp / "decode.txt").exists()
    # 4 dev utterances decoded
    lines = (exp / "decode.txt").read_text().strip().split("\n")
    assert len(lines) == 4
