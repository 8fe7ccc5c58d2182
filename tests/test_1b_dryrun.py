"""1B stretch config EXECUTES (VERDICT round-3 item 4): real Trainer
steps of example/pretrain_1b/conf/config.yaml on the 8-device virtual CPU
mesh (dp4 x fsdp x tp2), finite loss, checkpoint save/restore round-trip
with sharding re-established.  Round 3 had only ever `eval_shape`d it."""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import yaml

from lasr_tpu.data.frontend import DeviceFrontend
from lasr_tpu.models.losses import E2E_Loss
from lasr_tpu.parallel.mesh import make_mesh
from lasr_tpu.train.optimizer import Adam, WarmupScheduler
from lasr_tpu.train.trainer import Trainer
from lasr_tpu.utils.registry import BaseConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_1b_stretch_executes_and_roundtrips(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    cfg = yaml.safe_load(open(os.path.join(
        REPO, "example", "pretrain_1b", "conf", "config.yaml")))
    mk = cfg["model_config"]["kwargs"]
    mk["odim"] = 50000
    # bf16 compute (the config's documented -fp16 16 deployment mode);
    # master params/opt state stay f32
    mk["dtype"] = jnp.bfloat16
    model = BaseConfig(**cfg["model_config"]).generateExample()

    crit = E2E_Loss(size=50000, padding_idx=-1, smoothing=0.1, rate=0.3)
    sk = cfg["opti_config"]["scheduler"]["kwargs"]
    sched = WarmupScheduler(**sk)
    tx = Adam(betas=(0.9, 0.98)).make(sched)
    fe = DeviceFrontend(["norm", "fbank:80"])
    # dp2 x tp4: on the virtual CPU mesh all 8 "devices" share one
    # address space, so the FSDP all-gather materializes 8 per-device
    # param copies — TP-4 cuts each to a quarter (a dp4 x tp2 run peaked
    # past 96 GB host RSS and had to be killed)
    mesh = make_mesh(data=2, model=4)
    tr = Trainer(model, crit, tx, fe, exp_dir=str(tmp_path / "exp1b"),
                 schedule=sched, mesh=mesh, partition_params=True,
                 fsdp_params=True, fsdp_min_size=0, log_interval=100)

    rng = np.random.default_rng(0)
    B, S, L = 2, 16000, 4
    batch = {
        "wav_array": (0.1 * rng.standard_normal((B, S))).astype(np.float32),
        "wav_len": np.full((B,), S, np.int32),
        "token_id": rng.integers(6, 50000, (B, L)).astype(np.int32),
        "token_len": np.full((B,), L, np.int32),
        "n_utts": B,
    }
    t0 = time.time()
    state = tr.init_state(batch)
    init_s = time.time() - t0
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(state.params))
    assert 0.9e9 < n_params < 1.4e9, f"param count {n_params/1e9:.2f}B"

    from jax.sharding import PartitionSpec as P
    k = state.params["encoder"]["layers_0"]["feed_forward"]["Dense_0"]["kernel"]
    assert k.sharding.spec == P("data", "model")

    t0 = time.time()
    state, m = tr.train_step(state, batch)
    compile_s = time.time() - t0
    t0 = time.time()
    state, m = tr.train_step(state, batch)
    jax.block_until_ready(m["loss_main"])
    step_s = time.time() - t0
    assert np.isfinite(float(m["loss_main"]))

    t0 = time.time()
    tr.save_checkpoint(state, {"loss_main": float(m["loss_main"])})
    save_s = time.time() - t0
    state2 = tr.init_state(batch)
    state2 = tr.restore_checkpoint(state2)
    k2 = state2.params["encoder"]["layers_0"]["feed_forward"]["Dense_0"]["kernel"]
    assert k2.sharding.spec == P("data", "model")
    state2, m2 = tr.train_step(state2, batch)
    assert np.isfinite(float(m2["loss_main"]))

    # per-device estimate: f32 params + 2 Adam moments + f32 grad
    # accumulator, sharded over all 8 devices by FSDP+TP
    gb = n_params * 4 * 4 / 8 / 2 ** 30
    print(json.dumps({"metric": "1b_dryrun", "params_b": round(n_params / 1e9, 3),
                      "init_s": round(init_s, 1),
                      "first_step_s": round(compile_s, 1),
                      "step_s": round(step_s, 1),
                      "ckpt_save_s": round(save_s, 1),
                      "est_state_gb_per_device": round(gb, 2),
                      "mesh": "dp2 x tp4 + FSDP",
                      "loss": float(m["loss_main"])}), flush=True)
