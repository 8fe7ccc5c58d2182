"""Training CLI — TPU-native replacement for ``bin/train_lighting.py``.

Same flag surface as the reference (train_lighting.py:130-144):
``-exp_dir -config -num_epochs -fp16 -ema -acc_grads -resume_ckpt`` (the
``-num_gpu`` knob becomes ``-num_devices``: size of the mesh data axis).
Same YAML schema: model_config / opti_config(+scheduler) / criterion_config /
tokenizer_config / train_data_config / valid_data_config, each a
``{name, kwargs}`` block, with odim/size/padding_idx injected from the
tokenizer (train_lighting.py:162-168).
"""

import argparse
import logging
import sys
import time

import yaml

_PROC_T0 = time.time()


def _has_checkpoint(exp_dir: str) -> bool:
    """True if exp_dir holds at least one saved 'last' checkpoint step."""
    import os
    last = os.path.join(exp_dir, "checkpoints", "last")
    try:
        return any(name.isdigit() for name in os.listdir(last))
    except OSError:
        return False


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-exp_dir", default="exp", type=str)
    parser.add_argument("-config", required=True)
    parser.add_argument("-num_devices", default=-1, type=int,
                        help="mesh data-axis size; -1 = all local devices")
    parser.add_argument("-model_parallel", default=1, type=int,
                        help="mesh model-axis size (tensor parallelism; "
                             "params partition per parallel/sharding.py)")
    parser.add_argument("-seq_parallel", default=1, type=int,
                        help="mesh seq-axis size (sequence parallelism: "
                             "encoder activations shard their time dim — "
                             "stretch-config memory scaling)")
    parser.add_argument("-pipeline_parallel", default=1, type=int,
                        help="mesh pipe-axis size (GPipe pipeline "
                             "parallelism: encoder blocks stage-stack and "
                             "shard over 'pipe'; sets the model's "
                             "encoder_pipeline_stages unless the YAML "
                             "already does)")
    parser.add_argument("-fsdp", default=0, type=int,
                        help="1 = FSDP/ZeRO: shard params + optimizer "
                             "moments + grad accumulator over the data "
                             "axis (parallel/sharding.py)")
    parser.add_argument("-num_epochs", default=50, type=int)
    parser.add_argument("-fp16", default=32, type=int,
                        help="32 = float32 compute; 16 = bfloat16 compute")
    parser.add_argument("-ema", default=0, type=int,
                        help="1 = keep an EMA shadow of the params")
    parser.add_argument("-acc_grads", default=1, type=int)
    parser.add_argument("-resume_ckpt", default=None, type=str)
    parser.add_argument("-auto_resume", default=1, type=int,
                        help="restore the newest checkpoint in exp_dir and "
                             "continue at the exact epoch/batch (preemption "
                             "recovery; 0 disables)")
    parser.add_argument("-checkpoint_interval_steps", default=0, type=int,
                        help="additionally checkpoint mid-epoch every N "
                             "steps (0 = per-epoch only)")
    parser.add_argument("-valid_interval_epochs", default=1, type=int,
                        help="run validation every N epochs (always on the "
                             "final epoch); Lightning check_val_every_n_epoch")
    parser.add_argument("-checkpoint_interval_epochs", default=1, type=int,
                        help="save the per-epoch checkpoint every N epochs "
                             "(always on the final epoch)")
    parser.add_argument("-max_wall_secs", default=0, type=float,
                        help="checkpoint and exit cleanly once the process "
                             "is this old (0 = off) — for hosts whose "
                             "accelerator attachment bounds client "
                             "lifetime; pair with -auto_resume")
    parser.add_argument("-num_workers", default=8, type=int)
    parser.add_argument("-seed", default=0, type=int)
    parser.add_argument("-log_interval", default=50, type=int)
    parser.add_argument("-fast_rng", default=1, type=int,
                        help="1: hardware RngBitGenerator for dropout "
                             "(~15%% faster steps on TPU); 0: threefry")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")

    from lasr_tpu.utils.env import (enable_compilation_cache,
                                    respect_jax_platforms_env)
    respect_jax_platforms_env()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    if args.fast_rng:
        jax.config.update("jax_default_prng_impl", "rbg")

    from lasr_tpu.data.frontend import DeviceFrontend
    from lasr_tpu.parallel.mesh import make_mesh
    from lasr_tpu.train.optimizer import build_optimizer
    from lasr_tpu.train.trainer import Trainer
    from lasr_tpu.utils.registry import BaseConfig

    with open(args.config) as f:
        config = yaml.safe_load(f)

    train_data_config = config["train_data_config"]
    valid_data_config = config["valid_data_config"]
    model_config = config["model_config"]
    opt_config = config["opti_config"]
    criterion_config = config["criterion_config"]
    tokenizer_config = config["tokenizer_config"]

    tokenizer = BaseConfig(**tokenizer_config).generateExample()

    mp, sp, pp = args.model_parallel, args.seq_parallel, args.pipeline_parallel
    n_dev = (len(jax.devices()) // (mp * sp * pp) if args.num_devices < 0
             else args.num_devices)
    if n_dev < 1:
        raise SystemExit(
            f"model_parallel*seq_parallel*pipeline_parallel = {mp * sp * pp} "
            f"exceeds the {len(jax.devices())} available devices (data axis "
            f"would be {n_dev})")
    mesh = make_mesh(data=n_dev, model=mp, seq=sp, pipe=pp,
                     devices=jax.devices()[:n_dev * mp * sp * pp])
    if pp > 1:
        # stage-stack the encoder unless the YAML already configured it
        # (Trainer validates stages % pipe == 0 either way)
        model_config["kwargs"].setdefault("encoder_pipeline_stages", pp)

    # batch dim must divide over the mesh data axis
    for dc in (train_data_config, valid_data_config):
        dc.setdefault("kwargs", {}).setdefault("batch_pad_multiple", n_dev)
    train_dataset = BaseConfig(**train_data_config).generateExample(
        tokenizer=tokenizer)
    valid_dataset = BaseConfig(**valid_data_config).generateExample(
        tokenizer=tokenizer)

    output_dim = tokenizer.dict_size()
    if "odim" in model_config["kwargs"]:
        model_config["kwargs"]["odim"] = output_dim
    if "size" in criterion_config["kwargs"]:
        criterion_config["kwargs"]["size"] = output_dim
    if "padding_idx" in criterion_config["kwargs"]:
        criterion_config["kwargs"]["padding_idx"] = tokenizer.ID_VALUE_IGNORE

    dtype = jnp.bfloat16 if args.fp16 == 16 else jnp.float32
    model = BaseConfig(**model_config).generateExample(dtype=dtype)
    criterion = BaseConfig(**criterion_config).generateExample()
    optimizer_tx, schedule = build_optimizer(opt_config)

    frontend = DeviceFrontend(train_dataset.audio_trans)

    trainer = Trainer(
        model, criterion, optimizer_tx, frontend, tokenizer=tokenizer,
        exp_dir=args.exp_dir, schedule=schedule, mesh=mesh,
        use_ema=args.ema == 1, acc_grads=args.acc_grads, seed=args.seed,
        log_interval=args.log_interval, partition_params=mp > 1,
        fsdp_params=args.fsdp == 1)

    logging.info("loading + checking data")
    train_dataset.load_check_data()
    valid_dataset.load_check_data()
    logging.info("train batches: %d, valid batches: %d",
                 len(train_dataset.batch_indices()),
                 len(valid_dataset.batch_indices()))

    sample = next(iter(train_dataset.batches(num_workers=1)))
    # when an auto-resume restore is guaranteed, build the restore target
    # abstractly — skips executing a throwaway on-device init that the
    # restore would immediately overwrite (and its first-dispatch cost)
    will_restore = bool(args.auto_resume) and not args.resume_ckpt and \
        _has_checkpoint(args.exp_dir)
    state = (trainer.init_state_abstract(sample) if will_restore
             else trainer.init_state(sample))
    logging.info("model parameters: %.2fM", trainer.param_count(state) / 1e6)

    trainer.save_hparams({
        "model_config": model_config,
        "criterion_config": criterion_config,
        "optim_config": opt_config,
        "tokenizer_config": tokenizer_config,
    })

    if args.resume_ckpt:
        state = trainer.restore_checkpoint(state, path=args.resume_ckpt)
        logging.info("resumed from %s at step %d", args.resume_ckpt,
                     int(state.step))

    state = trainer.fit(state, train_dataset, valid_dataset,
                        num_epochs=args.num_epochs,
                        num_workers=args.num_workers,
                        auto_resume=bool(args.auto_resume)
                        and not args.resume_ckpt,
                        checkpoint_interval_steps=
                        args.checkpoint_interval_steps,
                        valid_interval_epochs=args.valid_interval_epochs,
                        checkpoint_interval_epochs=
                        args.checkpoint_interval_epochs,
                        max_wall_secs=args.max_wall_secs,
                        wall_t0=_PROC_T0)
    logging.info("done at step %d", int(state.step))
    return 0


if __name__ == "__main__":
    sys.exit(main())
