"""Worker process for the true multi-process jax.distributed tests.

Launched by tests/test_multiprocess.py with JAX_PLATFORMS=cpu and
--xla_force_host_platform_device_count, one process per simulated host.
Runs the REAL Trainer over a global (cross-process) mesh: per-host scp
shards, cross-host shape agreement, make_array_from_process_local_data
batch assembly, orbax multi-host checkpointing, mid-epoch kill + resume.

On success writes <result>.npz with the final step count and parameters.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--root", required=True)
    ap.add_argument("--exp", required=True)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--kill-after", type=int, default=-1)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--result", required=True)
    args = ap.parse_args()

    from lasr_tpu.utils.env import respect_jax_platforms_env
    respect_jax_platforms_env()
    import jax
    jax.distributed.initialize(coordinator_address=args.coord,
                               num_processes=args.nprocs,
                               process_id=args.pid)
    import numpy as np
    import jax.numpy as jnp  # noqa: F401

    from lasr_tpu.data.dataset import BatchAudioDataSet
    from lasr_tpu.data.frontend import DeviceFrontend
    from lasr_tpu.data.tokenizer import CharTokenizer
    from lasr_tpu.models.e2e_ctc_att import E2E_Transformer_CTC
    from lasr_tpu.models.losses import E2E_Loss
    from lasr_tpu.parallel.mesh import make_mesh
    from lasr_tpu.train.optimizer import Adam, WarmupScheduler
    from lasr_tpu.train.trainer import Trainer

    assert jax.process_count() == args.nprocs, jax.process_count()
    local = len(jax.local_devices())

    tok = CharTokenizer(os.path.join(args.root, "dict.txt"))
    ds = BatchAudioDataSet(
        wav_list=os.path.join(args.root, "wav.scp"),
        text_list=os.path.join(args.root, "text"),
        tokenizer=tok,
        audio_trans=["soxspeed", "norm", "fbank:80", "specaug"],
        batch_type="size", batch_size=4, min_duration=0.0, text_freq=0.0,
        batch_pad_multiple=local)
    ds.load_check_data()

    model = E2E_Transformer_CTC(
        idim=80, odim=tok.dict_size(),
        encoder_attention_dim=32, encoder_attention_heads=2,
        encoder_linear_units=64, encoder_num_blocks=1,
        decoder_attention_dim=32, decoder_attention_heads=2,
        decoder_linear_units=64, decoder_num_block=1,
        encoder_dropout_rate=0.0, decoder_dropout_rate=0.0, ctc_dropout=0.0)
    crit = E2E_Loss(size=tok.dict_size(), padding_idx=-1, smoothing=0.1,
                    rate=0.3)
    sched = WarmupScheduler(model_size=32, factor=1.0, warm_step=20)
    fe = DeviceFrontend(["norm", "fbank:80", "specaug"])
    mesh = make_mesh(data=args.nprocs * local)
    trainer = Trainer(model, crit, Adam(betas=(0.9, 0.98)).make(sched), fe,
                      tokenizer=tok, exp_dir=args.exp, schedule=sched,
                      mesh=mesh, log_interval=100)

    # a host-local sample batch shapes the init (replicated params)
    sample = next(iter(ds.batches(num_workers=1, process_index=args.pid,
                                  process_count=args.nprocs)))
    state = trainer.init_state(sample)

    from tests.helpers import KillAfter
    fit_ds = ds if args.kill_after < 0 else KillAfter(ds, args.kill_after)
    try:
        state = trainer.fit(
            state, fit_ds, valid_dataset=ds, num_epochs=args.epochs,
            num_workers=1, checkpoint_interval_steps=1,
            auto_resume=args.resume)
    except RuntimeError as e:
        if "simulated preemption" not in str(e):
            raise
        trainer.finalize_checkpoints()
        with open(args.result + f".killed{args.pid}", "w") as f:
            json.dump({"killed_at": fit_ds.count}, f)
        return

    step = int(jax.device_get(state.step))
    leaves = {f"p{i}": np.asarray(jax.device_get(x), np.float32)
              for i, x in enumerate(jax.tree.leaves(state.params))}
    np.savez(args.result + f".{args.pid}.npz", step=step, **leaves)


if __name__ == "__main__":
    main()
