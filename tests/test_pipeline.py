"""Pipeline parallelism (modules/pipeline.py): the GPipe tick schedule
must compute exactly what the plain layer stack computes, forward and
backward, and train on a (data, pipe) mesh with stage-sharded params.

The reference has no pipeline story (DP-only, SURVEY.md §2.8); these
tests pin the beyond-reference scale-out axis the same way the TP/SP/FSDP
tests do — numerics against the unpipelined single-device run.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lasr_tpu.modules.conformer import ConformerEncoder
from lasr_tpu.modules.pipeline import (pick_microbatches,
                                       pipeline_variables_from_scan)

# positional_dropout_rate=0 so the train-mode backward test can compare
# against a per-microbatch reference: the embed dropout runs on the full
# batch BEFORE the pipelined stack, and a dropout mask depends on the
# array shape — a (B,...) mask's leading rows equal a (mb,...) mask only
# for microbatch 0 (counter-based PRNG), so any live pre-stack dropout
# makes the per-microbatch reference see different noise, not a bug.
KW = dict(idim=20, attention_dim=16, attention_heads=2, linear_units=32,
          num_blocks=4, cnn_module_kernel=7,
          pos_enc_layer_type="rel_pos", positional_dropout_rate=0.0,
          selfattention_layer_type="rel_selfattn")


def _data(B=8, T=32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, T, 20)), jnp.float32)
    xl = jnp.asarray(rng.integers(T // 2, T + 1, (B,)), jnp.int32)
    return x, xl


def test_tapconv1d_matches_nn_conv():
    """TapConv1d (the matmul-form conv the pipelined stack uses because
    the SPMD partitioner miscompiles lax.conv under a sharded stage vmap —
    tools/spmd_conv_repro.py) is param-tree AND numerics compatible with
    nn.Conv, dense and depthwise."""
    from flax import linen as nn
    from lasr_tpu.modules.convops import TapConv1d
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((3, 20, 8)), jnp.float32)
    for feat, k, groups in [(16, 1, 1), (16, 5, 1), (8, 7, 8)]:
        pad = (k - 1) // 2
        ref = nn.Conv(feat, (k,), padding=[(pad, pad)],
                      feature_group_count=groups)
        tap = TapConv1d(feat, k, padding=[(pad, pad)],
                        feature_group_count=groups)
        v = ref.init(jax.random.PRNGKey(3), x)
        v["params"]["kernel"] = jnp.asarray(
            rng.standard_normal(v["params"]["kernel"].shape), jnp.float32)
        v["params"]["bias"] = jnp.asarray(
            rng.standard_normal(v["params"]["bias"].shape), jnp.float32)
        vt = tap.init(jax.random.PRNGKey(3), x)
        assert jax.tree.map(jnp.shape, vt) == jax.tree.map(jnp.shape, v)
        np.testing.assert_allclose(
            np.asarray(ref.apply(v, x)), np.asarray(tap.apply(v, x)),
            rtol=1e-5, atol=1e-5, err_msg=f"feat={feat} k={k} g={groups}")


def test_pick_microbatches():
    assert pick_microbatches(8, 4) == 4
    assert pick_microbatches(8, 5) == 4
    assert pick_microbatches(6, 4) == 3
    assert pick_microbatches(7, 4) == 1    # prime batch
    assert pick_microbatches(1, 8) == 1
    assert pick_microbatches(8, 100) == 8


def test_pipeline_forward_matches_scan_eval():
    """Eval forward: pipelined == scan_layers on reshaped params."""
    x, xl = _data()
    scan_enc = ConformerEncoder(**KW, dropout_rate=0.1, scan_layers=True)
    pipe_enc = ConformerEncoder(**KW, dropout_rate=0.1, pipeline_stages=2,
                                pipeline_microbatches=4)
    vs = scan_enc.init(jax.random.PRNGKey(0), x, xl)
    vp = pipeline_variables_from_scan(vs, stages=2)
    h_s, l_s = scan_enc.apply(vs, x, xl, deterministic=True)
    h_p, l_p = pipe_enc.apply(vp, x, xl, deterministic=True)
    np.testing.assert_array_equal(np.asarray(l_s), np.asarray(l_p))
    np.testing.assert_allclose(np.asarray(h_s), np.asarray(h_p),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_forward_microbatch_clamp():
    """A batch the configured M does not divide still works (M clamps to
    a divisor; B=6 with M=4 -> 3)."""
    x, xl = _data(B=6)
    scan_enc = ConformerEncoder(**KW, dropout_rate=0.0, scan_layers=True)
    pipe_enc = ConformerEncoder(**KW, dropout_rate=0.0, pipeline_stages=4,
                                pipeline_microbatches=4)
    vs = scan_enc.init(jax.random.PRNGKey(1), x, xl)
    vp = pipeline_variables_from_scan(vs, stages=4)
    h_s, _ = scan_enc.apply(vs, x, xl, deterministic=True)
    h_p, _ = pipe_enc.apply(vp, x, xl, deterministic=True)
    np.testing.assert_allclose(np.asarray(h_s), np.asarray(h_p),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_backward_matches_microbatched():
    """Train-mode loss AND parameter gradients match the unpipelined
    stack run per microbatch (BatchNorm normalizes per microbatch in both;
    dropout off so the schedules are comparable)."""
    B, M, P = 8, 4, 2
    x, xl = _data(B=B)
    scan_enc = ConformerEncoder(**KW, dropout_rate=0.0, scan_layers=True)
    pipe_enc = ConformerEncoder(**KW, dropout_rate=0.0, pipeline_stages=P,
                                pipeline_microbatches=M)
    vs = scan_enc.init(jax.random.PRNGKey(2), x, xl)
    stats_s = {"batch_stats": vs["batch_stats"]}
    vp = pipeline_variables_from_scan(vs, stages=P)
    stats_p = {"batch_stats": vp["batch_stats"]}
    mb = B // M

    def loss_scan(params):
        tot = 0.0
        for k in range(M):
            sl = slice(k * mb, (k + 1) * mb)
            (h, _), _ = scan_enc.apply(
                {"params": params, **stats_s}, x[sl], xl[sl],
                deterministic=False, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(9)})
            tot = tot + jnp.sum(h * h)
        return tot

    def loss_pipe(params):
        (h, _), _ = pipe_enc.apply(
            {"params": params, **stats_p}, x, xl,
            deterministic=False, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(9)})
        return jnp.sum(h * h)

    l_s, g_s = jax.value_and_grad(loss_scan)(vs["params"])
    l_p, g_p = jax.value_and_grad(loss_pipe)(vp["params"])
    np.testing.assert_allclose(float(l_s), float(l_p), rtol=1e-5)
    g_s2p = pipeline_variables_from_scan(g_s, stages=P)
    flat_s = jax.tree_util.tree_leaves_with_path(g_s2p)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_p))
    assert len(flat_s) == len(flat_p)
    for path, leaf in flat_s:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_p[path]),
            rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))


def test_pipeline_composes_with_tp_and_fsdp(tmp_path):
    """(data=2, pipe=2, model=2) mesh with FSDP on: the full composition
    (stage sharding over 'pipe' + Megatron TP over 'model' + ZeRO over
    'data') matches single-device numerics through 3 steps."""
    from lasr_tpu.data.frontend import DeviceFrontend
    from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC
    from lasr_tpu.models.losses import E2E_Loss
    from lasr_tpu.parallel.mesh import make_mesh
    from lasr_tpu.train.optimizer import Adam, WarmupScheduler
    from lasr_tpu.train.trainer import Trainer

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(5)
    B, S = 8, 8000
    batch = {
        "wav_array": (0.1 * rng.standard_normal((B, S))).astype(np.float32),
        "wav_len": np.full((B,), S, np.int32),
        "token_id": rng.integers(6, 20, (B, 6)).astype(np.int32),
        "token_len": np.full((B,), 6, np.int32),
        "n_utts": B,
    }

    def make(mesh, tp, fsdp):
        model = E2E_Conformer_CTC(
            idim=80, odim=20,
            encoder_attention_dim=16, encoder_attention_heads=2,
            encoder_linear_units=32, encoder_num_blocks=2,
            encoder_cnn_kernel=7,
            encoder_pos_enc_layer_type="rel_pos",
            encoder_selfattention_layer_type="rel_selfattn",
            encoder_pipeline_stages=2, encoder_pipeline_microbatches=2,
            decoder_attention_dim=16, decoder_attention_heads=2,
            decoder_linear_units=32, decoder_num_block=1,
            encoder_dropout_rate=0.0, decoder_dropout_rate=0.0,
            ctc_dropout=0.0)
        crit = E2E_Loss(size=20, padding_idx=-1, smoothing=0.1, rate=0.3)
        sched = WarmupScheduler(model_size=16, factor=1.0, warm_step=20)
        return Trainer(model, crit, Adam(betas=(0.9, 0.98)).make(sched),
                       DeviceFrontend(["norm", "fbank:80"]),
                       mesh=mesh, log_interval=100,
                       partition_params=tp, fsdp_params=fsdp,
                       fsdp_min_size=0)

    tr_c = make(make_mesh(data=2, pipe=2, model=2,
                          devices=jax.devices()[:8]), tp=True, fsdp=True)
    s_c = tr_c.init_state(batch)
    tr_1 = make(make_mesh(data=1, devices=jax.devices()[:1]),
                tp=False, fsdp=False)
    s_1 = tr_1.init_state(batch)
    for _ in range(3):
        s_c, m_c = tr_c.train_step(s_c, batch)
        s_1, m_1 = tr_1.train_step(s_1, batch)
    np.testing.assert_allclose(float(m_c["loss_main"]),
                               float(m_1["loss_main"]), rtol=2e-4)


def test_pipeline_trainer_on_pipe_mesh_matches_single(tmp_path):
    """(data=2, pipe=2) mesh: stage-stacked params shard over 'pipe', the
    step runs, and numerics match the single-device run of the same
    pipelined model."""
    from jax.sharding import NamedSharding, PartitionSpec as Pspec
    from lasr_tpu.data.frontend import DeviceFrontend
    from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC
    from lasr_tpu.models.losses import E2E_Loss
    from lasr_tpu.parallel.mesh import make_mesh
    from lasr_tpu.train.optimizer import Adam, WarmupScheduler
    from lasr_tpu.train.trainer import Trainer

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    rng = np.random.default_rng(3)
    B, S = 8, 8000
    batch = {
        "wav_array": (0.1 * rng.standard_normal((B, S))).astype(np.float32),
        "wav_len": np.full((B,), S, np.int32),
        "token_id": rng.integers(6, 20, (B, 6)).astype(np.int32),
        "token_len": np.full((B,), 6, np.int32),
        "n_utts": B,
    }

    def make(mesh):
        model = E2E_Conformer_CTC(
            idim=80, odim=20,
            encoder_attention_dim=16, encoder_attention_heads=2,
            encoder_linear_units=32, encoder_num_blocks=2,
            encoder_cnn_kernel=7,
            encoder_pos_enc_layer_type="rel_pos",
            encoder_selfattention_layer_type="rel_selfattn",
            encoder_pipeline_stages=2, encoder_pipeline_microbatches=2,
            decoder_attention_dim=16, decoder_attention_heads=2,
            decoder_linear_units=32, decoder_num_block=1,
            encoder_dropout_rate=0.0, decoder_dropout_rate=0.0,
            ctc_dropout=0.0)
        crit = E2E_Loss(size=20, padding_idx=-1, smoothing=0.1, rate=0.3)
        sched = WarmupScheduler(model_size=16, factor=1.0, warm_step=20)
        return Trainer(model, crit, Adam(betas=(0.9, 0.98)).make(sched),
                       DeviceFrontend(["norm", "fbank:80"]),
                       mesh=mesh, log_interval=100)

    tr_p = make(make_mesh(data=2, pipe=2, devices=jax.devices()[:4]))
    s_p = tr_p.init_state(batch)
    k = s_p.params["encoder"]["pipe_stages"]["block"]["feed_forward"][
        "Dense_0"]["kernel"]
    assert k.shape[:2] == (2, 1)          # [stages, layers_per_stage]
    assert k.sharding.is_equivalent_to(
        NamedSharding(tr_p.mesh, Pspec("pipe")), k.ndim)

    tr_1 = make(make_mesh(data=1, devices=jax.devices()[:1]))
    s_1 = tr_1.init_state(batch)
    for _ in range(3):
        s_p, m_p = tr_p.train_step(s_p, batch)
        s_1, m_1 = tr_1.train_step(s_1, batch)
    np.testing.assert_allclose(float(m_p["loss_main"]),
                               float(m_1["loss_main"]), rtol=2e-4)
