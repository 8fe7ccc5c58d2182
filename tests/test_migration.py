"""Drop-in migration from the reference framework.

Two contracts a reference user relies on when switching:

1. Their existing YAMLs run unmodified — reference class paths
   (``lasr.…``, ``torch.optim:Adam``) translate onto the lasr_tpu
   implementations (utils/registry.py REFERENCE_NAME_ALIASES), validated
   here against the reference's OWN shipped ``config_baseline.yaml`` /
   ``decode.yaml`` (/root/reference/example/asr_en/conf).

2. Their existing Lightning training output decodes directly —
   ``load_averaged_params`` accepts a ``.ckpt`` file or a directory of
   them, averaging with the reference's own filename-sort semantics
   (average_checkpoints.py:7-38) and preferring the EMA shadow
   (decode_lighting.py:66-78).
"""

import os
import sys

import numpy as np
import pytest
import yaml

sys.path.insert(0, "/root/reference")

import torch  # noqa: E402

from lasr_tpu.utils.registry import (  # noqa: E402
    REFERENCE_NAME_ALIASES, BaseConfig, dynamic_import)

REF_CONF = "/root/reference/example/asr_en/conf"


def test_every_reference_alias_resolves():
    for ref_path, our_path in REFERENCE_NAME_ALIASES.items():
        with pytest.warns(UserWarning, match="reference class"):
            via_ref = dynamic_import(ref_path)
        assert via_ref is dynamic_import(our_path)
        # the class name is preserved (the YAML contract: same class,
        # same constructor kwargs)
        assert via_ref.__name__ == ref_path.rpartition(":")[2]


def test_explicit_alias_outranks_reference_table():
    marker = dynamic_import(
        "torch.optim:Adam",
        alias={"torch.optim:Adam": "lasr_tpu.train.optimizer:Noam"})
    from lasr_tpu.train.optimizer import Noam
    assert marker is Noam


def test_unmapped_reference_module_errors_helpfully(monkeypatch):
    # simulate production (reference not importable) for a lasr.* path
    # that has no alias entry
    monkeypatch.setattr(sys, "path",
                        [p for p in sys.path if "reference" not in p])
    for mod in [m for m in list(sys.modules) if m.split(".")[0] == "lasr"]:
        monkeypatch.delitem(sys.modules, mod)
    with pytest.raises(ImportError, match="MIGRATION"):
        dynamic_import("lasr.data.datatrans:register_trans")


def test_reference_train_config_builds_unmodified():
    """The reference's shipped EN recipe config instantiates our model,
    criterion, optimizer and datasets with its original name strings and
    kwargs (odim/size injected by the driver, train_lighting.py:162-168)."""
    with open(os.path.join(REF_CONF, "config_baseline.yaml")) as f:
        cfg = yaml.safe_load(f)

    odim = 31
    cfg["model_config"]["kwargs"]["odim"] = odim
    # shrink the 46M recipe geometry so init stays test-sized; the kwarg
    # NAMES are the contract under test and stay the reference's own
    for k, v in dict(encoder_attention_dim=16, encoder_attention_heads=2,
                     encoder_linear_units=32, encoder_num_blocks=2,
                     decoder_attention_dim=16, decoder_attention_heads=2,
                     decoder_linear_units=32, decoder_num_block=2).items():
        assert k in cfg["model_config"]["kwargs"]
        cfg["model_config"]["kwargs"][k] = v
    model = BaseConfig(**cfg["model_config"]).generateExample()
    from lasr_tpu.models.e2e_ctc_att import E2E_Conformer_CTC
    assert isinstance(model, E2E_Conformer_CTC)

    import jax
    import jax.numpy as jnp
    x = jnp.zeros((1, 30, cfg["model_config"]["kwargs"]["idim"]))
    variables = model.init(jax.random.PRNGKey(0), x,
                           jnp.asarray([30]), jnp.full((1, 3), 5, jnp.int32))
    assert "params" in variables

    cfg["criterion_config"]["kwargs"]["size"] = odim
    criterion = BaseConfig(**cfg["criterion_config"]).generateExample()
    from lasr_tpu.models.losses import E2E_Loss
    assert isinstance(criterion, E2E_Loss)

    from lasr_tpu.train.optimizer import build_optimizer
    optimizer, schedule = build_optimizer(cfg["opti_config"])
    assert schedule is not None
    # reference Noam curve at the recipe's warm_step peak
    assert float(schedule(24999)) == pytest.approx(
        3 * 320 ** -0.5 * 25000 ** -0.5, rel=1e-6)

    train_ds = BaseConfig(**cfg["train_data_config"]).generateExample(
        tokenizer=None)
    from lasr_tpu.data.dataset import BatchAudioDataSet
    assert isinstance(train_ds, BatchAudioDataSet)
    assert train_ds.batch_duration == 500


def test_reference_decode_config_builds_unmodified():
    with open(os.path.join(REF_CONF, "decode.yaml")) as f:
        cfg = yaml.safe_load(f)
    test_ds = BaseConfig(**cfg["test_data_config"]).generateExample(
        tokenizer=None)
    from lasr_tpu.data.dataset import AudioDataSet
    assert isinstance(test_ds, AudioDataSet)
    assert cfg["decode_config"]["decode_method"] == "ctc_att"


def _save_ckpt(path, state, step):
    torch.save({"state_dict": state, "global_step": step}, str(path))


def test_average_reference_checkpoints_semantics(tmp_path):
    from lasr_tpu.utils.torch_compat import average_reference_checkpoints
    # mixed Lightning dir: best-val-* sorts before last-step-*
    _save_ckpt(tmp_path / "best-val-0.100000-03.ckpt",
               {"model.w": torch.tensor([1.0]),
                "model.steps": torch.tensor([10])}, 1)
    _save_ckpt(tmp_path / "best-val-0.200000-02.ckpt",
               {"model.w": torch.tensor([3.0]),
                "model.steps": torch.tensor([20])}, 2)
    _save_ckpt(tmp_path / "last-step-04-400.ckpt",
               {"model.w": torch.tensor([5.0]),
                "model.steps": torch.tensor([30])}, 3)
    _save_ckpt(tmp_path / "last-step-05-500.ckpt",
               {"model.w": torch.tensor([7.0]),
                "model.steps": torch.tensor([40])}, 4)

    state, chosen = average_reference_checkpoints(tmp_path, ids="best",
                                                  num=2)
    assert chosen == ["best-val-0.100000-03.ckpt",
                      "best-val-0.200000-02.ckpt"]
    assert float(state["model.w"]) == pytest.approx(2.0)
    assert int(state["model.steps"]) == 15

    state, chosen = average_reference_checkpoints(tmp_path, ids="last",
                                                  num=2)
    # reverse filename sort puts last-step-* first (reference quirk)
    assert chosen == ["last-step-05-500.ckpt", "last-step-04-400.ckpt"]
    assert float(state["model.w"]) == pytest.approx(6.0)


def test_decode_weights_from_reference_ckpt_dir(tmp_path):
    """load_averaged_params transparently averages + converts a directory
    of reference Lightning checkpoints of a real model."""
    from lasr.model.e2e_ctc_att.e2e_transformer import (
        E2E_Transformer_CTC as TorchModel)
    from lasr_tpu.train.trainer import load_averaged_params
    import lasr_tpu.models.e2e_ctc_att as ours

    tiny = dict(idim=20, odim=9,
                encoder_attention_dim=16, encoder_attention_heads=2,
                encoder_linear_units=32, encoder_num_blocks=2,
                decoder_attention_dim=16, decoder_attention_heads=2,
                decoder_linear_units=32, decoder_num_block=2)
    torch.manual_seed(0)
    tm = TorchModel(**tiny)
    sd1 = {"model." + k: v.clone() for k, v in tm.state_dict().items()}
    sd2 = {k: v + 1.0 for k, v in sd1.items()}
    _save_ckpt(tmp_path / "last-step-01-100.ckpt", sd1, 100)
    _save_ckpt(tmp_path / "last-step-02-200.ckpt", sd2, 200)

    params, batch_stats = load_averaged_params(str(tmp_path), choose="last",
                                               avg=5)
    assert batch_stats == {}
    got = np.asarray(params["ctc"]["Dense_0"]["bias"])
    want = tm.state_dict()["ctc.1.bias"].numpy() + 0.5
    np.testing.assert_allclose(got, want, atol=1e-6)

    # the converted tree powers a real forward in our model
    import jax.numpy as jnp
    fm = ours.E2E_Transformer_CTC(**tiny)
    out = fm.apply({"params": params}, jnp.zeros((1, 30, 20)),
                   jnp.asarray([30]), jnp.full((1, 3), 5, jnp.int32))
    assert np.isfinite(np.asarray(out["ctc_out"])).all()


def test_single_ckpt_file_path(tmp_path):
    from lasr.model.e2e_ctc_att.e2e_transformer import (
        E2E_Transformer_CTC as TorchModel)
    from lasr_tpu.utils.torch_compat import is_reference_checkpoint_path
    from lasr_tpu.train.trainer import load_averaged_params

    tiny = dict(idim=20, odim=9,
                encoder_attention_dim=16, encoder_attention_heads=2,
                encoder_linear_units=32, encoder_num_blocks=2,
                decoder_attention_dim=16, decoder_attention_heads=2,
                decoder_linear_units=32, decoder_num_block=2)
    torch.manual_seed(1)
    tm = TorchModel(**tiny)
    p = tmp_path / "best-val-0.5-01.ckpt"
    _save_ckpt(p, {"model." + k: v for k, v in tm.state_dict().items()}, 1)
    assert is_reference_checkpoint_path(str(p))
    assert not is_reference_checkpoint_path(str(tmp_path / "missing"))

    params, _ = load_averaged_params(str(p))
    np.testing.assert_allclose(
        np.asarray(params["ctc"]["Dense_0"]["bias"]),
        tm.state_dict()["ctc.1.bias"].numpy(), atol=1e-6)
