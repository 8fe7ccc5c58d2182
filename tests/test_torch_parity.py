"""Numerical parity vs the actual reference implementation.

Builds the reference torch models (imported from /root/reference), maps
their randomly-initialized state_dicts into our Flax models via
utils/torch_compat, and checks full forward parity — the strongest check
that attention math, rel-shift, subsampling, masking, and norm semantics
all match, and the mechanism that makes the published lighting-asr
checkpoints loadable.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp
import torch

from lasr_tpu.utils.torch_compat import (
    split_lightning_state_dict, torch_to_flax)

TINY = dict(idim=20, odim=9,
            encoder_attention_dim=16, encoder_attention_heads=2,
            encoder_linear_units=32, encoder_num_blocks=2,
            decoder_attention_dim=16, decoder_attention_heads=2,
            decoder_linear_units=32, decoder_num_block=2)


def _data(B=2, T=45, D=20, L=5, odim=9, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, T, D)).astype(np.float32)
    xlen = np.asarray([T, T - 9], dtype=np.int64)
    ys = rng.integers(1, odim, (B, L)).astype(np.int64)
    return x, xlen, ys


def test_transformer_forward_parity():
    from lasr.model.e2e_ctc_att.e2e_transformer import (
        E2E_Transformer_CTC as TorchModel)
    import lasr_tpu.models.e2e_ctc_att as ours

    tm = TorchModel(**TINY).eval()
    x, xlen, ys = _data()
    with torch.no_grad():
        att_t, ctc_t, hs_len_t = tm.forward(
            torch.from_numpy(x), torch.from_numpy(xlen),
            torch.from_numpy(ys), None)

    fm = ours.E2E_Transformer_CTC(**TINY)
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(xlen), jnp.asarray(ys))
    variables = torch_to_flax(tm.state_dict(), template=template)
    out = fm.apply(variables, jnp.asarray(x), jnp.asarray(xlen),
                   jnp.asarray(ys))

    np.testing.assert_array_equal(np.asarray(out["hs_len"]),
                                  hs_len_t.numpy())
    # padded decoder rows attend over padded encoder frames in both impls;
    # compare valid region
    att_f = np.asarray(out["att_out"])
    np.testing.assert_allclose(att_f, att_t.numpy(), atol=2e-4)
    ctc_f = np.asarray(out["ctc_out"])
    for b, n in enumerate(np.asarray(out["hs_len"])):
        np.testing.assert_allclose(ctc_f[b, :n], ctc_t.numpy()[b, :n],
                                   atol=2e-4)


def test_conformer_forward_parity():
    from lasr.model.e2e_ctc_att.e2e_conformer import (
        E2E_Conformer_CTC as TorchModel)
    import lasr_tpu.models.e2e_ctc_att as ours

    kw = dict(TINY, encoder_pos_enc_layer_type="rel_pos",
              encoder_selfattention_layer_type="rel_selfattn",
              encoder_use_cnn=True, encoder_cnn_kernel=7)
    tm = TorchModel(**kw).eval()
    x, xlen, ys = _data(seed=1)
    with torch.no_grad():
        att_t, ctc_t, hs_len_t = tm.forward(
            torch.from_numpy(x), torch.from_numpy(xlen),
            torch.from_numpy(ys), None)

    fm = ours.E2E_Conformer_CTC(**kw)
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(xlen), jnp.asarray(ys))
    variables = torch_to_flax(tm.state_dict(), template=template)
    out = fm.apply(variables, jnp.asarray(x), jnp.asarray(xlen),
                   jnp.asarray(ys))

    np.testing.assert_array_equal(np.asarray(out["hs_len"]),
                                  hs_len_t.numpy())
    np.testing.assert_allclose(np.asarray(out["att_out"]), att_t.numpy(),
                               atol=5e-4)
    ctc_f = np.asarray(out["ctc_out"])
    for b, n in enumerate(np.asarray(out["hs_len"])):
        np.testing.assert_allclose(ctc_f[b, :n], ctc_t.numpy()[b, :n],
                                   atol=5e-4)


def test_lightning_prefix_split():
    sd = {"model.encoder.x": 1, "model.decoder.y": 2, "model_ema.encoderx": 3}
    groups = split_lightning_state_dict(sd)
    assert set(groups) == {"model", "model_ema"}
    assert groups["model"] == {"encoder.x": 1, "decoder.y": 2}


def test_load_reference_lightning_checkpoint(tmp_path):
    """A Lightning-style .ckpt (model.* + model_ema.* shadows) round-trips
    through load_reference_checkpoint with EMA preference."""
    from lasr.model.e2e_ctc_att.e2e_transformer import (
        E2E_Transformer_CTC as TorchModel)
    from lasr_tpu.utils.torch_compat import load_reference_checkpoint
    import lasr_tpu.models.e2e_ctc_att as ours

    tm = TorchModel(**TINY)
    sd = {}
    for k, v in tm.state_dict().items():
        sd["model." + k] = v
        # EMA shadow = value + 1 so we can tell which one was loaded
        sd["model_ema." + k.replace(".", "")] = v + 1.0
    ckpt = tmp_path / "last-step-00-42.ckpt"
    torch.save({"state_dict": sd}, str(ckpt))

    fm = ours.E2E_Transformer_CTC(**TINY)
    x, xlen, ys = _data()
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(xlen), jnp.asarray(ys))
    variables = load_reference_checkpoint(str(ckpt), template=template)
    # EMA values (original + 1) were preferred
    got = np.asarray(variables["params"]["ctc"]["Dense_0"]["bias"])
    want = tm.state_dict()["ctc.1.bias"].numpy() + 1.0
    np.testing.assert_allclose(got, want, atol=1e-6)

    no_ema = load_reference_checkpoint(str(ckpt), template=template,
                                       prefer_ema=False)
    got2 = np.asarray(no_ema["params"]["ctc"]["Dense_0"]["bias"])
    np.testing.assert_allclose(got2, want - 1.0, atol=1e-6)


ONLINE_TINY = dict(idim=20, odim=11,
                   encoder_attention_dim=16, encoder_attention_heads=2,
                   encoder_left_chunk=16, encoder_center_chunk=16,
                   encoder_right_chunk=16,
                   encoder_linear_units=32, encoder_num_blocks=2,
                   decoder_attention_dim=16, decoder_self_attention_heads=2,
                   decoder_src_attention_heads=2, decoder_linear_units=32,
                   decoder_num_block=2, encoder_dropout_rate=0.0,
                   decoder_dropout_rate=0.0, ctc_dropout=0.0,
                   decoder_src_attention_sigmoid_noise=0.0)


def test_online_transformer_forward_parity():
    """E2E_Transformer_CTC_Online vs the actual reference torch model on
    identical weights: ChunkEncoder streaming forward (memory rings, chunk
    grid, PE offsets, key masking — online_transformer/encoder.py:143-176),
    the full train forward, and the streaming decoder's cached one-step with
    MTA endpoint advance (decoder.py:114-142, attention.py:92-123)."""
    from lasr.model.e2e_ctc_att.e2e_transformer_online import (
        E2E_Transformer_CTC_Online as TorchModel)
    from lasr.utils.mask import subsequent_mask
    from lasr_tpu.models.e2e_online import (
        E2E_Transformer_CTC_Online as FlaxModel)

    torch.manual_seed(0)
    tm = TorchModel(**ONLINE_TINY).eval()
    fm = FlaxModel(**ONLINE_TINY)

    rng = np.random.default_rng(0)
    B, T = 2, 100
    x = rng.standard_normal((B, T, 20)).astype(np.float32)
    xlen = np.asarray([100, 70], np.int64)
    ys = rng.integers(1, 11, (B, 4)).astype(np.int64)
    template = fm.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.asarray(xlen, jnp.int32), jnp.asarray(ys, jnp.int32))
    variables = torch_to_flax(tm.state_dict(), template=template)

    # streaming encoder forward: every frame of every solo chunk, tail conv
    # margin included — the tensor the reference decoder consumes
    with torch.no_grad():
        ths, _ = tm.encoder_forward_online(torch.from_numpy(x),
                                           torch.from_numpy(xlen))
    fhs, fhs_len = fm.apply(variables, jnp.asarray(x),
                            jnp.asarray(xlen, jnp.int32), ref_tail=True,
                            method=fm.encode_online)
    assert int(fhs_len[0]) == ths.shape[1]
    np.testing.assert_allclose(np.asarray(fhs)[:, : ths.shape[1]],
                               ths.numpy(), atol=1e-5)

    # full train forward (production masking conventions on our side)
    with torch.no_grad():
        att_t, ctc_t, hlen_t = tm(torch.from_numpy(x), torch.from_numpy(xlen),
                                  torch.from_numpy(ys), None)
    out = fm.apply(variables, jnp.asarray(x), jnp.asarray(xlen, jnp.int32),
                   jnp.asarray(ys, jnp.int32))
    np.testing.assert_array_equal(np.asarray(out["hs_len"]), hlen_t.numpy())
    np.testing.assert_allclose(np.asarray(out["att_out"]), att_t.numpy(),
                               atol=1e-5)
    for b in range(B):
        n = int(hlen_t[b])
        np.testing.assert_allclose(np.asarray(out["ctc_out"])[b, :n],
                                   ctc_t.numpy()[b, :n], atol=1e-5)

    # cached online decode steps: log-probs AND per-layer/head endpoints
    mem_t = torch.from_numpy(ths.numpy()[:1])
    mem_f = jnp.asarray(ths.numpy()[:1])
    cache_f = fm.apply(variables, 1, 12, method=fm.decoder_init_cache)
    cache_t = None
    seq = [1, 5, 7, 3]
    for i in range(len(seq)):
        ys_t = torch.tensor([seq[: i + 1]])
        m = subsequent_mask(i + 1).unsqueeze(0)
        with torch.no_grad():
            lp_t, cache_t = tm.decoder_forward_online(ys_t, m, mem_t, cache_t)
        lp_f, cache_f = fm.apply(variables, jnp.asarray([seq[i]], jnp.int32),
                                 i, cache_f, mem_f,
                                 method=fm.decoder_step_online)
        np.testing.assert_allclose(np.asarray(lp_f)[0], lp_t.numpy()[0],
                                   atol=1e-5)
        eps_t = np.asarray([c[1] for c in cache_t])      # (layers, heads)
        eps_f = np.asarray(cache_f["ep"])[:, 0]          # (layers, heads)
        np.testing.assert_array_equal(eps_f, eps_t)
