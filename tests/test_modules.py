"""NN module tests: shapes, masking, rel-shift math, subsampling lengths."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from lasr_tpu.modules.attention import (
    MultiHeadedAttention, RelPositionMultiHeadedAttention,
    MTMultiHeadedAttention, rel_shift, safe_exclusive_cumprod)
from lasr_tpu.modules.embedding import (
    PositionalEncoding, RelPositionalEncoding, sinusoid_table)
from lasr_tpu.modules.subsampling import Conv2dSubsampling, subsampled_len
from lasr_tpu.modules.transformer import Encoder, Decoder
from lasr_tpu.modules.conformer import ConformerEncoder, ConvolutionModule
from lasr_tpu.utils.masks import target_mask


def test_rel_shift_matches_naive():
    """rel_shift must realign column p (rel dist T1-1-p) to key j = i - dist."""
    B, H, T = 1, 1, 5
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, H, T, 2 * T - 1)).astype(np.float32)
    got = np.asarray(rel_shift(jnp.asarray(x)))
    # naive: out[i, j] = x[i, (T-1) - (i - j)] for 0 <= j < T
    want = np.zeros((B, H, T, T), np.float32)
    for i in range(T):
        for j in range(T):
            want[0, 0, i, j] = x[0, 0, i, (T - 1) - (i - j)]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_safe_exclusive_cumprod():
    x = jnp.asarray([[0.5, 0.5, 0.5]])
    out = np.asarray(safe_exclusive_cumprod(x))
    np.testing.assert_allclose(out[0], [1.0, 0.5, 0.25], atol=1e-6)


def test_mha_masking():
    mha = MultiHeadedAttention(n_head=2, n_feat=8)
    q = jnp.ones((2, 3, 8))
    kv = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 8))
    mask = jnp.asarray([[[True, True, False, False]]] * 2)  # (B,1,T2)
    params = mha.init(jax.random.PRNGKey(1), q, kv, kv, mask)
    out, inter = mha.apply(params, q, kv, kv, mask, mutable=["intermediates"])
    assert out.shape == (2, 3, 8)
    attn = np.asarray(inter["intermediates"]["attn"][0])  # (B,H,T1,T2)
    assert np.all(attn[..., 2:] == 0.0)
    np.testing.assert_allclose(attn.sum(-1), 1.0, atol=1e-5)


def test_rel_mha_shapes():
    mha = RelPositionMultiHeadedAttention(n_head=2, n_feat=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 8))
    pos = jax.random.normal(jax.random.PRNGKey(1), (1, 9, 8))
    params = mha.init(jax.random.PRNGKey(2), x, x, x, pos)
    out = mha.apply(params, x, x, x, pos)
    assert out.shape == (2, 5, 8)


def test_mta_monotonic_weights_sum_below_one():
    mta = MTMultiHeadedAttention(n_head=2, n_feat=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8))
    mem = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 8))
    params = mta.init(jax.random.PRNGKey(2), x, mem, mem)
    out, inter = mta.apply(params, x, mem, mem, mutable=["intermediates"])
    assert out.shape == (1, 4, 8)
    attn = np.asarray(inter["intermediates"]["attn"][0])
    assert np.all(attn >= 0) and np.all(attn.sum(-1) <= 1.0 + 1e-5)


def test_positional_encoding_offset():
    pe = PositionalEncoding(8, dropout_rate=0.0)
    x = jnp.zeros((1, 4, 8))
    params = pe.init(jax.random.PRNGKey(0), x)
    base = np.asarray(pe.apply(params, jnp.zeros((1, 10, 8))))
    off = np.asarray(pe.apply(params, x, offset=3))
    np.testing.assert_allclose(off[0], base[0, 3:7], atol=1e-6)


def test_positional_encoding_per_row_offsets():
    """Array offsets (long-form windows) must equal per-row table slices,
    including positions past the static table bound."""
    pe = PositionalEncoding(8, dropout_rate=0.0, max_len=6000)
    x = jnp.zeros((3, 4, 8))
    params = pe.init(jax.random.PRNGKey(0), x)
    out = np.asarray(pe.apply(params, x, offset=jnp.asarray([0, 3, 5500])))
    base = np.asarray(pe.apply(params, jnp.zeros((1, 5504, 8))))
    for i, o in enumerate((0, 3, 5500)):
        np.testing.assert_allclose(out[i], base[0, o: o + 4], atol=1e-4)
    # beyond any table: values computed on the fly, still finite/correct
    far = np.asarray(pe.apply(params, x[:1], offset=jnp.asarray([50000])))
    assert np.isfinite(far).all()


def test_rel_positional_encoding_center():
    pe = RelPositionalEncoding(8, dropout_rate=0.0)
    x = jnp.zeros((1, 5, 8))
    params = pe.init(jax.random.PRNGKey(0), x)
    _, pos = pe.apply(params, x)
    assert pos.shape == (1, 9, 8)
    # center (index T-1=4) is relative distance 0 → sinusoid_table row 0
    np.testing.assert_allclose(
        np.asarray(pos[0, 4]), sinusoid_table(1, 8)[0], atol=1e-6)


def test_subsampled_len_matches_slicing():
    for T in (17, 32, 101):
        mask = np.ones(T, bool)
        for l in (T, T - 3, 9):
            m = mask.copy()
            m[l:] = False
            want = m[:-2:2].sum()
            got = subsampled_len(l, T)
            assert got == want, (T, l, got, want)


def test_conv2d_subsampling_shapes_and_torch_T():
    sub = Conv2dSubsampling(idim=80, odim=16, dropout_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 58, 80))
    x_len = jnp.asarray([58, 30])
    params = sub.init(jax.random.PRNGKey(1), x, x_len)
    out, new_len = sub.apply(params, x, x_len)
    # torch: T'=(58-3)//2+1=28 then (28-3)//2+1=13
    assert out.shape == (2, 13, 16)
    assert int(new_len[0]) == 13
    # l=30 → ceil(min(30,56)/2)=15 → ceil(min(15,26)/2)=8
    assert int(new_len[1]) == 8


def test_transformer_encoder_padding_invariance():
    enc = Encoder(idim=20, attention_dim=16, attention_heads=2,
                  linear_units=32, num_blocks=2, dropout_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 31, 20))
    x40 = jnp.concatenate([x, jnp.zeros((1, 9, 20))], axis=1)
    x48 = jnp.concatenate([x, jnp.zeros((1, 17, 20))], axis=1)
    params = enc.init(jax.random.PRNGKey(1), x40, jnp.asarray([31]))
    hs, hs_len = enc.apply(params, x40, jnp.asarray([31]))
    hs2, hs_len2 = enc.apply(params, x48, jnp.asarray([31]))
    n = int(hs_len[0])
    assert n == int(hs_len2[0])
    np.testing.assert_allclose(np.asarray(hs[0, :n]), np.asarray(hs2[0, :n]),
                               atol=1e-4)


def test_decoder_full_vs_cached_step():
    """Cached KV decode must equal the full forward at each position."""
    dec = Decoder(odim=11, attention_dim=16, attention_heads=2,
                  linear_units=32, num_blocks=2, dropout_rate=0.0)
    B, L, T = 2, 5, 7
    mem = jax.random.normal(jax.random.PRNGKey(0), (B, T, 16))
    mem_mask = jnp.ones((B, 1, T), bool)
    ys = jax.random.randint(jax.random.PRNGKey(1), (B, L), 0, 11)
    params = dec.init(jax.random.PRNGKey(2), ys, target_mask(ys), mem, mem_mask)

    full = dec.apply(params, ys, target_mask(ys), mem, mem_mask)
    full_logp = np.asarray(jax.nn.log_softmax(full, axis=-1))

    cache = dec.apply(params, B, L, method=Decoder.init_cache)
    mem_k, mem_v = dec.apply(params, mem, method=Decoder.project_memory)
    for t in range(L):
        logp, cache = dec.apply(params, ys[:, t], t, cache, mem_k, mem_v,
                                mem_mask, method=Decoder.forward_one_step)
        np.testing.assert_allclose(np.asarray(logp), full_logp[:, t],
                                   atol=1e-4)


def test_conformer_encoder_rel_pos():
    enc = ConformerEncoder(
        idim=40, attention_dim=16, attention_heads=2, linear_units=32,
        num_blocks=2, dropout_rate=0.0, pos_enc_layer_type="rel_pos",
        selfattention_layer_type="rel_selfattn", use_cnn_module=True,
        cnn_module_kernel=7)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 37, 40))
    x_len = jnp.asarray([37, 20])
    vars_ = enc.init(jax.random.PRNGKey(1), x, x_len)
    hs, hs_len = enc.apply(vars_, x, x_len, deterministic=True)
    assert hs.shape[0] == 2 and hs.shape[2] == 16
    assert "batch_stats" in vars_
    # train mode mutates batch stats
    hs2, new_stats = enc.apply(vars_, x, x_len, deterministic=False,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(3)})
    assert "batch_stats" in new_stats


def test_convolution_module_shape():
    m = ConvolutionModule(channels=16, kernel_size=7)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
    vars_ = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(vars_, x)
    assert out.shape == (2, 10, 16)


def test_conformer_scan_layers_matches_loop():
    """scan_layers=True must compute exactly the loop version when the loop
    version's per-layer params are stacked onto the scan layout."""
    from flax.traverse_util import flatten_dict, unflatten_dict
    kw = dict(idim=20, attention_dim=16, attention_heads=2, linear_units=32,
              num_blocks=3, dropout_rate=0.0, pos_enc_layer_type="rel_pos",
              selfattention_layer_type="rel_selfattn", use_cnn_module=True,
              cnn_module_kernel=7)
    loop_enc = ConformerEncoder(**kw)
    scan_enc = ConformerEncoder(**kw, scan_layers=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 37, 20))
    x_len = jnp.asarray([37, 20])
    loop_vars = loop_enc.init(jax.random.PRNGKey(1), x, x_len)
    scan_vars = scan_enc.init(jax.random.PRNGKey(1), x, x_len)

    # restack loop params/batch_stats into the scan layout
    def restack(coll):
        flat = flatten_dict(coll)
        out = {}
        n = kw["num_blocks"]
        for path, leaf in flat.items():
            if path[0].startswith("layers_"):
                i = int(path[0].split("_")[1])
                key = ("layers", "block") + path[1:]
                if key not in out:
                    out[key] = [None] * n
                out[key][i] = leaf
            else:
                out[path] = leaf
        return unflatten_dict({k: (jnp.stack(v) if isinstance(v, list) else v)
                               for k, v in out.items()})

    stacked = {c: restack(loop_vars[c]) for c in loop_vars}
    # shapes must agree with the scan init
    jax.tree.map(lambda a, b: None if a.shape == b.shape else 1 / 0,
                 stacked["params"], scan_vars["params"])

    want, want_len = loop_enc.apply(loop_vars, x, x_len)
    got, got_len = scan_enc.apply(stacked, x, x_len)
    np.testing.assert_array_equal(np.asarray(want_len), np.asarray(got_len))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # train mode runs (dropout rngs split per layer; batch stats mutate)
    out2, mut = scan_enc.apply(stacked, x, x_len, deterministic=False,
                               mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(2)})
    assert "batch_stats" in mut


def test_skewed_pos_table_indexing():
    """build_skewed_pos_table[i, j] == pos_emb[0, T-1-i+j]."""
    from lasr_tpu.modules.attention import build_skewed_pos_table
    T, M = 7, 4
    rng = np.random.default_rng(0)
    e = rng.standard_normal((1, 2 * T - 1, M)).astype(np.float32)
    got = np.asarray(build_skewed_pos_table(jnp.asarray(e)))
    for i in range(T):
        for j in range(T):
            np.testing.assert_allclose(got[i, j], e[0, T - 1 - i + j],
                                       atol=0, rtol=0)


def test_folded_rel_attention_matches_shift_path():
    """The pos_table contraction must equal the rel_shift path exactly
    (same math, reordered contraction) on both the attention module and a
    full conformer encoder."""
    from lasr_tpu.modules.attention import build_skewed_pos_table
    B, T, H, F = 2, 11, 2, 16
    att = RelPositionMultiHeadedAttention(H, F, 0.0)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, T, F))
    pos = jax.random.normal(jax.random.PRNGKey(1), (1, 2 * T - 1, F))
    mask = (jnp.arange(T)[None, :] < jnp.asarray([[T], [T - 4]]))[:, None, :]
    vars_ = att.init(jax.random.PRNGKey(2), x, x, x, pos, mask)
    want = att.apply(vars_, x, x, x, pos, mask)
    table = build_skewed_pos_table(pos)
    got = att.apply(vars_, x, x, x, pos, mask, pos_table=table)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_rot_fold_matches_rel_shift_on_sinusoid_pe():
    """The rotated fold (one merged matmul, sinusoid angle-addition) must
    equal the rel_shift path exactly when pos_emb is the true sinusoid
    table — including under a padding mask."""
    B, T, H, F = 2, 11, 2, 16
    att = RelPositionMultiHeadedAttention(H, F, 0.0, rot_fold=True)
    att_ref = RelPositionMultiHeadedAttention(H, F, 0.0, rot_fold=False)
    pe = RelPositionalEncoding(F, dropout_rate=0.0)
    pe_vars = pe.init(jax.random.PRNGKey(0), jnp.zeros((1, T, F)))
    _, pos = pe.apply(pe_vars, jnp.zeros((1, T, F)))       # (1, 2T-1, F)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, F))
    mask = (jnp.arange(T)[None, :] < jnp.asarray([[T], [T - 4]]))[:, None, :]
    vars_ = att.init(jax.random.PRNGKey(2), x, x, x, pos, mask)
    got = att.apply(vars_, x, x, x, pos, mask)
    want = att_ref.apply(vars_, x, x, x, pos, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def _tiny_conformer(pos_dropout_mode, dropout_rate=0.0,
                    positional_dropout_rate=0.0):
    return ConformerEncoder(
        idim=12, attention_dim=16, attention_heads=2, linear_units=32,
        num_blocks=2, dropout_rate=dropout_rate,
        positional_dropout_rate=positional_dropout_rate,
        pos_enc_layer_type="rel_pos",
        selfattention_layer_type="rel_selfattn", use_cnn_module=True,
        cnn_module_kernel=7, pos_dropout_mode=pos_dropout_mode)


def test_pos_dropout_mode_rotated_equals_table_at_rate_zero():
    """Training forward: with positional dropout rate 0 the rotated mode
    (one-matmul fold) must equal the table mode (skewed-table fold) —
    same math, different factorization.  Other dropouts stay live and
    consume identical rng streams in both modes."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 33, 12)), jnp.float32)
    lens = jnp.asarray([33, 21])
    outs = []
    for mode in ("table", "rotated"):
        enc = _tiny_conformer(mode, dropout_rate=0.2)
        vars_ = enc.init(jax.random.PRNGKey(1), x, lens)
        (h, hl), _ = enc.apply(vars_, x, lens, deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(7)},
                               mutable=["batch_stats"])
        outs.append(np.asarray(h))
    np.testing.assert_allclose(outs[0], outs[1], atol=3e-5)


def test_pos_dropout_mode_rotated_training_behaviour():
    """Rotated-space positional dropout: training forwards vary with the
    dropout rng, deterministic forwards are mode-independent, and the
    positional projection still receives gradient."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 33, 12)), jnp.float32)
    lens = jnp.asarray([33, 21])
    enc = _tiny_conformer("rotated", positional_dropout_rate=0.5)
    vars_ = enc.init(jax.random.PRNGKey(1), x, lens)
    (h1, _), _ = enc.apply(vars_, x, lens, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
    (h2, _), _ = enc.apply(vars_, x, lens, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(3)},
                           mutable=["batch_stats"])
    assert not np.allclose(np.asarray(h1), np.asarray(h2))

    # deterministic forward: exact across modes (dropout placement is a
    # training-only difference)
    det_r, _ = enc.apply(vars_, x, lens, deterministic=True)
    enc_t = _tiny_conformer("table", positional_dropout_rate=0.5)
    det_t, _ = enc_t.apply(vars_, x, lens, deterministic=True)
    np.testing.assert_allclose(np.asarray(det_r), np.asarray(det_t),
                               atol=1e-6)

    def loss(params):
        (h, _), _ = enc.apply(
            {"params": params, "batch_stats": vars_["batch_stats"]},
            x, lens, deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(2)},
            mutable=["batch_stats"])
        return jnp.sum(h * h)

    grads = jax.grad(loss)(vars_["params"])
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    pos_kernel = [float(jnp.abs(v).max()) for p, v in flat
                  if "linear_pos" in jax.tree_util.keystr(p)]
    assert pos_kernel and all(g > 0 for g in pos_kernel)


def test_conformer_solo_pad_matches_solo_encode():
    """solo_pad=True batched encode == encoding each row alone (the decode
    contract: reference decode is one-utterance-at-a-time)."""
    enc = ConformerEncoder(
        idim=12, attention_dim=16, attention_heads=2, linear_units=32,
        num_blocks=2, dropout_rate=0.0, pos_enc_layer_type="rel_pos",
        selfattention_layer_type="rel_selfattn", use_cnn_module=True,
        cnn_module_kernel=7)
    rng = np.random.default_rng(0)
    lens = [41, 29, 17]
    T = max(lens)
    x = np.zeros((3, T, 12), np.float32)
    for i, n in enumerate(lens):
        x[i, :n] = rng.standard_normal((n, 12))
    vars_ = enc.init(jax.random.PRNGKey(1), jnp.asarray(x),
                     jnp.asarray(lens))
    hb, lb = enc.apply(vars_, jnp.asarray(x), jnp.asarray(lens),
                       solo_pad=True)
    for i, n in enumerate(lens):
        hs, ls = enc.apply(vars_, jnp.asarray(x[i : i + 1, :n]),
                           jnp.asarray([n]))
        assert int(lb[i]) == int(ls[0])
        np.testing.assert_allclose(np.asarray(hb[i, : int(ls[0])]),
                                   np.asarray(hs[0, : int(ls[0])]),
                                   atol=2e-5)
