"""CTC loss vs torch.nn.CTCLoss golden (torch-cpu is in the image)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from lasr_tpu.ops.ctc import ctc_loss, ctc_forward_logprob, ctc_labels_from_padded


def _torch_ctc(logits, input_len, labels, label_len, blank=0):
    lp = torch.log_softmax(torch.from_numpy(logits), dim=-1).transpose(0, 1)
    targets = torch.from_numpy(
        np.concatenate([labels[i, : label_len[i]] for i in range(len(label_len))]))
    loss = torch.nn.CTCLoss(blank=blank, reduction="sum")(
        lp, targets, torch.from_numpy(input_len), torch.from_numpy(label_len))
    return float(loss) / logits.shape[0]


def _rand_case(B=4, T=37, V=11, L=9, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    input_len = rng.integers(L * 2 + 2, T + 1, size=B).astype(np.int64)
    label_len = rng.integers(1, L + 1, size=B).astype(np.int64)
    labels = rng.integers(1, V, size=(B, L)).astype(np.int64)
    return logits, input_len, labels, label_len


def test_ctc_loss_matches_torch():
    logits, input_len, labels, label_len = _rand_case()
    want = _torch_ctc(logits, input_len.astype(np.int32), labels, label_len.astype(np.int32))
    got = float(ctc_loss(
        jnp.asarray(logits), jnp.asarray(input_len, dtype=jnp.int32),
        jnp.asarray(labels), jnp.asarray(label_len, dtype=jnp.int32)))
    assert abs(got - want) / abs(want) < 1e-4, (got, want)


def test_ctc_loss_repeated_labels():
    rng = np.random.default_rng(3)
    B, T, V, L = 3, 30, 7, 6
    logits = rng.standard_normal((B, T, V)).astype(np.float32)
    labels = np.array([[1, 1, 2, 2, 3, 3]] * B, dtype=np.int64)
    label_len = np.array([6, 4, 2], dtype=np.int64)
    input_len = np.array([30, 25, 20], dtype=np.int64)
    want = _torch_ctc(logits, input_len.astype(np.int32), labels, label_len.astype(np.int32))
    got = float(ctc_loss(
        jnp.asarray(logits), jnp.asarray(input_len, dtype=jnp.int32),
        jnp.asarray(labels), jnp.asarray(label_len, dtype=jnp.int32)))
    assert abs(got - want) / abs(want) < 1e-4


def test_ctc_grad_matches_torch():
    logits, input_len, labels, label_len = _rand_case(B=2, T=20, V=6, L=4, seed=7)

    t_logits = torch.from_numpy(logits).requires_grad_(True)
    lp = torch.log_softmax(t_logits, dim=-1).transpose(0, 1)
    targets = torch.from_numpy(
        np.concatenate([labels[i, : label_len[i]] for i in range(len(label_len))]))
    loss = torch.nn.CTCLoss(blank=0, reduction="sum")(
        lp, targets, torch.from_numpy(input_len.astype(np.int32)),
        torch.from_numpy(label_len.astype(np.int32))) / logits.shape[0]
    loss.backward()
    want_grad = t_logits.grad.numpy()

    got_grad = np.asarray(jax.grad(
        lambda lg: ctc_loss(lg, jnp.asarray(input_len, dtype=jnp.int32),
                            jnp.asarray(labels), jnp.asarray(label_len, dtype=jnp.int32))
    )(jnp.asarray(logits)))
    np.testing.assert_allclose(got_grad, want_grad, atol=2e-5)


def test_ctc_zero_length_label():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((1, 10, 5)).astype(np.float32)
    ll = ctc_forward_logprob(
        jax.nn.log_softmax(jnp.asarray(logits), axis=-1),
        jnp.asarray([10], dtype=jnp.int32),
        jnp.zeros((1, 3), dtype=jnp.int32),
        jnp.asarray([0], dtype=jnp.int32))
    # all-blank path probability
    want = float(np.sum(np.log(
        np.exp(logits[0]) / np.exp(logits[0]).sum(-1, keepdims=True))[:, 0]))
    assert abs(float(ll[0]) - want) < 1e-4


def test_ctc_labels_from_padded():
    padded = jnp.asarray([[5, 6, -1, -1], [-1, 7, -1, 8]])
    labels, label_len = ctc_labels_from_padded(padded)
    np.testing.assert_array_equal(np.asarray(label_len), [2, 2])
    np.testing.assert_array_equal(np.asarray(labels[0, :2]), [5, 6])
    np.testing.assert_array_equal(np.asarray(labels[1, :2]), [7, 8])
