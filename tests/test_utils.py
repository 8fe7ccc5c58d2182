"""Registry/config, masks, and text-metric tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from lasr_tpu.utils.registry import BaseConfig, Register, dynamic_import
from lasr_tpu.utils.masks import (
    make_pad_mask, make_non_pad_mask, subsequent_mask, target_mask,
    chunk_attention_mask)
from lasr_tpu.utils.text import edit_distance, align_ops, ErrorRateAccumulator, greedy_ctc_tokens


class Dummy:
    def __init__(self, a, b=2):
        self.a, self.b = a, b


def test_dynamic_import():
    cls = dynamic_import("tests.test_utils:Dummy")
    assert cls is Dummy
    with pytest.raises(ValueError):
        dynamic_import("no_colon_path")
    assert dynamic_import("d", alias={"d": "tests.test_utils:Dummy"}) is Dummy


def test_baseconfig_instantiate_and_override():
    cfg = BaseConfig(name="tests.test_utils:Dummy", kwargs={"a": 1, "b": 3})
    obj = cfg.generateExample()
    assert (obj.a, obj.b) == (1, 3)
    # call-site kwargs override YAML kwargs (reference generater.py:43-50)
    obj2 = cfg.generateExample(b=9)
    assert (obj2.a, obj2.b) == (1, 9)


def test_baseconfig_rejects_unknown_kwargs():
    with pytest.raises(ValueError):
        BaseConfig(name="tests.test_utils:Dummy", kwargs={"a": 1, "zzz": 0})


def test_baseconfig_none():
    assert BaseConfig(name=None).generateExample() is None
    assert BaseConfig(name="None").generateExample() is None


def test_register():
    reg = Register()

    @reg.register("foo")
    def f():
        return 1

    @reg.register
    def g():
        return 2

    assert reg["foo"]() == 1
    assert reg["g"]() == 2
    assert "foo" in reg and "nope" not in reg


def test_make_pad_mask():
    m = np.asarray(make_pad_mask(jnp.asarray([5, 3, 2]), 5))
    want = np.array([[0, 0, 0, 0, 0], [0, 0, 0, 1, 1], [0, 0, 1, 1, 1]], bool)
    np.testing.assert_array_equal(m, want)
    np.testing.assert_array_equal(
        np.asarray(make_non_pad_mask(jnp.asarray([5, 3, 2]), 5)), ~want)


def test_subsequent_and_target_mask():
    np.testing.assert_array_equal(
        np.asarray(subsequent_mask(3)),
        np.array([[1, 0, 0], [1, 1, 0], [1, 1, 1]], bool))
    ys = jnp.asarray([[1, 7, 2], [1, 2, -1]])
    tm = np.asarray(target_mask(ys, ignore_id=-1))
    assert tm.shape == (2, 3, 3)
    np.testing.assert_array_equal(
        tm[1], np.array([[1, 0, 0], [1, 1, 0], [1, 1, 0]], bool))


def test_chunk_attention_mask():
    m = np.asarray(chunk_attention_mask(6, 2))
    # frames 0,1 in chunk 0; 2,3 in chunk 1; etc.
    assert m[0, 1] and m[1, 0]          # same-chunk lookahead allowed
    assert not m[1, 2]                  # future chunk masked
    assert m[4, 0]                      # unlimited left context
    m2 = np.asarray(chunk_attention_mask(6, 2, left_chunks=1))
    assert not m2[4, 1] and m2[4, 2]    # only 1 left chunk kept


def test_edit_distance_and_wer():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], [1, 2]) == 2
    assert align_ops("abc", "axc") == (1, 0, 0)
    assert align_ops("abc", "ac") == (0, 1, 0)
    assert align_ops("ac", "abc") == (0, 0, 1)
    acc = ErrorRateAccumulator()
    acc.add("abc", "axc")
    acc.add("ab", "ab")
    assert acc.errors == 1 and acc.tokens == 5
    assert "20.00%" in acc.report()


def test_greedy_ctc_tokens():
    assert greedy_ctc_tokens([0, 1, 1, 0, 2, 2, 2, 0, 1]) == [1, 2, 1]
    assert greedy_ctc_tokens([0, 0, 0]) == []
