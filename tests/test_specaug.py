"""SpecAugment on-device behavior tests."""

import numpy as np
import jax
import jax.numpy as jnp

from lasr_tpu.ops.specaug import spec_augment


def _batch(B=3, T=120, F=80, lens=(120, 90, 50), seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, T, F)).astype(np.float32) + 5.0
    for i, l in enumerate(lens):
        x[i, l:] = 0.0
    return jnp.asarray(x), jnp.asarray(lens, dtype=jnp.int32)


def test_specaug_masks_something_and_preserves_padding():
    x, lens = _batch()
    out = spec_augment(x, lens, jax.random.PRNGKey(0))
    out = np.asarray(out)
    assert out.shape == x.shape
    # padding stays exactly zero
    for i, l in enumerate((120, 90, 50)):
        assert np.all(out[i, l:] == 0.0)
    # something changed within the valid region
    assert not np.allclose(out[0, :120], np.asarray(x)[0, :120])


def test_specaug_deterministic_per_key():
    x, lens = _batch(seed=1)
    a = np.asarray(spec_augment(x, lens, jax.random.PRNGKey(7)))
    b = np.asarray(spec_augment(x, lens, jax.random.PRNGKey(7)))
    c = np.asarray(spec_augment(x, lens, jax.random.PRNGKey(8)))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_specaug_zero_fill_mode():
    x, lens = _batch(seed=2)
    out = np.asarray(spec_augment(
        x, lens, jax.random.PRNGKey(3), replace_with_zero=True))
    # masked cells are exactly zero; with mean ~5 input, zeros indicate masks
    n_zero = np.sum(out[0, :120] == 0.0)
    assert n_zero > 0


def test_specaug_no_warp_short_utt():
    # utterance shorter than 2*W frames must pass through the warp unchanged
    x, lens = _batch(B=1, T=20, F=8, lens=(9,), seed=3)
    out = np.asarray(spec_augment(
        x, lens, jax.random.PRNGKey(0),
        max_freq_width=0, n_freq_mask=0, max_time_width=0, n_time_mask=0,
        max_time_warp=5))
    np.testing.assert_allclose(out, np.asarray(x), atol=1e-6)


def test_specaug_transform_string_knobs():
    """The ``specaug:W=..,F=..,mF=..,T=..,mT=..`` transform-string form
    (frontend.py) — the reference SpecAug's constructor knobs
    (datatrans.py), needed when the corpus bandwidth makes the speech
    defaults destructive (narrowband tones lose whole phones to F=27
    freq masks — the round-5 convergence-run diagnosis)."""
    from lasr_tpu.data.frontend import DeviceFrontend
    fe = DeviceFrontend(["norm", "fbank:80", "specaug:F=0,mF=0,T=0,mT=0,W=0"])
    kind, kw = fe._plan[-1]
    assert kind == "specaug"
    assert kw == {"max_freq_width": 0, "n_freq_mask": 0,
                  "max_time_width": 0, "n_time_mask": 0,
                  "max_time_warp": 0}
    # all knobs zeroed -> train-mode frontend equals eval-mode frontend
    import jax.numpy as jnp
    w = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8000)),
                    jnp.float32)
    lens = jnp.asarray([8000])
    f_train, _ = fe(w, lens, key=jax.random.PRNGKey(0), train=True)
    f_eval, _ = fe(w, lens)
    np.testing.assert_allclose(np.asarray(f_train), np.asarray(f_eval),
                               atol=1e-6)
    import pytest
    with pytest.raises(ValueError, match="specaug knob"):
        DeviceFrontend(["fbank:80", "specaug:bogus=3"])
