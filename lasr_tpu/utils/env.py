"""Environment plumbing helpers."""

import os


def respect_jax_platforms_env() -> None:
    """Re-assert the JAX_PLATFORMS env var through jax.config.

    Some images (including this one) ship a sitecustomize that registers a
    TPU PJRT plugin and pins ``jax_platforms`` via ``jax.config`` at
    interpreter start, which outranks the environment variable.  CLIs call
    this so ``JAX_PLATFORMS=cpu python bin/train.py ...`` behaves as
    documented.
    """
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax
        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
