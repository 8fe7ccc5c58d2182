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


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (best-effort).

    Segment-structured drivers (tools/convergence_run.py) relaunch
    ``bin/train.py`` / ``bin/decode.py`` per segment; without a persistent
    cache each process pays the full XLA compile again (~100-350 s for the
    recipe train step on the tunneled chip).  The cache makes segment 2+
    start in seconds.  Off unless LASR_COMPILATION_CACHE is set (the CLIs
    export no default: cache serialization on the experimental axon
    platform is best-effort, so opt-in per run).
    """
    path = path or os.environ.get("LASR_COMPILATION_CACHE")
    if not path:
        return
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - cache is never load-bearing
        # A dead cache silently re-pays multi-minute compiles per relaunch;
        # make the cause visible in the train/decode logs.
        import logging
        logging.getLogger("lasr_tpu").warning(
            "compilation cache disabled (%s: %s) — run continues uncached",
            path, e)
