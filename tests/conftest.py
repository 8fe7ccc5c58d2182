"""Test config: run everything on an 8-device virtual CPU mesh.

This is the JAX-native "fake backend" for validating data-parallel sharding
without a TPU pod (SURVEY.md §4): XLA's host platform is forced to expose 8
devices so mesh/pjit tests exercise real collectives.

Two environment quirks this file must handle:

1. This image's sitecustomize registers the axon TPU PJRT plugin and pins
   ``jax_platforms`` via ``jax.config`` (which outranks the env var), so we
   override through ``jax.config`` as well — before any backend is used.

2. When the interpreter STARTS with ``JAX_PLATFORMS=axon`` (the image
   default), the sitecustomize's eager plugin initialization perturbs
   XLA:CPU numerics in-process: the same f32 flax forward differs by
   ~3e-3 from a ``JAX_PLATFORMS=cpu``-started process on identical
   weights/inputs (torch outputs are bit-identical in both, and
   jax.config is identical — it is the loaded .so changing codegen/libm
   symbol resolution, not our code).  The torch-parity gates assert
   ~1e-5 tolerances, so the suite must run in a clean-CPU process:
   ``pytest_configure`` re-execs pytest with the env var set (restoring
   pytest's fd capture first so output still reaches the terminal).
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

_CLEAN = os.environ.get("JAX_PLATFORMS") == "cpu"

if _CLEAN:
    import jax

    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    if _CLEAN:
        return
    capman = config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], os.environ)
