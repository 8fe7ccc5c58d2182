"""Test config: run everything on an 8-device virtual CPU mesh.

This is the JAX-native "fake backend" for validating data-parallel sharding
without a TPU pod (SURVEY.md §4): XLA's host platform is forced to expose 8
devices so mesh/pjit tests exercise real collectives.

Note: this image's sitecustomize registers the axon TPU plugin and pins
``jax_platforms`` via ``jax.config`` (which outranks the env var), so we
must override through ``jax.config`` as well — before any backend is used.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
