"""Test harness: run JAX on CPU with 8 virtual devices so sharding tests
work without TPU hardware and tiny test ops don't tunnel to a remote chip.

The environment pre-registers a TPU backend (JAX_PLATFORMS=axon) via
sitecustomize before pytest starts, so we must override the platform through
jax.config — plain environ edits are too late.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
