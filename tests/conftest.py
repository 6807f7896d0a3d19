"""Test harness config: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths are testable without a TPU pod (SURVEY §4 item 4).

Note: the environment's sitecustomize registers a tunneled TPU PJRT plugin
and sets ``jax.config.jax_platforms`` directly, which overrides the
``JAX_PLATFORMS`` env var — so the config must be updated *after* importing
jax. Eager/debug dispatch over the tunnel is orders of magnitude slower than
local CPU, and tests need the 8-device virtual mesh anyway.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
