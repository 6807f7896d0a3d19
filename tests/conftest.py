"""Test harness config: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths are testable without a TPU pod (SURVEY §4 item 4).
Must run before the first ``import jax`` anywhere in the test session.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
