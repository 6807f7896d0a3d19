"""Persistent XLA compilation cache.

The reference recompiles nothing (CUDA kernels are AOT, `CMakeLists.txt:85`);
on TPU every new (shape, config) traces and compiles through the tunnel —
~10 minutes at 2M particles. One config flag makes that a one-time cost:
compiled executables are cached on disk keyed by HLO + compile options, so
every later bench/CLI invocation with the same shapes loads in seconds.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/nereus_tpu_xla")


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache (idempotent).

    Safe to call before or after backend init. Returns the cache dir.
    Honors ``NEREUS_CACHE_DIR``; set it to ``0``/``off`` to disable.
    """
    import jax

    env = os.environ.get("NEREUS_CACHE_DIR", "")
    if env.lower() in ("0", "off", "none", "disable"):
        return ""
    path = cache_dir or env or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything that takes noticeable time; the default 1 s floor
    # would skip mid-sized kernels that still cost seconds over the tunnel.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
