"""Persistent XLA compilation cache helper.

First compiles of the chunked round / steer programs cost 10-60 s on a
remotely-attached TPU; the persistent cache cuts warm process starts to
sub-second loads.  Call before the first jit executes.
"""
from __future__ import annotations

import os

import jax


def enable_persistent_cache(path: str | None = None,
                            min_compile_secs: float = 1.0) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default:
    $LQRRT_CACHE_DIR or ~/.cache/lqrrt_tpu/xla)."""
    path = path or os.environ.get(
        "LQRRT_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "lqrrt_tpu", "xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return path
