"""Persistent XLA compilation cache.

The fused boosting round is one large XLA program; its first compile for
a given shape class costs minutes on TPU. Enabling JAX's persistent cache
makes every later process (reruns, benchmarks, CV drivers) reuse the
compiled executable. Off only when RANKLIB_TPU_NO_CACHE is set.
"""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    if os.environ.get("RANKLIB_TPU_NO_CACHE"):
        return
    import jax

    path = os.environ.get(
        "RANKLIB_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "ranklib_tpu_xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:           # cache is best-effort, never fatal
        pass
