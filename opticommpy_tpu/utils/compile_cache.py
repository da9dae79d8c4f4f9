"""Persistent XLA compilation cache helper.

Big one-jit chains (adaptive equalizer scans, SSFM while_loops) can take
minutes to compile cold; enabling JAX's persistent compilation cache makes
every later process load them in seconds. The reference has no compilation
step at all (Numba caches per-function machine code transparently); this is
the framework-level equivalent.
"""

import os

import jax

__all__ = ["enable_persistent_cache"]


def enable_persistent_cache(path=None, min_compile_secs=5.0):
    """Cache compiled XLA programs on disk across processes.

    Parameters
    ----------
    path : cache directory (default ``~/.cache/opticommpy_tpu/xla``).
    min_compile_secs : only persist programs that took at least this long
        to compile (keeps the cache small).
    """
    if path is None:
        base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
            os.path.expanduser("~"), ".cache")
        path = os.path.join(base, "opticommpy_tpu", "xla")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_secs))
    return path
