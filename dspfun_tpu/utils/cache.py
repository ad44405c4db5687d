"""Persistent compilation cache — the FFTW-wisdom analogue.

The reference persists FFTW plans via wisdom files
(motion/motion.c:518-519,556-557 --fftw-wisdom-file).  The TPU
counterpart is XLA's persistent compilation cache: motion maps
``--fftw-wisdom-file <file>`` onto a cache directory so repeat runs
with the same block geometry skip recompilation.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_enabled: str | None = None


def enable_compilation_cache(path: str) -> None:
    """Point JAX's persistent compilation cache at ``path`` (a file
    path's directory, or a directory)."""
    global _enabled
    import jax  # noqa: PLC0415

    if os.path.isdir(path):
        cache_dir = path
    elif path.endswith("cache") and not os.path.exists(path):
        cache_dir = path  # treat a cache-suffixed non-file as a dir name
    else:
        # a (possibly existing) wisdom FILE path: cache beside it
        cache_dir = os.path.join(os.path.dirname(path) or ".",
                                 ".dspfun-xla-cache")
    os.makedirs(cache_dir, exist_ok=True)
    if _enabled == cache_dir:
        return
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _enabled = cache_dir
