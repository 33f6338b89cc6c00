"""Persistent XLA compilation cache, shared by every entry point (CLI,
bench.py, __graft_entry__.py).

Once primed, a previously compiled graph loads in ~40 ms instead of
recompiling — a fresh chain config can cost minutes of XLA compile on a
contended compile service.  Default location ``~/.cache/f9tpu/xla``;
override with ``F9TPU_COMPILE_CACHE=/path`` or disable with ``=off``.
"""

from __future__ import annotations

import os

__all__ = ["enable_compile_cache"]


def enable_compile_cache() -> None:
    spec = os.environ.get("F9TPU_COMPILE_CACHE", "")
    if spec.lower() in ("off", "0", "none"):
        return
    path = spec or os.path.expanduser("~/.cache/f9tpu/xla")
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        min_secs = float(os.environ.get("F9TPU_COMPILE_CACHE_MIN_SECS", "1.0"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_secs)
    except Exception:
        pass       # the cache is an optimisation; never block the run on it
