"""Persistent XLA compilation cache setup.

This environment compiles TPU programs through a remote relay where
large training steps take minutes; the persistent cache makes repeat
compiles (re-runs, resumed training, CLI invocations) near-instant
(measured 4.1 s → 1.2 s cross-process for a mid-size program). Safe to
call unconditionally — it only sets config, before or after jax import,
as long as no program has been compiled yet.
"""
from __future__ import annotations

import os


def enable_compilation_cache(directory: str | None = None) -> str:
    import jax

    directory = directory or os.environ.get(
        "IMT_COMPILE_CACHE", os.path.expanduser("~/.cache/imt_jax_cache")
    )
    os.makedirs(directory, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax naming
        pass
    return directory
