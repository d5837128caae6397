"""Persistent XLA compilation cache.

TPU compiles on this runtime go through a remote helper at tens of seconds
per program and are not cached across processes by default.  Enabling
JAX's persistent compilation cache makes repeat CLI/bench invocations
near-instant.  Safe no-op where unsupported.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> bool:
    try:
        import jax

        path = cache_dir or os.path.join(os.path.expanduser("~"), ".cache", "qc_tpu_xla")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        return True
    except Exception:
        return False
