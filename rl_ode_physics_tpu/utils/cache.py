"""Persistent XLA compilation cache.

Compiles through the tunneled TPU backend cost minutes; the persistent cache
makes every re-run (bench, driver checks, repeated server starts) hit disk
instead of recompiling. Safe to call multiple times.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    try:
        platforms = jax.config.jax_platforms or ""
    except Exception:
        platforms = ""
    if platforms.strip() == "cpu":
        # CPU-only runs: XLA:CPU AOT cache entries embed host machine
        # features that vary across processes on this VM — loading a
        # mismatched entry risks SIGILL. The cache only pays off for the
        # slow tunneled-TPU compiles anyway.
        return

    cache_dir = path or os.environ.get("JAX_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax: config names differ; cache is best-effort
