"""Persistent XLA compile cache (first full-pipeline compile is 1-3 min
on TPU; cached reruns dispatch immediately)."""
from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "ADCENSUS_CACHE_DIR",
        os.path.join(
            os.path.dirname(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            ),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
