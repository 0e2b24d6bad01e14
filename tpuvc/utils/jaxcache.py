"""Persistent XLA compile cache.

First compiles through the axon remote-compile relay take minutes; the
persistent cache makes repeat CLI/bench invocations start hot. Call once
before building any jitted function.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> str:
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            ".jax_cache",
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return cache_dir
