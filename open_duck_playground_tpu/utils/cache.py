"""JAX persistent compilation cache setup.

Mirrors the reference's compilation-cache config (reference
common/runner.py:45-54) so repeated runs skip the large XLA compiles of the
unrolled physics step.
"""

from __future__ import annotations

import os


def setup_compilation_cache(cache_dir: str = ".tmp/jax_cache") -> None:
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    os.environ["JAX_COMPILATION_CACHE_DIR"] = cache_dir
