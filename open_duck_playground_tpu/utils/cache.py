"""JAX persistent compilation cache setup.

Mirrors the reference's compilation-cache config (reference
common/runner.py:45-54) so repeated runs skip the large XLA compiles of the
unrolled physics step.
"""

from __future__ import annotations

import os


def setup_compilation_cache(cache_dir: str = ".tmp/jax_cache") -> None:
    import jax

    # The XLA:CPU AOT cache in this image records machine features that
    # mismatch the execution host (observed "+prefer-no-scatter ... could
    # lead to SIGILL" warnings followed by real crashes in the thunk
    # executor), so the persistent cache is only safe for TPU backends.
    # default_backend() itself initializes the backend and can raise when
    # the TPU tunnel is held by another process (round-1 BENCH crash) —
    # never let cache setup take the process down.
    try:
        if jax.default_backend() == "cpu":
            return
    except Exception:
        return
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    os.environ["JAX_COMPILATION_CACHE_DIR"] = cache_dir
