"""JAX persistent compilation cache setup.

Mirrors the reference's compilation-cache config (reference
common/runner.py:45-54) so repeated runs skip the large XLA compiles of the
unrolled physics step.
"""

from __future__ import annotations

import os


def setup_compilation_cache(cache_dir: str = ".tmp/jax_cache") -> None:
    import jax

    # XLA:CPU AOT cache entries record the *compile-time* machine-feature
    # string, which includes compiler preferences (+prefer-no-scatter,
    # +prefer-no-gather) that never appear in the host-detected feature
    # list, so reloads warn "could lead to SIGILL". Verified on this image
    # (round 2): the actual ISA features match, cached executables reload
    # and produce bit-identical trajectories (tests/test_physics.py
    # fixtures, 60 s compile -> 12 s reload). DUCK_NO_CPU_CACHE=1 opts out
    # if a host ever genuinely mismatches.
    # default_backend() itself initializes the backend and can raise when
    # the TPU tunnel is held by another process (round-1 BENCH crash) —
    # never let cache setup take the process down.
    try:
        backend = jax.default_backend()
    except Exception:
        return
    if backend == "cpu" and os.environ.get("DUCK_NO_CPU_CACHE") == "1":
        return
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    os.environ["JAX_COMPILATION_CACHE_DIR"] = cache_dir
