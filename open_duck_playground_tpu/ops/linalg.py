"""Batched small dense symmetric solves for the physics pipeline.

The joint-space inertia M and the Newton Hessian H are (nv, nv) with
nv in {20, 30}; under vmap these become (B, nv, nv) batches. Two backends:

- ``cholesky``: XLA-native `jnp.linalg.cholesky` + triangular solves.
- ``ldl``: fully unrolled LDL^T over the static size (no sqrt), which XLA
  fuses into elementwise chains over the batch dimension. Useful when the
  native cholesky lowering underperforms for tiny matrices.

Selected via `set_backend` (default cholesky); benchmarked in bench.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BACKEND = "cholesky"


def set_backend(name: str) -> None:
    global _BACKEND
    assert name in ("cholesky", "ldl")
    _BACKEND = name


def solve_psd(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b for symmetric positive-definite A (..., n, n)."""
    if _BACKEND == "cholesky":
        L = jnp.linalg.cholesky(A)
        y = jax.scipy.linalg.solve_triangular(L, b[..., None], lower=True)
        x = jax.scipy.linalg.solve_triangular(
            L, y, lower=True, trans="T"
        )
        return x[..., 0]
    return _ldl_solve(A, b)


def _ldl_solve(A: jax.Array, b: jax.Array) -> jax.Array:
    """Unrolled LDL^T solve for static trailing size n."""
    n = A.shape[-1]
    a = [[A[..., i, j] for j in range(n)] for i in range(n)]
    L = [[None] * n for _ in range(n)]
    d = [None] * n
    dinv = [None] * n
    for j in range(n):
        s = a[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k] * d[k]
        d[j] = s
        dinv[j] = 1.0 / s
        for i in range(j + 1, n):
            t = a[i][j]
            for k in range(j):
                t = t - L[i][k] * L[j][k] * d[k]
            L[i][j] = t * dinv[j]
    # forward substitution L z = b
    z = [b[..., i] for i in range(n)]
    for i in range(n):
        for k in range(i):
            z[i] = z[i] - L[i][k] * z[k]
    # diagonal
    for i in range(n):
        z[i] = z[i] * dinv[i]
    # backward substitution L^T x = z
    for i in range(n - 1, -1, -1):
        for k in range(i + 1, n):
            z[i] = z[i] - L[k][i] * z[k]
    return jnp.stack(z, axis=-1)
