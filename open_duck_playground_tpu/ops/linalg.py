"""Batched small dense symmetric solves for the physics pipeline.

The joint-space inertia M and the Newton Hessian H are (nv, nv) with
nv in {20, 30}; under vmap these become (B, nv, nv) batches. Two backends:

- ``cholesky``: XLA-native `jnp.linalg.cholesky` + triangular solves.
- ``ldl``: fully unrolled LDL^T over the static size (no sqrt), which XLA
  fuses into elementwise chains over the batch dimension.

Default is ``ldl``: XLA:TPU lowers batched `cholesky`/`triangular_solve` of
tiny matrices to While loops with dynamic slices (measured 9.2 ms for a
(4096, 20, 20) solve on v5e vs 1.6 ms for the unrolled LDL, identical
results to 2e-7); the unrolled form fuses into a handful of elementwise
kernels over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BACKEND = "ldl"


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
    """Unrolled LDL^T solve for static trailing size n.

    Jacobi-prescaled: S A S with S = diag(1/sqrt(diag A)) has unit diagonal,
    which keeps the factorization accurate in f32 even for the Newton
    Hessian H = M + J^T D J whose raw condition number (contact D ~ 1e5 vs
    inertia entries ~ 1e-5) otherwise destroys an unpivoted factorization.
    """
    n = A.shape[-1]
    sc = [jax.lax.rsqrt(jnp.maximum(A[..., i, i], 1e-30)) for i in range(n)]
    a = [[A[..., i, j] * sc[i] * sc[j] for j in range(n)] for i in range(n)]
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

    def backsub(rhs):
        z = list(rhs)
        for i in range(n):
            for k in range(i):
                z[i] = z[i] - L[i][k] * z[k]
        for i in range(n):
            z[i] = z[i] * dinv[i]
        for i in range(n - 1, -1, -1):
            for k in range(i + 1, n):
                z[i] = z[i] - L[k][i] * z[k]
        return z

    # solve in the scaled system: (S A S) y = S b, x = S y
    bs = [b[..., i] * sc[i] for i in range(n)]
    y = backsub(bs)
    return jnp.stack([y[i] * sc[i] for i in range(n)], axis=-1)
