"""Newton constraint solver with Newton-on-alpha linesearch.

Solves the convex acceleration-level problem MuJoCo defines:

    min_qacc  0.5 (qacc - qacc_smooth)^T M (qacc - qacc_smooth)
              + sum_i cost_i(J_i qacc - aref_i)

where unilateral rows (limits, contacts) cost 0.5 D x^2 for x < 0 (and the
row exists, pos < 0), and dof-friction rows cost a Huber function saturating
at the frictionloss bound. Configured like the reference scenes:
iterations=1, ls_iterations=5 (open_duck_mini_v2.xml:6).

Static shapes throughout; the batch dimension comes from vmap outside.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from open_duck_playground_tpu.ops import linalg
from open_duck_playground_tpu.ops.constraint import Efc
from open_duck_playground_tpu.ops.types import Model

_TINY = 1e-12


def _force_and_hessian_mask(efc: Efc, Jaref: jax.Array):
    """Per-row force f(x) and whether the row is in its quadratic zone."""
    exists = efc.pos < 0.0
    quad_active = efc.is_quad & exists & (Jaref < 0.0)
    Dx = efc.D * Jaref
    inside = efc.is_friction & (jnp.abs(Dx) <= efc.floss)
    f = jnp.where(quad_active, -Dx, 0.0)
    f = jnp.where(efc.is_friction, -jnp.clip(Dx, -efc.floss, efc.floss), f)
    hess_mask = quad_active | inside
    return f, hess_mask


def _cost(efc: Efc, Jaref: jax.Array, gauss: jax.Array) -> jax.Array:
    """Total primal cost: Gauss term + per-row constraint costs.

    Matches MuJoCo's mj_constraintUpdate cost used by the Newton warmstart
    comparison: quadratic rows cost 0.5 D x^2 when active, frictionloss rows
    cost the Huber function saturating at floss.
    """
    exists = efc.pos < 0.0
    quad_active = efc.is_quad & exists & (Jaref < 0.0)
    Dx = efc.D * Jaref
    inside = jnp.abs(Dx) <= efc.floss
    quad = 0.5 * efc.D * Jaref * Jaref
    huber = jnp.where(
        inside, quad, efc.floss * jnp.abs(Jaref) - 0.5 * efc.floss * efc.floss / efc.D
    )
    c = jnp.where(quad_active, quad, 0.0)
    c = jnp.where(efc.is_friction, huber, c)
    return gauss + jnp.sum(c, axis=-1)


def solve(
    m: Model,
    M: jax.Array,
    qacc_smooth: jax.Array,
    efc: Efc,
    warmstart: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (qacc, qfrc_constraint).

    `warmstart` is the previous step's qacc: like MuJoCo's Newton solver
    (engine_solver.c warmstart logic, enabled by default), the start point is
    whichever of {warmstart, qacc_smooth} has lower primal cost. At the
    reference's iterations=1 (open_duck_mini_v2.xml:6) the start point
    dominates the answer, so this is required for MuJoCo trace parity.
    """
    if efc.J.shape[0] == 0:
        return qacc_smooth, jnp.zeros_like(qacc_smooth)

    qacc = qacc_smooth
    if warmstart is not None:
        Jaref_ws = efc.J @ warmstart - efc.aref
        Jaref_sm = efc.J @ qacc_smooth - efc.aref
        dws = warmstart - qacc_smooth
        gauss_ws = 0.5 * dws @ (M @ dws)
        cost_ws = _cost(efc, Jaref_ws, gauss_ws)
        cost_sm = _cost(efc, Jaref_sm, jnp.zeros((), qacc.dtype))
        qacc = jnp.where(cost_ws < cost_sm, warmstart, qacc_smooth)
    Jaref = efc.J @ qacc - efc.aref

    for _ in range(max(1, m.opt.iterations)):
        f, hess_mask = _force_and_hessian_mask(efc, Jaref)
        # grad = M (qacc - qacc_smooth) - J^T f
        Ma_err = M @ (qacc - qacc_smooth)
        grad = Ma_err - efc.J.T @ f
        # H = M + J^T diag(D * hess_mask) J
        w = efc.D * hess_mask
        H = M + (efc.J * w[:, None]).T @ efc.J
        direction = -linalg.solve_psd(H, grad)

        # --- linesearch on alpha (piecewise-quadratic 1D objective) ---
        # The objective along `direction` is piecewise quadratic (rows change
        # state at breakpoints), so a raw Newton iteration on alpha can
        # overshoot badly when a saturated friction row contributes slope but
        # no curvature. We bracket the minimum (phi' sign change) and run
        # safeguarded Newton/bisection, ls_iterations refinement steps.
        Jd = efc.J @ direction
        Md = M @ direction
        smooth_b = direction @ Ma_err  # phi_s'(0)
        smooth_a = direction @ Md  # phi_s''
        exists = efc.pos < 0.0

        def dphi(alpha):
            # alpha may be scalar or (K,): broadcast over trailing row axis
            x = Jaref + alpha[..., None] * Jd if jnp.ndim(alpha) else Jaref + alpha * Jd
            quad_active = efc.is_quad & exists & (x < 0.0)
            Dx = efc.D * x
            inside = efc.is_friction & (jnp.abs(Dx) <= efc.floss)
            saturated = efc.is_friction & ~inside
            act = quad_active | inside
            d1 = (
                smooth_b
                + smooth_a * alpha
                + jnp.sum(efc.D * x * Jd * act, axis=-1)
                + jnp.sum(efc.floss * jnp.sign(x) * Jd * saturated, axis=-1)
            )
            d2 = smooth_a + jnp.sum(efc.D * Jd * Jd * act, axis=-1)
            return d1, d2

        d1_0, d2_0 = dphi(jnp.zeros((), qacc.dtype))
        descent = d1_0 < 0.0
        # expand hi until phi'(hi) >= 0: evaluate all 8 doublings at once
        # (one fused pass instead of 8 sequential dphi kernels)
        hi0 = jnp.where(
            d2_0 > _TINY, -d1_0 / jnp.maximum(d2_0, _TINY), jnp.ones((), qacc.dtype)
        )
        hi0 = jnp.maximum(hi0, 1e-8)
        cand = hi0 * (2.0 ** jnp.arange(8, dtype=qacc.dtype))
        d1_cand, _ = dphi(cand)
        still_neg = jnp.cumprod((d1_cand < 0.0).astype(qacc.dtype))
        hi = hi0 * 2.0 ** jnp.sum(still_neg)
        lo = jnp.zeros((), qacc.dtype)
        alpha = 0.5 * (lo + hi)
        for _ls in range(max(1, m.opt.ls_iterations)):
            d1_a, d2_a = dphi(alpha)
            lo = jnp.where(d1_a < 0.0, alpha, lo)
            hi = jnp.where(d1_a >= 0.0, alpha, hi)
            newton = alpha - d1_a / jnp.maximum(d2_a, _TINY)
            mid = 0.5 * (lo + hi)
            alpha = jnp.where((newton > lo) & (newton < hi) & (d2_a > _TINY), newton, mid)
        alpha = jnp.where(descent, alpha, 0.0)

        qacc = qacc + alpha * direction
        Jaref = Jaref + alpha * Jd

    f, _ = _force_and_hessian_mask(efc, Jaref)
    qfrc_constraint = efc.J.T @ f
    return qacc, qfrc_constraint
