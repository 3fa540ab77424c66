"""Constraint row assembly: dof friction, joint limits, pyramidal contacts.

Produces a static-shape dense efc system (J, D, aref, pos, frictionloss)
following MuJoCo's constraint model (solref/solimp impedances, reference
scenes use all defaults: solref=(0.02, 1), solimp=(0.9, 0.95, 0.001, 0.5, 2),
pyramidal cone, condim 3 on the floor, scene_flat_terrain.xml:37).

Row order: [dof friction] [joint limits] [contact pyramid rows].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from open_duck_playground_tpu.ops import math3d as m3
from open_duck_playground_tpu.ops import smooth
from open_duck_playground_tpu.ops.types import Contact, Model

_MINVAL = 1e-10


class Efc(NamedTuple):
    J: jax.Array  # (nefc, nv)
    D: jax.Array  # (nefc,)
    aref: jax.Array  # (nefc,)
    pos: jax.Array  # (nefc,)  (<= 0 means violated; friction rows: 0)
    floss: jax.Array  # (nefc,) friction loss bound (0 for non-friction rows)
    is_friction: jax.Array  # (nefc,) bool
    is_quad: jax.Array  # (nefc,) bool (limits + contacts: unilateral)


def kbi(solref: jax.Array, solimp: jax.Array, pos: jax.Array):
    """MuJoCo stiffness/damping/impedance from solver parameters.

    Returns (k, b, imp) with k = 1/(dmax^2 tc^2 dr^2), b = 2/(dmax tc) and
    imp the position-dependent impedance interpolated through solimp.
    """
    timeconst, dampratio = solref[..., 0], solref[..., 1]
    dmin, dmax, width, mid, power = (solimp[..., i] for i in range(5))
    dmin = jnp.clip(dmin, _MINVAL, 0.9999)
    dmax = jnp.clip(dmax, _MINVAL, 0.9999)
    k = 1.0 / jnp.maximum(dmax * dmax * timeconst * timeconst * dampratio * dampratio, _MINVAL)
    b = 2.0 / jnp.maximum(dmax * timeconst, _MINVAL)
    # negative solref means direct (stiffness, damping) specification
    k = jnp.where(timeconst <= 0, -timeconst / (dmax * dmax), k)
    b = jnp.where(dampratio <= 0, -dampratio / dmax, b)

    x = jnp.abs(pos) / jnp.maximum(width, _MINVAL)
    power = jnp.maximum(power, 1.0)
    y_low = (x ** power) * (mid ** (1.0 - power))
    y_high = 1.0 - ((1.0 - x) ** power) * ((1.0 - mid) ** (1.0 - power))
    y = jnp.where(x < mid, y_low, y_high)
    imp = dmin + y * (dmax - dmin)
    imp = jnp.where(x >= 1.0, dmax, imp)
    imp = jnp.clip(imp, dmin, dmax)
    return k, b, imp


def _combine_pair_params(m: Model, p: int):
    """Contact parameters for static pair p with MuJoCo's priority rule."""
    g1, g2 = int(m.pair_geom1[p]), int(m.pair_geom2[p])
    p1, p2 = int(m.geom_priority[g1]), int(m.geom_priority[g2])
    if p1 > p2:
        fri = m.geom_friction[g1]
        solref = m.geom_solref[g1]
        solimp = m.geom_solimp[g1]
    elif p2 > p1:
        fri = m.geom_friction[g2]
        solref = m.geom_solref[g2]
        solimp = m.geom_solimp[g2]
    else:
        fri = jnp.maximum(m.geom_friction[g1], m.geom_friction[g2])
        solref = 0.5 * (m.geom_solref[g1] + m.geom_solref[g2])
        solimp = 0.5 * (m.geom_solimp[g1] + m.geom_solimp[g2])
    return fri, solref, solimp


def make_efc(
    m: Model,
    qvel: jax.Array,
    qpos: jax.Array,
    contact: Contact,
    cdof: jax.Array,
    subtree_com: jax.Array,
) -> Efc:
    dtype = qvel.dtype
    rows_J = []
    rows_D = []
    rows_aref = []
    rows_pos = []
    rows_floss = []
    n_fri = 0
    n_lim = 0

    # ---- dof friction rows (reference: sts3215 frictionloss=0.068) ----
    fri_dofs = [i for i in range(m.nv) if bool(m.dof_hasfrictionloss[i])]
    for i in fri_dofs:
        e = np.zeros(m.nv, np.float32)
        e[i] = 1.0
        J = jnp.asarray(e)
        k, b, imp = kbi(m.dof_solref[i], m.dof_solimp[i], jnp.zeros((), dtype))
        R = jnp.maximum(_MINVAL, (1.0 - imp) / imp * m.dof_invweight0[i])
        rows_J.append(J)
        rows_D.append(1.0 / R)
        rows_aref.append(-b * qvel[i])
        rows_pos.append(jnp.zeros((), dtype))
        rows_floss.append(m.dof_frictionloss[i])
        n_fri += 1

    # ---- joint limit rows ----
    lim_jnts = [j for j in range(m.njnt) if bool(m.jnt_limited[j])]
    for j in lim_jnts:
        qadr, dofadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
        q = qpos[qadr]
        lo, hi = m.jnt_range[j, 0], m.jnt_range[j, 1]
        dist_lo = q - lo
        dist_hi = hi - q
        dist = jnp.minimum(dist_lo, dist_hi)
        side = jnp.where(dist_lo < dist_hi, 1.0, -1.0).astype(dtype)
        e = np.zeros(m.nv, np.float32)
        e[dofadr] = 1.0
        J = side * jnp.asarray(e)
        pos = dist - m.jnt_margin[j]
        k, b, imp = kbi(m.jnt_solref[j], m.jnt_solimp[j], pos)
        R = jnp.maximum(_MINVAL, (1.0 - imp) / imp * m.dof_invweight0[dofadr])
        rows_J.append(J)
        rows_D.append(1.0 / R)
        rows_aref.append(-b * (side * qvel[dofadr]) - k * imp * pos)
        rows_pos.append(pos)
        rows_floss.append(jnp.zeros((), dtype))
        n_lim += 1

    # ---- contact rows (pyramidal, condim 3 -> 4 rows per candidate) ----
    ci = 0
    for p in range(m.npair):
        g1, g2 = int(m.pair_geom1[p]), int(m.pair_geom2[p])
        b1, b2 = int(m.geom_bodyid[g1]), int(m.geom_bodyid[g2])
        fri, solref, solimp = _combine_pair_params(m, p)
        mu = fri[0]
        invweight = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
        diag = invweight + mu * mu * invweight
        diag = diag * 2.0 * mu * mu / m.opt.impratio
        diag = jnp.maximum(diag, _MINVAL)
        for c in range(4):
            idx = p * 4 + c
            pos_c = contact.dist[idx]
            point = contact.pos[idx]
            frame = contact.frame[idx]
            jacp1, _ = smooth.jac_point(m, cdof, subtree_com, point, b1)
            jacp2, _ = smooth.jac_point(m, cdof, subtree_com, point, b2)
            djac = jacp2 - jacp1  # (nv, 3)
            Jn = djac @ frame[0]
            Jt1 = djac @ frame[1]
            Jt2 = djac @ frame[2]
            k, b, imp = kbi(solref, solimp, jnp.minimum(pos_c, 0.0))
            R = jnp.maximum(_MINVAL, (1.0 - imp) / imp * diag)
            D = 1.0 / R
            for Jrow in (Jn + mu * Jt1, Jn - mu * Jt1, Jn + mu * Jt2, Jn - mu * Jt2):
                rows_J.append(Jrow)
                rows_D.append(D)
                rows_aref.append(-b * (Jrow @ qvel) - k * imp * jnp.minimum(pos_c, 0.0))
                rows_pos.append(pos_c)
                rows_floss.append(jnp.zeros((), dtype))
            ci += 1

    nefc = len(rows_J)
    if nefc == 0:
        z = jnp.zeros((0,), dtype)
        return Efc(jnp.zeros((0, m.nv), dtype), z, z, z, z,
                   jnp.zeros((0,), bool), jnp.zeros((0,), bool))

    J = jnp.stack(rows_J).astype(dtype)
    D = jnp.stack(rows_D).astype(dtype)
    aref = jnp.stack(rows_aref).astype(dtype)
    pos = jnp.stack(rows_pos).astype(dtype)
    floss = jnp.stack(rows_floss).astype(dtype)
    is_friction = jnp.asarray(
        np.arange(nefc) < n_fri
    )
    is_quad = jnp.asarray(np.arange(nefc) >= n_fri)
    return Efc(J, D, aref, pos, floss, is_friction, is_quad)
