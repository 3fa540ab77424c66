"""Smooth (unconstrained) dynamics: kinematics, com quantities, CRB, RNE.

Implements MuJoCo's smooth-dynamics semantics (the part the reference gets
from `mujoco.mjx` via `mjx_env.step`, reference joystick.py:420) from first
principles, structured for TPU: one pure function per stage, python loops
over the (static, small) body tree unroll at trace time, and every array op
vectorizes over the env batch under vmap.

Spatial vectors are (angular, linear) at the root-subtree-com origin in
world orientation (see ops.math3d).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from open_duck_playground_tpu.ops import math3d as m3
from open_duck_playground_tpu.ops.types import Data, JointType, Model


def kinematics(m: Model, qpos: jax.Array):
    """Forward kinematics.

    Returns: xpos (nbody,3), xquat (nbody,4), xmat (nbody,3,3),
             xanchor (njnt,3), xaxis (njnt,3)
    Hinge angles are measured relative to qpos0 (MuJoCo semantics: the
    reference pose is the XML pose; domain randomization of qpos0 shifts the
    joint zero, reference randomize.py:78-86).
    """
    dtype = qpos.dtype
    xpos = [jnp.zeros(3, dtype)]
    xquat = [jnp.array([1.0, 0, 0, 0], dtype)]
    xanchor = [None] * m.njnt
    xaxis = [None] * m.njnt

    for b in range(1, m.nbody):
        p = int(m.body_parentid[b])
        pos = xpos[p] + m3.quat_rot(xquat[p], m.body_pos[b])
        quat = m3.quat_mul(xquat[p], m.body_quat[b])
        jadr, jnum = int(m.body_jntadr[b]), int(m.body_jntnum[b])
        for j in range(jadr, jadr + jnum):
            jtype = int(m.jnt_type[j])
            qadr = int(m.jnt_qposadr[j])
            if jtype == JointType.FREE:
                pos = qpos[qadr : qadr + 3]
                quat = m3.normalize(qpos[qadr + 3 : qadr + 7])
                xanchor[j] = pos
                xaxis[j] = m3.quat_rot(quat, m.jnt_axis[j])
            elif jtype == JointType.HINGE:
                angle = qpos[qadr] - m.qpos0[qadr]
                anchor = pos + m3.quat_rot(quat, m.jnt_pos[j])
                qloc = m3.axis_angle_to_quat(m.jnt_axis[j], angle)
                quat = m3.quat_mul(quat, qloc)
                quat = m3.normalize(quat)
                pos = anchor - m3.quat_rot(quat, m.jnt_pos[j])
                xanchor[j] = anchor
                xaxis[j] = m3.quat_rot(quat, m.jnt_axis[j])
            else:
                raise NotImplementedError(f"joint type {jtype}")
        xpos.append(pos)
        xquat.append(quat)

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = m3.quat_to_mat(xquat)
    xanchor = jnp.stack([a if a is not None else jnp.zeros(3, dtype) for a in xanchor])
    xaxis = jnp.stack([a if a is not None else jnp.array([0.0, 0, 1], dtype) for a in xaxis])
    return xpos, xquat, xmat, xanchor, xaxis


def site_kinematics(m: Model, xpos, xquat):
    """World pose of all sites."""
    bid = m.site_bodyid.np
    spos = xpos[bid] + m3.quat_rot(xquat[bid], m.site_pos)
    squat = m3.quat_mul(xquat[bid], m.site_quat)
    return spos, m3.quat_to_mat(squat)


def geom_kinematics(m: Model, xpos, xquat):
    bid = m.geom_bodyid.np
    gpos = xpos[bid] + m3.quat_rot(xquat[bid], m.geom_pos)
    gquat = m3.quat_mul(xquat[bid], m.geom_quat)
    return gpos, m3.quat_to_mat(gquat)


def com_pos(m: Model, xpos, xquat, xmat, xanchor, xaxis):
    """Center-of-mass based quantities: subtree_com, cinert (6x6), cdof.

    All spatial quantities are expressed at each kinematic tree's root
    subtree com (MuJoCo's "c-frame").
    """
    dtype = xpos.dtype
    xipos = xpos + m3.quat_rot(xquat, m.body_ipos)
    ximat = m3.quat_to_mat(m3.quat_mul(xquat, m.body_iquat))

    # subtree com, bottom-up
    mass = m.body_mass
    seg = [mass[b] * xipos[b] for b in range(m.nbody)]
    segm = [mass[b] for b in range(m.nbody)]
    for b in range(m.nbody - 1, 0, -1):
        p = int(m.body_parentid[b])
        seg[p] = seg[p] + seg[b]
        segm[p] = segm[p] + segm[b]
    subtree_com = jnp.stack(
        [seg[b] / jnp.maximum(segm[b], 1e-12) for b in range(m.nbody)]
    )

    root_com = subtree_com[m.body_rootid.np]

    # spatial inertia of each body about its root com, world orientation
    inertia_world = ximat @ (m.body_inertia[..., None] * jnp.swapaxes(ximat, -1, -2))
    offset = xipos - root_com
    cinert = m3.spatial_inertia(mass, inertia_world, offset)

    # cdof
    cdof = [None] * m.nv
    for j in range(m.njnt):
        jtype = int(m.jnt_type[j])
        vadr = int(m.jnt_dofadr[j])
        b = int(m.jnt_bodyid[j])
        anc_off = xanchor[j] - root_com[b]
        if jtype == JointType.FREE:
            for i in range(3):
                e = jnp.zeros(3, dtype).at[i].set(1.0)
                cdof[vadr + i] = jnp.concatenate([jnp.zeros(3, dtype), e])
            for i in range(3):
                axis = xmat[b][:, i]  # body axes in world (local angular velocity)
                cdof[vadr + 3 + i] = jnp.concatenate([axis, jnp.cross(axis, -anc_off)])
        else:  # hinge
            axis = xaxis[j]
            cdof[vadr] = jnp.concatenate([axis, jnp.cross(axis, -anc_off)])
    cdof = jnp.stack(cdof)

    return subtree_com, xipos, cinert, cdof


def crb(m: Model, cinert, cdof) -> jax.Array:
    """Composite-rigid-body dense joint-space inertia matrix M (nv, nv)."""
    crb_inert = [cinert[b] for b in range(m.nbody)]
    for b in range(m.nbody - 1, 0, -1):
        p = int(m.body_parentid[b])
        if p > 0:
            crb_inert[p] = crb_inert[p] + crb_inert[b]

    # F[i] = crb[body(dof_i)] @ cdof[i]
    dof_body = m.dof_bodyid.np
    crb_stack = jnp.stack([crb_inert[int(dof_body[i])] for i in range(m.nv)])
    F = jnp.einsum("vij,vj->vi", crb_stack, cdof)

    # dense M with kinematic-tree sparsity mask (j ancestor-or-self of i)
    mask = _ancestor_mask(m)
    L = (F @ cdof.T) * mask
    M = L + L.T - jnp.diag(jnp.diag(L))
    M = M + jnp.diag(m.dof_armature)
    return M


_ANCESTOR_MASK_CACHE = {}


def _ancestor_mask(m: Model):
    """mask[i, j] = 1 if dof j is an ancestor of (or equal to) dof i."""
    key = (m.dof_parentid, m.nv)
    cached = _ANCESTOR_MASK_CACHE.get(key)
    if cached is not None:
        return cached
    mask = np.zeros((m.nv, m.nv), dtype=np.float32)
    for i in range(m.nv):
        j = i
        while j >= 0:
            mask[i, j] = 1.0
            j = int(m.dof_parentid[j])
    # cache the numpy array (a jnp constant would leak across traces)
    _ANCESTOR_MASK_CACHE[key] = mask
    return mask


def com_vel(m: Model, cdof, qvel) -> Tuple[jax.Array, jax.Array]:
    """Body spatial velocities and cdof time-derivatives.

    Returns cvel (nbody, 6), cdofdot (nv, 6). Matches mj_comVel: each dof's
    cdofdot uses the spatial velocity accumulated so far (ancestors plus
    earlier dofs of the same joint).
    """
    dtype = cdof.dtype
    cvel = [jnp.zeros(6, dtype)]
    cdofdot = [None] * m.nv
    for b in range(1, m.nbody):
        p = int(m.body_parentid[b])
        v = cvel[p]
        jadr, jnum = int(m.body_jntadr[b]), int(m.body_jntnum[b])
        for j in range(jadr, jadr + jnum):
            jtype = int(m.jnt_type[j])
            vadr = int(m.jnt_dofadr[j])
            if jtype == JointType.FREE:
                # translation dofs: world-fixed axes, cdofdot = 0
                for i in range(vadr, vadr + 3):
                    cdofdot[i] = jnp.zeros(6, dtype)
                    v = v + cdof[i] * qvel[i]
                # rotation dofs: body-fixed axes; all three cdofdots use the
                # velocity excluding this joint's own rotational dofs (their
                # mutual omega x omega contributions cancel in the qvel
                # contraction; including them sequentially would not).
                v_pre = v
                for i in range(vadr + 3, vadr + 6):
                    cdofdot[i] = m3.motion_cross(v_pre, cdof[i])
                    v = v + cdof[i] * qvel[i]
            else:  # hinge: axis carried by parent chain + earlier joints
                i = vadr
                cdofdot[i] = m3.motion_cross(v, cdof[i])
                v = v + cdof[i] * qvel[i]
        cvel.append(v)
    cvel = jnp.stack(cvel)
    cdofdot = jnp.stack(
        [d if d is not None else jnp.zeros(6, dtype) for d in cdofdot]
    )
    return cvel, cdofdot


def rne(m: Model, cinert, cdof, cdofdot, cvel, qvel) -> jax.Array:
    """Recursive Newton-Euler bias force C(q, qvel) (gravity + coriolis).

    flg_acc = 0 variant (no qacc), matching the use inside forward dynamics.
    """
    dtype = cdof.dtype
    gravity = m.opt.gravity.astype(dtype)
    cacc0 = jnp.concatenate([jnp.zeros(3, dtype), -gravity])

    cacc = [cacc0]
    cfrc = [jnp.zeros(6, dtype)]
    for b in range(1, m.nbody):
        p = int(m.body_parentid[b])
        a = cacc[p]
        dofadr, dofnum = int(m.body_dofadr[b]), int(m.body_dofnum[b])
        for i in range(dofadr, dofadr + dofnum):
            a = a + cdofdot[i] * qvel[i]
        cacc.append(a)
        Iv = cinert[b] @ cvel[b]
        f = cinert[b] @ a + m3.force_cross(cvel[b], Iv)
        cfrc.append(f)

    # backward accumulation
    for b in range(m.nbody - 1, 0, -1):
        p = int(m.body_parentid[b])
        if p > 0:
            cfrc[p] = cfrc[p] + cfrc[b]

    dof_body = m.dof_bodyid.np
    cfrc_stack = jnp.stack([cfrc[int(dof_body[i])] for i in range(m.nv)])
    qfrc_bias = jnp.einsum("vi,vi->v", cdof, cfrc_stack)
    return qfrc_bias


def rne_postconstraint_cacc(m: Model, cinert, cdof, cdofdot, qvel, qacc) -> jax.Array:
    """Body spatial accelerations including actual qacc (for acc sensors).

    MuJoCo computes this in mj_rnePostConstraint; only cacc is needed for the
    accelerometer (open_duck_mini_v2.xml:29).
    """
    dtype = cdof.dtype
    gravity = m.opt.gravity.astype(dtype)
    cacc = [jnp.concatenate([jnp.zeros(3, dtype), -gravity])]
    for b in range(1, m.nbody):
        p = int(m.body_parentid[b])
        a = cacc[p]
        dofadr, dofnum = int(m.body_dofadr[b]), int(m.body_dofnum[b])
        for i in range(dofadr, dofadr + dofnum):
            a = a + cdofdot[i] * qvel[i] + cdof[i] * qacc[i]
        cacc.append(a)
    return jnp.stack(cacc)


def jac_point(m: Model, cdof, subtree_com, point: jax.Array, body: int):
    """Translational and rotational jacobians of a world point on `body`.

    Returns jacp (nv, 3), jacr (nv, 3): d(point linear / angular velocity)/dqvel.
    """
    offset = point - subtree_com[int(m.body_rootid[body])]
    jacp = cdof[:, 3:] + jnp.cross(cdof[:, :3], jnp.broadcast_to(offset, cdof[:, :3].shape))
    jacr = cdof[:, :3]
    mask = _body_dof_mask(m, body)
    return jacp * mask[:, None], jacr * mask[:, None]


_BODY_DOF_MASK_CACHE = {}


def _body_dof_mask(m: Model, body: int):
    """(nv,) mask of dofs that influence `body` (dofs of ancestor chain)."""
    key = (m.dof_parentid, m.body_dofadr, body)
    cached = _BODY_DOF_MASK_CACHE.get(key)
    if cached is not None:
        return cached
    mask = np.zeros((m.nv,), dtype=np.float32)
    b = body
    while b > 0:
        adr, num = int(m.body_dofadr[b]), int(m.body_dofnum[b])
        for i in range(adr, adr + num):
            mask[i] = 1.0
        b = int(m.body_parentid[b])
    _BODY_DOF_MASK_CACHE[key] = mask
    return mask


def integrate(m: Model, qpos: jax.Array, qvel: jax.Array, dt: float) -> jax.Array:
    """MuJoCo mj_integratePos: advance qpos by qvel*dt (quaternion-aware)."""
    out = qpos
    for j in range(m.njnt):
        jtype = int(m.jnt_type[j])
        qadr = int(m.jnt_qposadr[j])
        vadr = int(m.jnt_dofadr[j])
        if jtype == JointType.FREE:
            out = out.at[qadr : qadr + 3].set(
                qpos[qadr : qadr + 3] + dt * qvel[vadr : vadr + 3]
            )
            quat = m3.quat_integrate(
                qpos[qadr + 3 : qadr + 7], qvel[vadr + 3 : vadr + 6], dt
            )
            out = out.at[qadr + 3 : qadr + 7].set(quat)
        else:  # hinge
            out = out.at[qadr].set(qpos[qadr] + dt * qvel[vadr])
    return out
