"""Forward dynamics + semi-implicit Euler stepping + sensors.

The pipeline composition mirrors MuJoCo's mj_step for the feature subset the
duck scenes use (Euler integrator, eulerdamp disabled, position servos,
pyramidal contacts): position stage -> velocity stage -> actuation ->
smooth acceleration -> Newton constraint solve -> integrate.

Everything is a pure function of (Model, Data); batch via vmap; multi-step
via lax.scan (see `step_n`, the equivalent of the reference's
`mjx_env.step(model, data, ctrl, n_substeps)`, joystick.py:420).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from open_duck_playground_tpu.ops import collision as coll
from open_duck_playground_tpu.ops import constraint as con
from open_duck_playground_tpu.ops import linalg
from open_duck_playground_tpu.ops import math3d as m3
from open_duck_playground_tpu.ops import smooth
from open_duck_playground_tpu.ops import solver as nsolver
from open_duck_playground_tpu.ops.types import (
    Contact,
    Data,
    GeomType,
    Model,
    PairType,
    SensorType,
)


# ---------------------------------------------------------------------------
# Collision driver
# ---------------------------------------------------------------------------


def collide(m: Model, geom_xpos, geom_xmat) -> Contact:
    """Run narrowphase over the static pair list -> fixed 4*npair contacts."""
    dtype = geom_xpos.dtype
    dists, poss, frames, valids, g1s, g2s = [], [], [], [], [], []
    for p in range(m.npair):
        g1, g2 = int(m.pair_geom1[p]), int(m.pair_geom2[p])
        ptype = int(m.pair_type[p])
        if ptype == PairType.PLANE_HULL:
            hull = int(m.geom_dataid[g2])
            verts = m.hull_vert[hull]
            dist, pos, frame, valid = coll.plane_hull(
                geom_xpos[g1], geom_xmat[g1], geom_xpos[g2], geom_xmat[g2], verts
            )
        elif ptype == PairType.HFIELD_HULL:
            hull = int(m.geom_dataid[g2])
            verts = m.hull_vert[hull]
            dist, pos, frame, valid = coll.hfield_hull(
                geom_xpos[g1], geom_xmat[g1], m.hfield_data, m.hfield_size,
                geom_xpos[g2], geom_xmat[g2], verts,
            )
        elif ptype == PairType.HULL_HULL:
            h1, h2 = int(m.geom_dataid[g1]), int(m.geom_dataid[g2])
            dist, pos, frame, valid = coll.hull_hull(
                geom_xpos[g1], geom_xmat[g1], m.hull_vert[h1],
                m.hull_face_n[h1], m.hull_face_d[h1],
                geom_xpos[g2], geom_xmat[g2], m.hull_vert[h2],
                m.hull_face_n[h2], m.hull_face_d[h2],
            )
        else:
            raise NotImplementedError(f"pair type {ptype}")
        dists.append(dist)
        poss.append(pos)
        frames.append(jnp.broadcast_to(frame, (4, 3, 3)))
        valids.append(valid)
        g1s.append(np.full(4, g1, np.int32))
        g2s.append(np.full(4, g2, np.int32))

    if m.npair == 0:
        z4 = jnp.zeros((0,), dtype)
        return Contact(
            dist=z4, pos=jnp.zeros((0, 3), dtype), frame=jnp.zeros((0, 3, 3), dtype),
            friction=jnp.zeros((0, 3), dtype), solref=jnp.zeros((0, 2), dtype),
            solimp=jnp.zeros((0, 5), dtype), geom1=jnp.zeros((0,), jnp.int32),
            geom2=jnp.zeros((0,), jnp.int32), efc_valid=jnp.zeros((0,), bool),
        )

    fri = jnp.zeros((m.ncon, 3), dtype)
    sr = jnp.zeros((m.ncon, 2), dtype)
    si = jnp.zeros((m.ncon, 5), dtype)
    return Contact(
        dist=jnp.concatenate(dists),
        pos=jnp.concatenate(poss),
        frame=jnp.concatenate(frames),
        friction=fri,
        solref=sr,
        solimp=si,
        geom1=jnp.asarray(np.concatenate(g1s)),
        geom2=jnp.asarray(np.concatenate(g2s)),
        efc_valid=jnp.concatenate(valids),
    )


# ---------------------------------------------------------------------------
# Actuation (position servos over joints)
# ---------------------------------------------------------------------------


def actuation(m: Model, qpos, qvel, ctrl):
    """Position-servo forces: gain*ctrl + bias(q, qdot), forcerange-clamped.

    Matches MuJoCo <position kp kv>: gainprm=(kp,0,0), biasprm=(0,-kp,-kv),
    with ctrl clamped to ctrlrange (inheritrange=1 -> joint range,
    open_duck_mini_v2.xml:487-501).
    """
    trn = m.actuator_trnid.np
    qadr = np.asarray([int(m.jnt_qposadr[j]) for j in trn], dtype=np.int32)
    vadr = np.asarray([int(m.jnt_dofadr[j]) for j in trn], dtype=np.int32)
    ctrl_c = jnp.clip(ctrl, m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1])
    length = qpos[qadr] * m.actuator_gear
    velocity = qvel[vadr] * m.actuator_gear
    force = (
        m.actuator_gainprm[:, 0] * ctrl_c
        + m.actuator_biasprm[:, 0]
        + m.actuator_biasprm[:, 1] * length
        + m.actuator_biasprm[:, 2] * velocity
    )
    force = jnp.clip(force, m.actuator_forcerange[:, 0], m.actuator_forcerange[:, 1])
    qfrc = jnp.zeros_like(qvel).at[vadr].add(force * m.actuator_gear)
    return force, qfrc


# ---------------------------------------------------------------------------
# Sensors
# ---------------------------------------------------------------------------


def _point_vel(cvel_body, point, origin):
    w = cvel_body[:3]
    v = cvel_body[3:]
    return v + jnp.cross(w, point - origin)


def sensors(m: Model, d_xquat, site_xpos, site_xmat, subtree_com, cvel, cacc, m_site_quat):
    """Evaluate the sensor table -> flat sensordata.

    Covers the 15 sensors of the duck model (open_duck_mini_v2.xml:26-42):
    gyro, velocimeter, accelerometer, framexaxis/zaxis, framelinvel,
    frameangvel, framepos, framequat (all on sites).
    """
    out = []
    for s in range(len(m.sensor_type)):
        stype = int(m.sensor_type[s])
        sid = int(m.sensor_objid[s])
        body = int(m.site_bodyid[sid])
        root = int(m.body_rootid[body])
        origin = subtree_com[root]
        p = site_xpos[sid]
        R = site_xmat[sid]
        w_world = cvel[body, :3]
        if stype == SensorType.GYRO:
            out.append(R.T @ w_world)
        elif stype == SensorType.VELOCIMETER:
            out.append(R.T @ _point_vel(cvel[body], p, origin))
        elif stype == SensorType.ACCELEROMETER:
            a_ang = cacc[body, :3]
            a_lin = cacc[body, 3:] + jnp.cross(a_ang, p - origin)
            v_p = _point_vel(cvel[body], p, origin)
            a_point = a_lin + jnp.cross(w_world, v_p)
            out.append(R.T @ a_point)
        elif stype == SensorType.FRAMEXAXIS:
            out.append(R[:, 0])
        elif stype == SensorType.FRAMEZAXIS:
            out.append(R[:, 2])
        elif stype == SensorType.FRAMELINVEL:
            out.append(_point_vel(cvel[body], p, origin))
        elif stype == SensorType.FRAMEANGVEL:
            out.append(w_world)
        elif stype == SensorType.FRAMEPOS:
            out.append(p)
        elif stype == SensorType.FRAMEQUAT:
            out.append(m3.quat_mul(d_xquat[body], m_site_quat[sid]))
        else:
            raise NotImplementedError(f"sensor type {stype}")
    if not out:
        return jnp.zeros((0,), site_xpos.dtype)
    return jnp.concatenate(out)


# ---------------------------------------------------------------------------
# Forward + step
# ---------------------------------------------------------------------------


def forward(m: Model, d: Data) -> Data:
    """Full forward dynamics: fills every derived field of Data."""
    qpos, qvel, ctrl = d.qpos, d.qvel, d.ctrl

    # position stage
    xpos, xquat, xmat, xanchor, xaxis = smooth.kinematics(m, qpos)
    site_xpos, site_xmat = smooth.site_kinematics(m, xpos, xquat)
    geom_xpos, geom_xmat = smooth.geom_kinematics(m, xpos, xquat)
    subtree_com, xipos, cinert, cdof = smooth.com_pos(m, xpos, xquat, xmat, xanchor, xaxis)
    M = smooth.crb(m, cinert, cdof)
    contact = collide(m, geom_xpos, geom_xmat)

    # velocity stage
    cvel, cdofdot = smooth.com_vel(m, cdof, qvel)
    qfrc_bias = smooth.rne(m, cinert, cdof, cdofdot, cvel, qvel)
    qfrc_passive = -m.dof_damping * qvel

    # actuation
    actuator_force, qfrc_actuator = actuation(m, qpos, qvel, ctrl)

    # smooth acceleration
    qfrc_smooth = qfrc_passive - qfrc_bias + qfrc_actuator
    qacc_smooth = linalg.solve_psd(M, qfrc_smooth)

    # constraints (warmstarted from the previous solve, as MuJoCo/MJX do;
    # the solution is saved back into qacc_warmstart below)
    efc = con.make_efc(m, qvel, qpos, contact, cdof, subtree_com)
    qacc, qfrc_constraint = nsolver.solve(
        m, M, qacc_smooth, efc, warmstart=d.qacc_warmstart
    )

    # acceleration-stage sensors need post-constraint body accelerations
    cacc = smooth.rne_postconstraint_cacc(m, cinert, cdof, cdofdot, qvel, qacc)
    sdata = sensors(m, xquat, site_xpos, site_xmat, subtree_com, cvel, cacc, m.site_quat)

    return d.replace(
        qacc=qacc,
        qacc_warmstart=qacc,
        xpos=xpos,
        xquat=xquat,
        xmat=xmat,
        xipos=xipos,
        site_xpos=site_xpos,
        site_xmat=site_xmat,
        subtree_com=subtree_com,
        actuator_force=actuator_force,
        qfrc_actuator=qfrc_actuator,
        qfrc_smooth=qfrc_smooth,
        qfrc_constraint=qfrc_constraint,
        cvel=cvel,
        sensordata=sdata,
        contact=contact,
    )


def step(m: Model, d: Data) -> Data:
    """One physics step: forward dynamics then semi-implicit Euler.

    Derived fields in the returned Data correspond to the pre-integration
    state, matching MuJoCo's mj_step (sensors lag integration by one step).
    """
    d = forward(m, d)
    dt = m.opt.timestep
    qvel_new = d.qvel + dt * d.qacc
    qpos_new = smooth.integrate(m, d.qpos, qvel_new, dt)
    return d.replace(qpos=qpos_new, qvel=qvel_new, time=d.time + dt)


def step_n(m: Model, d: Data, ctrl: jax.Array, n_substeps: int) -> Data:
    """n_substeps physics steps holding ctrl fixed (control decimation).

    Equivalent of mujoco_playground's `mjx_env.step` (reference
    joystick.py:420: 10 substeps of 2 ms per 20 ms control step).
    """
    d = d.replace(ctrl=ctrl)

    def body(carry, _):
        return step(m, carry), None

    d, _ = jax.lax.scan(body, d, None, length=n_substeps)
    return d


def make_data(m: Model, dtype=jnp.float32) -> Data:
    """Fresh Data at qpos0, zero velocity."""
    ncon = m.ncon
    return Data(
        qpos=m.qpos0.astype(dtype),
        qvel=jnp.zeros(m.nv, dtype),
        ctrl=jnp.zeros(m.nu, dtype),
        qacc=jnp.zeros(m.nv, dtype),
        qacc_warmstart=jnp.zeros(m.nv, dtype),
        time=jnp.zeros((), dtype),
        xpos=jnp.zeros((m.nbody, 3), dtype),
        xquat=jnp.zeros((m.nbody, 4), dtype).at[:, 0].set(1.0),
        xmat=jnp.zeros((m.nbody, 3, 3), dtype),
        xipos=jnp.zeros((m.nbody, 3), dtype),
        site_xpos=jnp.zeros((m.nsite, 3), dtype),
        site_xmat=jnp.zeros((m.nsite, 3, 3), dtype),
        subtree_com=jnp.zeros((m.nbody, 3), dtype),
        actuator_force=jnp.zeros(m.nu, dtype),
        qfrc_actuator=jnp.zeros(m.nv, dtype),
        qfrc_smooth=jnp.zeros(m.nv, dtype),
        qfrc_constraint=jnp.zeros(m.nv, dtype),
        cvel=jnp.zeros((m.nbody, 6), dtype),
        sensordata=jnp.zeros(m.nsensordata, dtype),
        contact=Contact(
            dist=jnp.full((ncon,), coll.BIG, dtype),
            pos=jnp.zeros((ncon, 3), dtype),
            frame=jnp.zeros((ncon, 3, 3), dtype),
            friction=jnp.zeros((ncon, 3), dtype),
            solref=jnp.zeros((ncon, 2), dtype),
            solimp=jnp.zeros((ncon, 5), dtype),
            geom1=jnp.zeros((ncon,), jnp.int32),
            geom2=jnp.zeros((ncon,), jnp.int32),
            efc_valid=jnp.zeros((ncon,), bool),
        ),
    )


def init(m: Model, qpos: jax.Array, qvel: jax.Array, ctrl: jax.Array) -> Data:
    """Equivalent of mjx_env.init: set state and run one forward pass."""
    d = make_data(m, qpos.dtype)
    d = d.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
    return forward(m, d)
