"""Golden tests: lane (fused-kernel) physics pipeline vs the XLA pipeline.

The lane pipeline (ops/lane_physics.py) is layout-agnostic: tiles are just
arrays, so here tiles are (B,) CPU arrays and the fused-kernel math is
validated against ops/forward.py without a TPU.

Tolerance note: with the duck scenes' iterations=1 Newton solver, a single
truncated Newton step is discontinuous in its inputs wherever a friction row
sits at its Huber breakpoint or a contact at activation, so *per-step* qacc
parity on arbitrary random states is not well-posed (two XLA runs differing
only in the PSD-solve backend diverge there too — measured 40 m/s^2 on
knife-edge states). The tests therefore check (a) exact parity of every
solver *input* (J, D, aref, contacts, M, smooth dynamics) on random states,
and (b) full-substep parity on physically settled states where the active
set is stable, plus (c) behavioral trajectory checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_duck_playground_tpu.ops import constraint as con
from open_duck_playground_tpu.ops import forward as fwd
from open_duck_playground_tpu.ops import linalg, smooth
from open_duck_playground_tpu.ops.lane_physics import LanePhysics


def _lanes(x):  # (B, n) -> list of n (B,) tiles
    return [x[:, i] for i in range(x.shape[1])]


def _batch(lanes):  # list of n (B,) -> (B, n)
    return jnp.stack(lanes, axis=1)


@pytest.fixture(scope="module")
def lane_flat(flat_model):
    return LanePhysics(flat_model)


def _settled_states(m, B, seed=0):
    """Home keyframe with small joint perturbations, near-zero velocity."""
    kf = m.keyframe("home")
    rng = np.random.RandomState(seed)
    qpos = np.tile(np.asarray(kf.qpos, np.float32), (B, 1))
    qpos[:, 7:] += rng.uniform(-0.02, 0.02, (B, m.nq - 7)).astype(np.float32)
    qvel = rng.uniform(-0.01, 0.01, (B, m.nv)).astype(np.float32)
    ctrl = np.asarray(kf.ctrl, np.float32) + rng.uniform(
        -0.05, 0.05, (B, m.nu)
    ).astype(np.float32)
    return jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl)


def _random_states(m, B, seed=0):
    kf = m.keyframe("home")
    rng = np.random.RandomState(seed)
    qpos = np.tile(np.asarray(kf.qpos, np.float32), (B, 1))
    qpos[:, :2] += rng.uniform(-0.02, 0.02, (B, 2)).astype(np.float32)
    qpos[:, 2] += rng.uniform(-0.005, 0.02, B).astype(np.float32)
    qpos[:, 7:] += rng.uniform(-0.1, 0.1, (B, m.nq - 7)).astype(np.float32)
    qvel = rng.uniform(-0.2, 0.2, (B, m.nv)).astype(np.float32)
    ctrl = np.asarray(kf.ctrl, np.float32) + rng.uniform(
        -0.2, 0.2, (B, m.nu)
    ).astype(np.float32)
    return jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl)


def test_lane_solver_inputs_match_xla(flat_model, lane_flat):
    """Everything feeding the constraint solver matches on random states."""
    m = flat_model
    B = 16
    qpos, qvel, ctrl = _random_states(m, B)

    @jax.jit
    @jax.vmap
    def xla_stages(qpos, qvel, ctrl):
        xpos, xquat, xmat, xanchor, xaxis = smooth.kinematics(m, qpos)
        geom_xpos, geom_xmat = smooth.geom_kinematics(m, xpos, xquat)
        subtree_com, _, cinert, cdof = smooth.com_pos(
            m, xpos, xquat, xmat, xanchor, xaxis)
        M = smooth.crb(m, cinert, cdof)
        contact = fwd.collide(m, geom_xpos, geom_xmat)
        cvel, cdofdot = smooth.com_vel(m, cdof, qvel)
        qfrc_bias = smooth.rne(m, cinert, cdof, cdofdot, cvel, qvel)
        _, qfrc_act = fwd.actuation(m, qpos, qvel, ctrl)
        qfrc_smooth = qfrc_act - qfrc_bias - m.dof_damping * qvel
        qacc_smooth = linalg.solve_psd(M, qfrc_smooth)
        efc = con.make_efc(m, qvel, qpos, contact, cdof, subtree_com)
        return M, contact.dist, qacc_smooth, efc

    M_r, dist_r, qaccs_r, efc_r = xla_stages(qpos, qvel, ctrl)

    lane = lane_flat
    lq, lv, lc = _lanes(qpos), _lanes(qvel), _lanes(ctrl)
    xpos, xquat, xanchor, xaxis = lane.kinematics(lq, None)
    subtree_com, _, cinert, cdof = lane.com_pos(xpos, xquat, xanchor, xaxis, None)
    M = lane.crb(cinert, cdof, None)
    contacts = lane.collide(xpos, xquat)
    cvel, cdofdot = lane.com_vel(cdof, lv)
    qfrc_bias = lane.rne(cinert, cdof, cdofdot, cvel, lv)
    _, qfrc_act = lane.actuation(lq, lv, lc, None)
    qfrc_smooth = [qfrc_act[i] - qfrc_bias[i]
                   - float(lane.c.dof_damping[i]) * lv[i] for i in range(m.nv)]
    L, dinv = lane.ldl.factor(M)
    qacc_smooth = lane.ldl.solve(L, dinv, qfrc_smooth)
    rows = lane.make_efc(lv, lq, contacts, cdof, subtree_com, None)

    Mr = np.asarray(M_r)
    for (i, j), v in M.items():
        np.testing.assert_allclose(np.asarray(v), Mr[:, i, j], atol=2e-5)
    np.testing.assert_allclose(np.asarray(_batch(qacc_smooth)),
                               np.asarray(qaccs_r), rtol=1e-3, atol=1e-3)
    dist_l = np.stack(
        [np.asarray(d) for (cand, fr, _) in contacts for (d, p, v) in cand], 1)
    np.testing.assert_allclose(np.minimum(dist_l, 1e9),
                               np.minimum(np.asarray(dist_r), 1e9),
                               rtol=1e-4, atol=1e-6)
    assert len(rows) == efc_r.J.shape[1]
    J_l = np.zeros((B, len(rows), m.nv), np.float32)
    for r_i, r in enumerate(rows):
        for (dof, cf) in r["support"]:
            J_l[:, r_i, dof] = np.broadcast_to(np.asarray(cf), (B,))
    D_l = np.stack([np.broadcast_to(np.asarray(r["D"]), (B,)) for r in rows], 1)
    aref_l = np.stack(
        [np.broadcast_to(np.asarray(r["aref"]), (B,)) for r in rows], 1)
    # Manifold tie-breaks: the duck sole has symmetric vertex pairs with
    # bit-equal depth, so the spread-selection argmax can flip between the
    # two pipelines on f32 rounding (depth/dist still agree — asserted
    # above). Compare J/aref only on contact rows whose selected POSITION
    # matches, and require the flip rate to be small.
    pos_l = np.stack(
        [np.stack([np.broadcast_to(np.asarray(c), (B,)) for c in p], -1)
         for (cand, fr, _) in contacts for (d, p, v) in cand], 1)  # (B,ncon,3)
    pos_r = np.asarray(
        jax.jit(jax.vmap(lambda q, v, c: fwd.collide(
            m, *smooth.geom_kinematics(
                m, *smooth.kinematics(m, q)[:2])).pos))(qpos, qvel, ctrl))
    con_match = (np.abs(pos_l - pos_r) < 1e-4).all(-1)  # (B, ncon)
    assert con_match.mean() > 0.9, con_match.mean()
    ncontact_rows = pos_l.shape[1] * 4
    n_pre = len(rows) - ncontact_rows  # friction + limit rows
    row_match = np.concatenate(
        [np.ones((B, n_pre), bool), np.repeat(con_match, 4, axis=1)], axis=1)
    np.testing.assert_allclose(
        np.where(row_match[:, :, None], J_l, 0.0),
        np.where(row_match[:, :, None], np.asarray(efc_r.J), 0.0), atol=2e-5)
    np.testing.assert_allclose(D_l, np.asarray(efc_r.D), rtol=2e-3)
    np.testing.assert_allclose(
        np.where(row_match, aref_l, 0.0),
        np.where(row_match, np.asarray(efc_r.aref), 0.0),
        rtol=2e-3, atol=1e-3)


def test_lane_substep_matches_xla_settled(flat_model, lane_flat):
    """Full substep parity on settled states (stable constraint branches)."""
    m = flat_model
    B = 16
    qpos, qvel, ctrl = _settled_states(m, B)

    step1 = jax.jit(jax.vmap(lambda q, v, c: fwd.step_n(
        m, fwd.make_data(m).replace(qpos=q, qvel=v), c, 1)))
    d_ref = step1(qpos, qvel, ctrl)

    # warm=0 matches the XLA path's make_data() qacc_warmstart init
    warm0 = _lanes(jnp.zeros((B, m.nv), jnp.float32))
    qp, qv, _w, derived = lane_flat.step_n(
        _lanes(qpos), _lanes(qvel), _lanes(ctrl), 1, warm=warm0)

    # Quantile assertions. The iterations=1 Newton step is discontinuous in
    # its inputs wherever a friction row crosses its Huber breakpoint during
    # the linesearch, and at rest the truncated solve rings in a limit cycle
    # around those breakpoints — measured: the XLA path itself shifts qvel by
    # 3e-2..1e-1 on ~half of settled envs under a 1e-6 qpos perturbation, and
    # *which* envs flip is effectively random per draw. Per-element medians
    # are the well-posed parity check (exact-tracking envs exist and must be
    # exact); upper tails only get loose physical bounds.
    qp_err = np.abs(np.asarray(_batch(qp)) - np.asarray(d_ref.qpos))
    assert np.quantile(qp_err, 0.95) < 2e-4, np.quantile(qp_err, 0.95)
    assert qp_err.max() < 2e-3, qp_err.max()
    qv_err = np.abs(np.asarray(_batch(qv)) - np.asarray(d_ref.qvel))
    assert np.quantile(qv_err, 0.5) < 1e-3, np.quantile(qv_err, 0.5)
    per_env = qv_err.max(axis=1)
    assert np.quantile(per_env, 0.3) < 1e-4, np.quantile(per_env, 0.3)
    assert qv_err.max() < 0.5, qv_err.max()
    sd_err = np.abs(np.asarray(_batch(derived["sensordata"]))
                    - np.asarray(d_ref.sensordata))
    assert np.quantile(sd_err, 0.85) < 1e-2, np.quantile(sd_err, 0.85)
    assert sd_err.max() < 50.0, sd_err.max()  # accelerometer rows carry qacc
    af = _batch(derived["actuator_force"])
    np.testing.assert_allclose(np.asarray(af),
                               np.asarray(d_ref.actuator_force),
                               rtol=2e-3, atol=2e-3)
    cd = np.asarray(_batch(derived["contact_dist"]))
    ref_cd = np.asarray(d_ref.contact.dist)
    np.testing.assert_array_equal(cd < 1e9, ref_cd < 1e9)
    both = (cd < 1e9) & (ref_cd < 1e9)
    np.testing.assert_allclose(cd[both], ref_cd[both], rtol=1e-3, atol=1e-5)
    sxp = _batch(derived["site_xpos"]).reshape(B, m.nsite, 3)
    np.testing.assert_allclose(np.asarray(sxp), np.asarray(d_ref.site_xpos),
                               rtol=1e-4, atol=1e-5)


def test_lane_duck_stands(flat_model, lane_flat):
    """Behavioral: lane stepping keeps the duck upright (eager, short).

    The lane graph must stay EAGER on CPU: XLA:CPU takes >10 min to compile
    even one fully-unrolled substep (thousands of tiny scalar-tile ops),
    while the TPU Mosaic backend compiles the same graph in ~90 s. Long
    trajectories are covered by test_physics.py::test_duck_stands (XLA
    pipeline, scan) and scripts/check_pallas_parity.py (fused TPU kernel vs
    this eager lane oracle over 10 substeps), so 2 control steps suffice
    here as a CPU smoke of the integrated substep loop.
    """
    m = flat_model
    kf = m.keyframe("home")
    B = 4
    qpos = jnp.tile(jnp.asarray(kf.qpos, jnp.float32), (B, 1))
    qvel = jnp.zeros((B, m.nv), jnp.float32)
    ctrl = jnp.tile(jnp.asarray(kf.ctrl, jnp.float32), (B, 1))

    derived = None
    qp, qv = _lanes(qpos), _lanes(qvel)
    for _ in range(2):
        qp, qv, _w, derived = lane_flat.step_n(qp, qv, _lanes(ctrl), 10)
    qpos, qvel = _batch(qp), _batch(qv)
    z = np.asarray(qpos[:, 2])
    assert not np.isnan(np.asarray(qpos)).any()
    assert (0.1 < z).all() and (z < 0.25).all(), z
    # upvector z from sensordata (same adr as XLA path sensors)
    up_z = np.asarray(derived["sensordata"][11])
    assert (up_z > 0.95).all(), up_z
    assert np.abs(np.asarray(qvel)).max() < 0.5


def test_lane_backlash_model(backlash_model):
    """The lane pipeline handles the 30-dof backlash model too."""
    m = backlash_model
    lane = LanePhysics(m)
    B = 4
    qpos, qvel, ctrl = _settled_states(m, B, seed=5)
    step1 = jax.jit(jax.vmap(lambda q, v, c: fwd.step_n(
        m, fwd.make_data(m).replace(qpos=q, qvel=v), c, 1)))
    d_ref = step1(qpos, qvel, ctrl)
    warm0 = _lanes(jnp.zeros((B, m.nv), jnp.float32))
    qp, qv, _w, _ = lane.step_n(
        _lanes(qpos), _lanes(qvel), _lanes(ctrl), 1, warm=warm0)
    # The 10 friction-free backlash slop dofs ring in the truncated
    # solver's limit cycle, so MOST envs flip an active-set branch within a
    # single substep and diverge at ~1e-2 (see substep-test comment; a flip
    # shifts every dof of that env). The well-posed check: at least one env
    # must track the XLA path essentially bit-exactly through the whole
    # substep (measured: non-flipped envs agree to ~1e-7), the rest get
    # loose physical bounds.
    qp_err = np.abs(np.asarray(_batch(qp)) - np.asarray(d_ref.qpos))
    qv_err = np.abs(np.asarray(_batch(qv)) - np.asarray(d_ref.qvel))
    assert qv_err.max(axis=1).min() < 1e-4, qv_err.max(axis=1)
    assert qp_err.max() < 2e-3, qp_err.max()
    assert qv_err.max() < 0.5, qv_err.max()


def test_lane_hfield_model():
    """The lane pipeline handles the heightfield (rough terrain) scene, in
    both gather modes: "direct" (advanced indexing) and "onehot" (the
    gather-as-MXU-matmul used inside the TPU kernel). Measured parity with
    the XLA hfield collider is ~1e-7 on all fields for these states."""
    from tests.conftest import ROUGH_SCENE
    from open_duck_playground_tpu.mjcf import compile_mjcf

    m = compile_mjcf(ROUGH_SCENE, timestep=0.002)
    lane = LanePhysics(m)
    B = 4
    kf = m.keyframe("home")
    rng = np.random.RandomState(3)
    qpos = np.tile(np.asarray(kf.qpos, np.float32), (B, 1))
    qpos[:, 2] += 0.11  # hfield base lifts the ground
    qpos[:, 7:] += rng.uniform(-0.02, 0.02, (B, m.nq - 7)).astype(np.float32)
    qvel = rng.uniform(-0.01, 0.01, (B, m.nv)).astype(np.float32)
    ctrl = np.asarray(kf.ctrl, np.float32) + rng.uniform(
        -0.05, 0.05, (B, m.nu)).astype(np.float32)
    qpos, qvel, ctrl = jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl)

    step1 = jax.jit(jax.vmap(lambda q, v, c: fwd.step_n(
        m, fwd.make_data(m).replace(qpos=q, qvel=v), c, 1)))
    d_ref = step1(qpos, qvel, ctrl)

    for gather in ("direct", "onehot"):
        warm0 = _lanes(jnp.zeros((B, m.nv), jnp.float32))
        qp, qv, _w, der = lane.step_n(
            _lanes(qpos), _lanes(qvel), _lanes(ctrl), 1, gather=gather,
            warm=warm0)
        cd = np.asarray(_batch(der["contact_dist"]))
        rcd = np.asarray(d_ref.contact.dist)
        np.testing.assert_array_equal(cd < 1e9, rcd < 1e9)
        both = (cd < 1e9) & (rcd < 1e9)
        assert np.abs(cd[both] - rcd[both]).max() < 1e-5
        qp_err = np.abs(np.asarray(_batch(qp)) - np.asarray(d_ref.qpos))
        qv_err = np.abs(np.asarray(_batch(qv)) - np.asarray(d_ref.qvel))
        # same chaos caveats as the backlash test: at least one env must
        # track essentially exactly; loose bounds on the rest
        assert qv_err.max(axis=1).min() < 1e-4, qv_err.max(axis=1)
        assert qp_err.max() < 2e-3, qp_err.max()
        assert qv_err.max() < 0.5, qv_err.max()
