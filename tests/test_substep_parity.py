"""Active-set-matched single-substep parity vs real MuJoCo (default suite).

VERDICT r3 #6: trajectory-level trace tests can only bound divergence at
~2x an iterations=1-Newton chaos floor. This test instead compares ONE
forward pass from identical states with aligned (zero) warmstart, so the
well-posed pipeline stages are held to f32-tight bounds:

  stage                measured settled max (K=40)   bound here (~2x)
  qfrc_smooth          4.4e-6                         1e-5
  fri_D (rel)          3.6e-7                         1e-6
  fri_aref             4.9e-7                         2e-6
  fri_J                0.0 (exact)                    1e-7
  con_normal_dot       1.0 (exact)                    >= 0.9999
  con_dist             4.4e-4                         1e-3
  con_pos              5.1e-3                         1e-2
  con_J                4.6e-3                         1e-2
  con_row_perm_fail    0                              0

and the solver-level divergence is bounded, not asserted tight, because
MuJoCo's box-plane collider emits one more active contact than our static
4-slot manifold (con_matched_frac 0.8 settled), so the Newton active sets
legitimately differ:

  qacc_smooth          7.1e-2   (f32 M-solve through ~1e3-conditioned M)
  con_aref             1.16     (con_dist error through the impedance K)
  qacc (post-solve)    13.5     (solver-branch divergence, settled)

Calibration source: scripts/substep_parity_calib.py --modes settled
(RESULTS/r4/substep_parity_settled.log, 2026-08-19, mujoco 3.10, K=40).
Reference anchor: mj_forward (MuJoCo engine_forward.c) vs ops/forward.py.
"""

from __future__ import annotations

import mujoco
import numpy as np
import pytest

from open_duck_playground_tpu.deploy import substep_parity as sp
from open_duck_playground_tpu.mjcf.compiler import compile_mjcf

from conftest import FLAT_SCENE

K = 6  # states sampled; calib used K=40 — bounds here are 2x the K=40 max


@pytest.fixture(scope="module")
def setup():
    om = compile_mjcf(FLAT_SCENE, timestep=0.002)
    mm = mujoco.MjModel.from_xml_path(FLAT_SCENE)
    dd = mujoco.MjData(mm)
    gmap = sp.geom_name_map(om, mm)
    kf = om.keyframe("home")
    return om, mm, dd, gmap, kf


@pytest.fixture(scope="module")
def settled_stats(setup):
    om, mm, dd, gmap, kf = setup
    rng = np.random.default_rng(0)
    return sp.run_mode(om, mm, dd, gmap, kf, "settled", K, rng)


def test_smooth_dynamics_tight(settled_stats):
    """Bias/passive/actuation forces agree to f32 round-off."""
    assert max(settled_stats["qfrc_smooth"]) < 1e-5
    # f32 LDL solve through a ~1e3-conditioned M: abs err bounded, not tight
    assert max(settled_stats["qacc_smooth"]) < 0.2


def test_friction_rows_tight(settled_stats):
    assert max(settled_stats["fri_D"]) < 1e-6
    assert max(settled_stats["fri_aref"]) < 2e-6
    assert max(settled_stats["fri_J"]) < 1e-7


def test_contact_geometry_tight(settled_stats):
    assert min(settled_stats["con_normal_dot"]) > 0.9999
    assert max(settled_stats["con_dist"]) < 1e-3
    assert max(settled_stats["con_pos"]) < 1e-2
    # every matched contact's 4 pyramid rows are a clean permutation of mj's
    assert max(settled_stats["con_row_perm_fail"]) == 0.0
    assert max(settled_stats["con_J"]) < 1e-2
    # MuJoCo emits 5 active contacts at the settled stance, our static
    # manifold carries 4 of them (documented collider difference)
    assert min(settled_stats["con_matched_frac"]) >= 0.75


def test_solver_divergence_bounded(settled_stats):
    """Active sets differ by the unmatched 5th contact -> qacc diverges at
    the solver branch; bound it at ~2x the measured settled ceiling so a
    regression in the solver itself (not the manifold count) still trips."""
    assert max(settled_stats["con_aref"]) < 2.5
    assert max(settled_stats["qacc_all"]) < 30.0


def test_pieces_match_forward(setup):
    """our_forward_pieces must stay in lockstep with ops/forward.forward."""
    import jax.numpy as jnp

    from open_duck_playground_tpu.ops import forward as fwd

    om, mm, dd, gmap, kf = setup
    rng = np.random.default_rng(1)
    qpos = np.asarray(kf.qpos, np.float64).copy()
    qpos[7:] += rng.uniform(-0.05, 0.05, om.nq - 7)
    qvel = rng.uniform(-0.1, 0.1, om.nv)
    ctrl = np.asarray(kf.ctrl) + rng.uniform(-0.02, 0.02, om.nu)

    pieces = sp.our_forward_pieces(om, qpos, qvel, ctrl)
    d = fwd.make_data(om)
    d = d.replace(qpos=jnp.asarray(qpos, jnp.float32),
                  qvel=jnp.asarray(qvel, jnp.float32),
                  ctrl=jnp.asarray(ctrl, jnp.float32))
    d = fwd.forward(om, d)  # make_data zeros qacc_warmstart, same as pieces
    np.testing.assert_allclose(pieces["qfrc_smooth"],
                               np.asarray(d.qfrc_smooth, np.float64),
                               atol=1e-6)
    np.testing.assert_allclose(pieces["qacc"],
                               np.asarray(d.qacc, np.float64), atol=1e-4)
