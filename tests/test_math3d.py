"""Unit tests for quaternion / spatial algebra."""

import jax.numpy as jnp
import numpy as np

from open_duck_playground_tpu.ops import math3d as m3


def test_quat_mul_identity():
    q = m3.normalize(jnp.array([0.3, -0.5, 0.7, 0.1]))
    iq = jnp.array([1.0, 0, 0, 0])
    np.testing.assert_allclose(m3.quat_mul(q, iq), q, atol=1e-6)
    np.testing.assert_allclose(m3.quat_mul(iq, q), q, atol=1e-6)


def test_quat_rot_matches_matrix():
    rng = np.random.RandomState(0)
    for _ in range(10):
        q = m3.normalize(jnp.asarray(rng.randn(4), jnp.float32))
        v = jnp.asarray(rng.randn(3), jnp.float32)
        R = m3.quat_to_mat(q)
        np.testing.assert_allclose(m3.quat_rot(q, v), R @ v, atol=1e-5)


def test_quat_inv():
    q = m3.normalize(jnp.array([0.3, -0.5, 0.7, 0.1]))
    v = jnp.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(m3.quat_rot_inv(q, m3.quat_rot(q, v)), v, atol=1e-5)


def test_axis_angle_roundtrip():
    axis = jnp.array([0.0, 0, 1.0])
    q = m3.axis_angle_to_quat(axis, jnp.pi / 2)
    v = jnp.array([1.0, 0, 0])
    np.testing.assert_allclose(m3.quat_rot(q, v), jnp.array([0.0, 1.0, 0]), atol=1e-6)


def test_quat_integrate_local_frame():
    # Body yawed 90 deg; local x-angular-velocity must rotate about world y.
    q0 = m3.axis_angle_to_quat(jnp.array([0.0, 0, 1.0]), jnp.pi / 2)
    w_local = jnp.array([1.0, 0.0, 0.0])
    q1 = m3.quat_integrate(q0, w_local, 0.01)
    # The local x axis (world y) should be invariant.
    x_world0 = m3.quat_rot(q0, jnp.array([1.0, 0, 0]))
    x_world1 = m3.quat_rot(q1, jnp.array([1.0, 0, 0]))
    np.testing.assert_allclose(x_world0, x_world1, atol=1e-6)


def test_motion_cross_force_cross_duality():
    rng = np.random.RandomState(1)
    v = jnp.asarray(rng.randn(6), jnp.float32)
    m = jnp.asarray(rng.randn(6), jnp.float32)
    f = jnp.asarray(rng.randn(6), jnp.float32)
    # <v x m, f> = -<m, v x* f>
    lhs = jnp.dot(m3.motion_cross(v, m), f)
    rhs = -jnp.dot(m, m3.force_cross(v, f))
    np.testing.assert_allclose(lhs, rhs, rtol=2e-5, atol=1e-5)


def test_spatial_inertia_momentum():
    # Point mass at offset c moving with pure linear velocity: L = c x p.
    mass = jnp.asarray(2.0)
    c = jnp.array([0.5, -0.2, 0.3])
    I = m3.spatial_inertia(mass, jnp.zeros((3, 3)), c)
    v = jnp.concatenate([jnp.zeros(3), jnp.array([1.0, 0, 0])])
    h = I @ v
    p_expected = 2.0 * jnp.array([1.0, 0, 0])
    np.testing.assert_allclose(h[3:], p_expected, atol=1e-6)
    np.testing.assert_allclose(h[:3], jnp.cross(c, p_expected), atol=1e-6)
