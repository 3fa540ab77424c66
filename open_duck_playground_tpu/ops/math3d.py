"""Quaternion and spatial (6D) algebra, MuJoCo conventions, pure JAX.

Conventions (matching the semantics the reference stack relies on via
`mujoco.mjx._src.math`, reimplemented from first principles):

- Quaternions are (w, x, y, z), unit norm, representing rotation of a vector
  from the LOCAL frame into the PARENT/WORLD frame: ``v_world = R(q) v_local``.
- Motion ("velocity") 6-vectors are ``(angular[3], linear[3])`` expressed at a
  shared origin O in world orientation: the linear part is the velocity of the
  body-fixed point currently coincident with O.
- Force 6-vectors are ``(torque[3], force[3])`` about the same origin.
- Free-joint qvel is 3 world-frame linear dofs followed by 3 BODY-frame
  angular dofs; quaternion integration is local:  q <- q * exp(w_local*h/2).

All functions are shape-polymorphic over leading batch dims where noted and
safe under jit/vmap (no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a*b, (w,x,y,z). Supports broadcasting."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_inv(q: jax.Array) -> jax.Array:
    """Conjugate of a unit quaternion."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rot(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by quaternion q (local -> world)."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    # v' = v + 2*qw*(qv x v) + 2*qv x (qv x v)
    uv = jnp.cross(qv, v)
    return v + 2.0 * (qw * uv + jnp.cross(qv, uv))


def quat_rot_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by the inverse of q (world -> local)."""
    return quat_rot(quat_inv(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Quaternion -> 3x3 rotation matrix (columns = local axes in world)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz),
            2.0 * (xy - wz),
            2.0 * (xz + wy),
            2.0 * (xy + wz),
            1.0 - 2.0 * (xx + zz),
            2.0 * (yz - wx),
            2.0 * (xz - wy),
            2.0 * (yz + wx),
            1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Unit axis + angle -> quaternion.  `angle` broadcasts against axis[..., 0]."""
    angle = jnp.broadcast_to(jnp.squeeze(jnp.asarray(angle)), axis[..., 0].shape)
    s = jnp.sin(angle * 0.5)[..., None]
    c = jnp.cos(angle * 0.5)[..., None]
    return jnp.concatenate([c, axis * s], axis=-1)


def quat_integrate(q: jax.Array, w_local: jax.Array, dt) -> jax.Array:
    """MuJoCo mju_quatIntegrate: q <- normalize(q * exp(w_local * dt / 2)).

    The angular velocity is expressed in the LOCAL (child body) frame, hence
    the right-multiplication.
    """
    angle = jnp.linalg.norm(w_local, axis=-1, keepdims=True)
    # Safe normalize: zero velocity -> identity rotation.
    axis = w_local / jnp.where(angle > 1e-12, angle, 1.0)
    half = angle[..., 0] * dt * 0.5
    dq = jnp.concatenate([jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1)
    out = quat_mul(q, dq)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def normalize(v: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.where(n > eps, n, 1.0)


# ---------------------------------------------------------------------------
# Spatial 6D algebra: vectors are (angular[3], linear[3])
# ---------------------------------------------------------------------------


def motion_cross(vel: jax.Array, m: jax.Array) -> jax.Array:
    """Spatial cross product of motion vectors: vel x m.

    (w1, v1) x (w2, v2) = (w1 x w2,  w1 x v2 + v1 x w2)
    Matches mju_crossMotion.
    """
    w1, v1 = vel[..., :3], vel[..., 3:]
    w2, v2 = m[..., :3], m[..., 3:]
    return jnp.concatenate([jnp.cross(w1, w2), jnp.cross(w1, v2) + jnp.cross(v1, w2)], axis=-1)


def force_cross(vel: jax.Array, f: jax.Array) -> jax.Array:
    """Dual spatial cross product: vel x* f.

    (w, v) x* (n, f) = (w x n + v x f,  w x f)
    Matches mju_crossForce.
    """
    w, v = vel[..., :3], vel[..., 3:]
    n, fo = f[..., :3], f[..., 3:]
    return jnp.concatenate([jnp.cross(w, n) + jnp.cross(v, fo), jnp.cross(w, fo)], axis=-1)


def skew(v: jax.Array) -> jax.Array:
    """3-vector -> skew-symmetric matrix [v]x such that [v]x u = v x u."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def spatial_inertia(mass: jax.Array, inertia_world: jax.Array, com_offset: jax.Array) -> jax.Array:
    """6x6 spatial inertia about origin O in world orientation.

    Args:
      mass: scalar (broadcastable)
      inertia_world: (..., 3, 3) rotational inertia about the body's own com,
        expressed in world axes.
      com_offset: (..., 3) vector from O to the body com (world).

    Returns (..., 6, 6):
        [[I_c - m [c]x[c]x ,  m [c]x ],
         [    -m [c]x      ,  m 1_3  ]]
    mapping motion (w, v_O) -> momentum (L_O, p).
    """
    c = skew(com_offset)
    m3 = mass[..., None, None] * jnp.eye(3, dtype=com_offset.dtype)
    top_left = inertia_world - mass[..., None, None] * (c @ c)
    top_right = mass[..., None, None] * c
    bottom_left = -top_right
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bottom = jnp.concatenate([bottom_left, m3], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def transform_motion(vec: jax.Array, offset: jax.Array) -> jax.Array:
    """Re-express a motion vector at a new origin O' = O + offset.

    v_O' = v_O + w x offset ... linear part shifts; angular unchanged.
    """
    w, v = vec[..., :3], vec[..., 3:]
    return jnp.concatenate([w, v + jnp.cross(w, offset)], axis=-1)
