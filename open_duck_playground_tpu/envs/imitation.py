"""Imitation reward against the polynomial reference gait.

Behavioral parity with reference custom_rewards.py: compares base
orientation/velocities, (headless) joint pos/vel and foot contacts against a
40-dim reference frame (layout documented in envs/reference_motion.py),
gated to zero for near-zero commands (custom_rewards.py:148).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 40-dim frame slices (reference custom_rewards.py:31-57)
_JOINT_POS = slice(0, 16)
_JOINT_VEL = slice(16, 32)
_FOOT_CONTACTS = slice(32, 34)
_LIN_VEL = slice(34, 37)
_ANG_VEL = slice(37, 40)
_ROOT_QUAT = slice(3, 7)  # of the source 60-dim layout; unused in the sum

_W_LIN_VEL_XY = 1.0
_W_LIN_VEL_Z = 1.0
_W_ANG_VEL_XY = 0.5
_W_ANG_VEL_Z = 0.5
_W_JOINT_POS = 15.0
_W_JOINT_VEL = 1.0e-3
_W_CONTACT = 1.0


def _drop_head(x16: jax.Array) -> jax.Array:
    """16-dim reference joints -> 10 leg joints (drop neck/head/antennas)."""
    return jnp.concatenate([x16[:5], x16[11:]])


def _drop_head_robot(x14: jax.Array) -> jax.Array:
    """14-dim robot joints -> 10 leg joints (drop the 4 head joints)."""
    return jnp.concatenate([x14[:5], x14[9:]])


def reward_imitation(
    base_qpos: jax.Array,
    base_qvel: jax.Array,
    joints_qpos: jax.Array,
    joints_qvel: jax.Array,
    contacts: jax.Array,
    reference_frame: jax.Array,
    cmd: jax.Array,
    use_imitation_reward: bool = False,
) -> jax.Array:
    if not use_imitation_reward:
        return jnp.nan_to_num(0.0)

    cmd_norm = jnp.linalg.norm(cmd[:3])

    ref_lin_vel = reference_frame[_LIN_VEL]
    ref_ang_vel = reference_frame[_ANG_VEL]
    base_lin_vel = base_qvel[:3]
    base_ang_vel = base_qvel[3:6]

    ref_joint_pos = _drop_head(reference_frame[_JOINT_POS])
    ref_joint_vel = _drop_head(reference_frame[_JOINT_VEL])
    joint_pos = _drop_head_robot(joints_qpos)
    joint_vel = _drop_head_robot(joints_qvel)

    ref_contacts = reference_frame[_FOOT_CONTACTS]
    ref_contacts = jnp.where(ref_contacts > 0.5, 1.0, 0.0)

    lin_vel_xy_rew = jnp.exp(
        -8.0 * jnp.sum(jnp.square(base_lin_vel[:2] - ref_lin_vel[:2]))
    ) * _W_LIN_VEL_XY
    lin_vel_z_rew = jnp.exp(
        -8.0 * jnp.sum(jnp.square(base_lin_vel[2] - ref_lin_vel[2]))
    ) * _W_LIN_VEL_Z
    ang_vel_xy_rew = jnp.exp(
        -2.0 * jnp.sum(jnp.square(base_ang_vel[:2] - ref_ang_vel[:2]))
    ) * _W_ANG_VEL_XY
    ang_vel_z_rew = jnp.exp(
        -2.0 * jnp.sum(jnp.square(base_ang_vel[2] - ref_ang_vel[2]))
    ) * _W_ANG_VEL_Z

    joint_pos_rew = -jnp.sum(jnp.square(joint_pos - ref_joint_pos)) * _W_JOINT_POS
    joint_vel_rew = -jnp.sum(jnp.square(joint_vel - ref_joint_vel)) * _W_JOINT_VEL
    contact_rew = jnp.sum(contacts == ref_contacts) * _W_CONTACT

    reward = (
        lin_vel_xy_rew
        + lin_vel_z_rew
        + ang_vel_xy_rew
        + ang_vel_z_rew
        + joint_pos_rew
        + joint_vel_rew
        + contact_rew
    )
    return jnp.nan_to_num(reward * (cmd_norm > 0.01))
