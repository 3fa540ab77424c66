"""Reward/cost term library (behavioral parity with reference common/rewards.py).

Every term is a pure function, NaN-guarded with nan_to_num like the
reference (the duck's NaN-termination guard relies on rewards staying
finite, reference joystick.py:447,485). Functions beyond the ones the
Joystick/Standing tasks wire up are kept for API parity (reference ships
them as a library, rewards.py:37-241).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# --- tracking ---------------------------------------------------------------


def reward_tracking_lin_vel(commands, local_vel, tracking_sigma):
    """exp(-err/sigma) with a 0.1 m/s tolerance band on lateral velocity."""
    y_tol = 0.1
    err_x = jnp.square(commands[0] - local_vel[0])
    err_y = jnp.clip(jnp.abs(local_vel[1] - commands[1]) - y_tol, 0.0, None)
    err = err_x + jnp.square(err_y)
    return jnp.nan_to_num(jnp.exp(-err / tracking_sigma))


def reward_tracking_ang_vel(commands, ang_vel, tracking_sigma):
    err = jnp.square(commands[2] - ang_vel[2])
    return jnp.nan_to_num(jnp.exp(-err / tracking_sigma))


# --- base motion ------------------------------------------------------------


def cost_lin_vel_z(global_linvel):
    return jnp.nan_to_num(jnp.square(global_linvel[2]))


def cost_ang_vel_xy(global_angvel):
    return jnp.nan_to_num(jnp.sum(jnp.square(global_angvel[:2])))


def cost_orientation(torso_zaxis):
    return jnp.nan_to_num(jnp.sum(jnp.square(torso_zaxis[:2])))


def cost_base_height(base_height, base_height_target):
    return jnp.nan_to_num(jnp.square(base_height - base_height_target))


def reward_base_y_swing(base_y_speed, freq, amplitude, t, tracking_sigma):
    target = amplitude * jnp.sin(2 * jnp.pi * freq * t)
    return jnp.nan_to_num(jnp.exp(-jnp.square(target - base_y_speed) / tracking_sigma))


# --- energy -----------------------------------------------------------------


def cost_torques(torques):
    return jnp.nan_to_num(jnp.sum(jnp.square(torques)))


def cost_energy(qvel, qfrc_actuator):
    return jnp.nan_to_num(jnp.sum(jnp.abs(qvel) * jnp.abs(qfrc_actuator)))


def cost_action_rate(act, last_act):
    return jnp.nan_to_num(jnp.sum(jnp.square(act - last_act)))


# --- pose / joints ----------------------------------------------------------


def cost_joint_pos_limits(qpos, soft_lowers, soft_uppers):
    out = -jnp.clip(qpos - soft_lowers, None, 0.0)
    out += jnp.clip(qpos - soft_uppers, 0.0, None)
    return jnp.nan_to_num(jnp.sum(out))


def cost_stand_still(commands, qpos, qvel, default_pose, ignore_head: bool = False):
    """L1 pose+velocity cost, gated on near-zero command.

    `ignore_head` slices assume the 14-joint order (5 left leg, 4 head,
    5 right leg); the reference hardcodes boundaries 5/9 (rewards.py:105-115).
    """
    cmd_norm = jnp.linalg.norm(commands[:3])
    if not ignore_head:
        pose_cost = jnp.sum(jnp.abs(qpos - default_pose))
        vel_cost = jnp.sum(jnp.abs(qvel))
    else:
        pose_cost = jnp.sum(jnp.abs(qpos[:5] - default_pose[:5])) + jnp.sum(
            jnp.abs(qpos[9:] - default_pose[9:])
        )
        vel_cost = jnp.sum(jnp.abs(qvel[:5])) + jnp.sum(jnp.abs(qvel[9:]))
    return jnp.nan_to_num(pose_cost + vel_cost) * (cmd_norm < 0.01)


def cost_termination(done):
    return done


def reward_alive():
    return jnp.array(1.0)


def cost_head_pos(joints_qpos, joints_qvel, cmd):
    """Head-joint position tracking of the command, gated on locomotion."""
    move_cmd_norm = jnp.linalg.norm(cmd[:3])
    head_pos_error = jnp.sum(jnp.square(joints_qpos[5:9] - cmd[3:]))
    return jnp.nan_to_num(head_pos_error) * (move_cmd_norm > 0.01)


def cost_joint_deviation_hip(qpos, cmd, hip_indices, default_pose):
    cost = jnp.sum(jnp.abs(qpos[hip_indices] - default_pose[hip_indices]))
    cost *= jnp.abs(cmd[1]) > 0.1
    return jnp.nan_to_num(cost)


def cost_joint_deviation_knee(qpos, knee_indices, default_pose):
    return jnp.nan_to_num(jnp.sum(jnp.abs(qpos[knee_indices] - default_pose[knee_indices])))


def cost_pose(qpos, default_pose, weights):
    return jnp.nan_to_num(jnp.sum(jnp.square(qpos - default_pose) * weights))


# --- feet -------------------------------------------------------------------


def cost_feet_slip(contact, global_linvel):
    body_vel = global_linvel[:2]
    return jnp.nan_to_num(jnp.sum(jnp.linalg.norm(body_vel, axis=-1) * contact))


def cost_feet_clearance(feet_vel, foot_pos, max_foot_height):
    vel_norm = jnp.sqrt(jnp.linalg.norm(feet_vel[..., :2], axis=-1))
    delta = jnp.abs(foot_pos[..., -1] - max_foot_height)
    return jnp.nan_to_num(jnp.sum(delta * vel_norm))


def cost_feet_height(swing_peak, first_contact, max_foot_height):
    error = swing_peak / max_foot_height - 1.0
    return jnp.nan_to_num(jnp.sum(jnp.square(error) * first_contact))


def reward_feet_air_time(air_time, first_contact, commands,
                         threshold_min: float = 0.1, threshold_max: float = 0.5):
    cmd_norm = jnp.linalg.norm(commands[:3])
    air_time = (air_time - threshold_min) * first_contact
    air_time = jnp.clip(air_time, max=threshold_max - threshold_min)
    reward = jnp.sum(air_time) * (cmd_norm > 0.01)
    return jnp.nan_to_num(reward)


def reward_feet_phase(foot_pos, rz):
    error = jnp.sum(jnp.square(foot_pos[..., -1] - rz))
    return jnp.nan_to_num(jnp.exp(-error / 0.01))
