"""Joystick-command walking task (behavioral parity with reference joystick.py).

Same config surface, observation layout (101-d actor / 212-d critic), reward
terms and scales, action/IMU delays, random pushes, command resampling and
termination rule as the reference task; built on our TPU-native physics.

Reference quirks intentionally preserved (SURVEY.md "quirks" list):
- the +1.3 m/s^2 accelerometer x-bias is a discarded no-op in training
  (joystick.py:502), so we do not apply it either;
- the same RNG key is reused for gravity noise and IMU-delay sampling
  (joystick.py:513-529);
- `stand_still` uses ignore_head=False (joystick.py:659-666).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from ml_collections import config_dict

from open_duck_playground_tpu.envs import base as duck_base
from open_duck_playground_tpu.envs import rewards as rw
from open_duck_playground_tpu.envs.imitation import reward_imitation
from open_duck_playground_tpu.envs.reference_motion import PolyReferenceMotion
from open_duck_playground_tpu.envs.types import State
from open_duck_playground_tpu.models.open_duck_mini_v2 import constants
from open_duck_playground_tpu.ops import forward as fwd
from open_duck_playground_tpu.ops import math3d as m3
from open_duck_playground_tpu.ops.types import Data, Model

USE_IMITATION_REWARD = True
USE_MOTOR_SPEED_LIMITS = True


# the ONE clock law, shared with the jax-free deploy twin (gait_clock.py)
from open_duck_playground_tpu.envs.gait_clock import (  # noqa: E402,F401
    phase_frequency_from_command,
)


def default_config() -> config_dict.ConfigDict:
    return config_dict.create(
        ctrl_dt=0.02,
        sim_dt=0.002,
        episode_length=1000,
        action_repeat=1,
        action_scale=0.25,
        dof_vel_scale=0.05,
        history_len=0,
        soft_joint_pos_limit_factor=0.95,
        max_motor_velocity=5.24,  # rad/s
        noise_config=config_dict.create(
            level=1.0,
            action_min_delay=0,  # env steps
            action_max_delay=3,
            imu_min_delay=0,
            imu_max_delay=3,
            scales=config_dict.create(
                hip_pos=0.03,
                knee_pos=0.05,
                ankle_pos=0.08,
                joint_vel=2.5,
                gravity=0.1,
                linvel=0.1,
                gyro=0.1,
                accelerometer=0.05,
            ),
        ),
        reward_config=config_dict.create(
            scales=config_dict.create(
                tracking_lin_vel=2.5,
                tracking_ang_vel=6.0,
                torques=-1.0e-3,
                action_rate=-0.5,
                stand_still=-0.2,
                alive=20.0,
                imitation=1.0,
            ),
            tracking_sigma=0.01,
        ),
        push_config=config_dict.create(
            enable=True,
            interval_range=[5.0, 10.0],
            magnitude_range=[0.1, 1.0],
        ),
        # Gait-clock conditioning (round-4 recipe extension). Defaults
        # preserve exact reference parity (integer clock, factor 1.0).
        # The reference exposes the same control only at deploy time, as
        # the teleop p/m keys (reference mujoco_infer.py:105-154); here it
        # can be trained in so that deploy needs no hand-tuned knob:
        #   - phase_frequency_range: per-episode factor ~ U(lo, hi)
        #   - phase_frequency_vx_ref > 0 enables the command-conditioned
        #     law factor = clip(|cmd_vx| / vx_ref, 1, phase_frequency_max),
        #     mirrored at deploy via ONNX metadata (export/export.py).
        phase_frequency_range=[1.0, 1.0],
        phase_frequency_vx_ref=0.0,
        phase_frequency_max=1.4,
        lin_vel_x=[-0.15, 0.15],
        lin_vel_y=[-0.2, 0.2],
        ang_vel_yaw=[-1.0, 1.0],
        neck_pitch_range=[-0.34, 1.1],
        head_pitch_range=[-0.78, 0.78],
        head_yaw_range=[-1.5, 1.5],
        head_roll_range=[-0.5, 0.5],
        head_range_factor=1.0,
    )


class Joystick(duck_base.OpenDuckMiniV2Env):
    """Track a joystick command (vx, vy, wz, 4 head joint targets)."""

    def __init__(
        self,
        task: str = "flat_terrain",
        config: Optional[config_dict.ConfigDict] = None,
        config_overrides: Optional[Dict[str, Union[str, int, list]]] = None,
    ):
        super().__init__(
            xml_path=constants.task_to_xml(task),
            config=config or default_config(),
            config_overrides=config_overrides,
        )
        self._post_init()

    def _post_init(self) -> None:
        m = self._model
        kf = m.keyframe("home")
        self._init_q = jnp.asarray(kf.qpos, jnp.float32)
        self._default_actuator = jnp.asarray(kf.ctrl, jnp.float32)

        if USE_IMITATION_REWARD:
            self.PRM = PolyReferenceMotion(constants.reference_motion_path())

        lowers = np.asarray(m.jnt_range, np.float32)[1:, 0]
        uppers = np.asarray(m.jnt_range, np.float32)[1:, 1]
        c = (lowers + uppers) / 2
        r = uppers - lowers
        f = self._config.soft_joint_pos_limit_factor
        self._soft_lowers = jnp.asarray(c - 0.5 * r * f)
        self._soft_uppers = jnp.asarray(c + 0.5 * r * f)

        self._torso_body_id = m.body(constants.ROOT_BODY)
        self._torso_mass = float(m.body_subtreemass[self._torso_body_id])
        self._site_id = m.site("imu")
        self._feet_site_id = np.asarray(
            [m.site(n) for n in constants.FEET_SITES], np.int32
        )
        self._floor_geom_id = m.geom("floor")
        self._feet_geom_id = np.asarray(
            [m.geom(n) for n in constants.FEET_GEOMS], np.int32
        )
        self._feet_floor_pairs = [
            m.find_pair(int(g), self._floor_geom_id) for g in self._feet_geom_id
        ]

        adr = []
        for site in constants.FEET_SITES:
            sid = m.sensor(f"{site}_global_linvel")
            s_adr = int(m.sensor_adr[sid])
            adr.append(list(range(s_adr, s_adr + int(m.sensor_dim[sid]))))
        self._foot_linvel_sensor_adr = jnp.asarray(adr, jnp.int32)

        qpos_noise_scale = np.zeros(m.nu, np.float32)
        joints = constants.JOINTS_ORDER_NO_HEAD
        sc = self._config.noise_config.scales
        qpos_noise_scale[[i for i, j in enumerate(joints) if "_hip" in j]] = sc.hip_pos
        qpos_noise_scale[[i for i, j in enumerate(joints) if "_knee" in j]] = sc.knee_pos
        qpos_noise_scale[[i for i, j in enumerate(joints) if "_ankle" in j]] = sc.ankle_pos
        self._qpos_noise_scale = jnp.asarray(qpos_noise_scale)

    # ------------------------------------------------------------------
    def reset_with_model(self, model: Model, rng: jax.Array) -> State:
        qpos = self._init_q
        qvel = jnp.zeros(model.nv)

        # base xy jitter +-5 cm (reference joystick.py:213-221)
        rng, key = jax.random.split(rng)
        dxy = jax.random.uniform(key, (2,), minval=-0.05, maxval=0.05)
        base_qpos = self.get_floating_base_qpos(qpos)
        base_qpos = base_qpos.at[0:2].set(base_qpos[0:2] + dxy)

        # yaw jitter U(-pi, pi)
        rng, key = jax.random.split(rng)
        yaw = jax.random.uniform(key, (1,), minval=-3.14, maxval=3.14)
        quat = m3.axis_angle_to_quat(jnp.array([0.0, 0.0, 1.0]), yaw)
        new_quat = m3.quat_mul(base_qpos[3:7], quat)
        base_qpos = base_qpos.at[3:7].set(new_quat)
        qpos = self.set_floating_base_qpos(base_qpos, qpos)

        # joint scale noise *U(0.5, 1.5)
        rng, key = jax.random.split(rng)
        qpos_j = self.get_actuator_joints_qpos(qpos) * jax.random.uniform(
            key, (model.nu,), minval=0.5, maxval=1.5
        )
        qpos = self.set_actuator_joints_qpos(qpos_j, qpos)

        # base velocity noise U(-0.05, 0.05)
        rng, key = jax.random.split(rng)
        qvel = self.set_floating_base_qvel(
            jax.random.uniform(key, (6,), minval=-0.05, maxval=0.05), qvel
        )

        ctrl = self.get_actuator_joints_qpos(qpos)
        data = self.physics_init(model, qpos, qvel, ctrl)

        rng, cmd_rng = jax.random.split(rng)
        cmd = self.sample_command(cmd_rng)

        # per-episode gait-clock factor; the split is gated on a static
        # config check so the default recipe's RNG stream is unchanged
        fr = tuple(self._config.phase_frequency_range)
        if fr != (1.0, 1.0):
            rng, freq_rng = jax.random.split(rng)
            imitation_freq = jax.random.uniform(
                freq_rng, minval=fr[0], maxval=fr[1]
            ).astype(jnp.float32)
        else:
            imitation_freq = jnp.float32(1.0)

        rng, push_rng = jax.random.split(rng)
        push_interval = jax.random.uniform(
            push_rng,
            minval=self._config.push_config.interval_range[0],
            maxval=self._config.push_config.interval_range[1],
        )
        push_interval_steps = jnp.round(push_interval / self.dt).astype(jnp.int32)

        if USE_IMITATION_REWARD:
            current_reference_motion = self.PRM.get_reference_motion(
                cmd[0], cmd[1], cmd[2], 0
            )
        else:
            current_reference_motion = jnp.zeros(0)

        info = {
            "rng": rng,
            "step": jnp.asarray(0, jnp.int32),
            "command": cmd,
            "last_act": jnp.zeros(model.nu),
            "last_last_act": jnp.zeros(model.nu),
            "last_last_last_act": jnp.zeros(model.nu),
            "motor_targets": self._default_actuator,
            "feet_air_time": jnp.zeros(2),
            "last_contact": jnp.zeros(2, dtype=bool),
            "swing_peak": jnp.zeros(2),
            "push": jnp.array([0.0, 0.0]),
            "push_step": jnp.asarray(0, jnp.int32),
            "push_interval_steps": push_interval_steps,
            "action_history": jnp.zeros(
                self._config.noise_config.action_max_delay * model.nu
            ),
            "imu_history": jnp.zeros(self._config.noise_config.imu_max_delay * 3),
            # float clock: advances by imitation_freq * command-law factor
            # per ctrl step; at the default factor 1.0 the visited values
            # (0.0, 1.0, ... mod period) are bit-identical to the reference's
            # integer counter (small ints are exact in f32)
            "imitation_i": jnp.asarray(0.0, jnp.float32),
            "imitation_freq": imitation_freq,
            "current_reference_motion": current_reference_motion,
            "imitation_phase": jnp.zeros(2),
        }

        metrics = {}
        for k, v in self._config.reward_config.scales.items():
            if v != 0:
                key_name = f"reward/{k}" if v > 0 else f"cost/{k}"
                metrics[key_name] = jnp.zeros(())
        metrics["swing_peak"] = jnp.zeros(())

        contact = jnp.array(
            [
                duck_base.geoms_colliding(model, data, int(gid), self._floor_geom_id)
                for gid in self._feet_geom_id
            ]
        )
        obs = self._get_obs(data, info, contact)
        reward, done = jnp.zeros(2)
        return State(data, obs, reward, done, metrics, info)

    # ------------------------------------------------------------------
    def step_with_model(self, model: Model, state: State, action: jax.Array) -> State:
        info = dict(state.info)

        if USE_IMITATION_REWARD:
            freq = info["imitation_freq"] * phase_frequency_from_command(
                info["command"][0],
                float(self._config.phase_frequency_vx_ref),
                float(self._config.phase_frequency_max),
            )
            imitation_i = jnp.mod(
                info["imitation_i"] + freq, self.PRM.nb_steps_in_period
            )
            info["imitation_i"] = imitation_i
            phase = (imitation_i / self.PRM.nb_steps_in_period) * 2 * jnp.pi
            info["imitation_phase"] = jnp.array([jnp.cos(phase), jnp.sin(phase)])
            info["current_reference_motion"] = self.PRM.get_reference_motion(
                info["command"][0], info["command"][1], info["command"][2], imitation_i
            )
        else:
            info["imitation_i"] = jnp.float32(0.0)
            info["current_reference_motion"] = jnp.zeros(0)

        info["rng"], push1_rng, push2_rng, action_delay_rng = jax.random.split(
            info["rng"], 4
        )

        # action delay: 3-slot rolled history, uniform random delay slot
        nu = model.nu
        action_history = (
            jnp.roll(info["action_history"], nu).at[:nu].set(action)
        )
        info["action_history"] = action_history
        action_idx = jax.random.randint(
            action_delay_rng,
            (1,),
            minval=self._config.noise_config.action_min_delay,
            maxval=self._config.noise_config.action_max_delay,
        )
        action_w_delay = action_history.reshape((-1, nu))[action_idx[0]]

        # random push: overwrite base xy velocity every push_interval steps
        push_theta = jax.random.uniform(push1_rng, maxval=2 * jnp.pi)
        push_magnitude = jax.random.uniform(
            push2_rng,
            minval=self._config.push_config.magnitude_range[0],
            maxval=self._config.push_config.magnitude_range[1],
        )
        push = jnp.array([jnp.cos(push_theta), jnp.sin(push_theta)])
        push *= (
            jnp.mod(info["push_step"] + 1, info["push_interval_steps"]) == 0
        )
        push *= self._config.push_config.enable
        qvel = state.data.qvel
        a = self._floating_base_qvel_addr
        qvel = qvel.at[a : a + 2].set(push * push_magnitude + qvel[a : a + 2])
        data = state.data.replace(qvel=qvel)

        motor_targets = (
            self._default_actuator + action_w_delay * self._config.action_scale
        )
        if USE_MOTOR_SPEED_LIMITS:
            prev = info["motor_targets"]
            lim = self._config.max_motor_velocity * self.dt
            motor_targets = jnp.clip(motor_targets, prev - lim, prev + lim)

        data = self.physics_step(model, data, motor_targets)
        info["motor_targets"] = motor_targets

        contact = jnp.array(
            [
                duck_base.geoms_colliding(model, data, int(gid), self._floor_geom_id)
                for gid in self._feet_geom_id
            ]
        )
        contact_filt = contact | info["last_contact"]
        first_contact = (info["feet_air_time"] > 0.0) * contact_filt
        info["feet_air_time"] += self.dt
        p_fz = data.site_xpos[self._feet_site_id][..., -1]
        info["swing_peak"] = jnp.maximum(info["swing_peak"], p_fz)

        obs = self._get_obs(data, info, contact)
        done = self._get_termination(data)

        rewards = self._get_reward(data, action, info, done, first_contact, contact)
        rewards = {
            k: v * self._config.reward_config.scales[k] for k, v in rewards.items()
        }
        reward = jnp.clip(sum(rewards.values()) * self.dt, 0.0, 10000.0)

        info["push"] = push
        info["step"] += 1
        info["push_step"] += 1
        info["last_last_last_act"] = info["last_last_act"]
        info["last_last_act"] = info["last_act"]
        info["last_act"] = action
        info["rng"], cmd_rng = jax.random.split(info["rng"])
        info["command"] = jnp.where(
            info["step"] > 500, self.sample_command(cmd_rng), info["command"]
        )
        info["step"] = jnp.where(done | (info["step"] > 500), 0, info["step"])
        info["feet_air_time"] *= ~contact
        info["last_contact"] = contact
        info["swing_peak"] *= ~contact

        metrics = dict(state.metrics)
        for k, v in rewards.items():
            scale = self._config.reward_config.scales[k]
            if scale != 0:
                if scale > 0:
                    metrics[f"reward/{k}"] = v
                else:
                    metrics[f"cost/{k}"] = -v
        metrics["swing_peak"] = jnp.mean(info["swing_peak"])

        done = done.astype(reward.dtype)
        return state.replace(
            data=data, obs=obs, reward=reward, done=done, metrics=metrics, info=info
        )

    # ------------------------------------------------------------------
    def _get_termination(self, data: Data) -> jax.Array:
        fall = self.get_gravity(data)[-1] < 0.0
        return fall | jnp.isnan(data.qpos).any() | jnp.isnan(data.qvel).any()

    def _get_obs(self, data: Data, info: Dict[str, Any], contact: jax.Array):
        cfg = self._config.noise_config

        gyro = self.get_gyro(data)
        info["rng"], noise_rng = jax.random.split(info["rng"])
        noisy_gyro = (
            gyro
            + (2 * jax.random.uniform(noise_rng, shape=gyro.shape) - 1)
            * cfg.level
            * cfg.scales.gyro
        )

        accelerometer = self.get_accelerometer(data)
        # NOTE: the reference's +1.3 x-bias is a discarded no-op
        # (joystick.py:502); deliberately not applied for parity.
        info["rng"], noise_rng = jax.random.split(info["rng"])
        noisy_accelerometer = (
            accelerometer
            + (2 * jax.random.uniform(noise_rng, shape=accelerometer.shape) - 1)
            * cfg.level
            * cfg.scales.accelerometer
        )

        gravity = data.site_xmat[self._site_id].T @ jnp.array([0.0, 0.0, -1.0])
        info["rng"], noise_rng = jax.random.split(info["rng"])
        noisy_gravity = (
            gravity
            + (2 * jax.random.uniform(noise_rng, shape=gravity.shape) - 1)
            * cfg.level
            * cfg.scales.gravity
        )

        # IMU delay (reference reuses noise_rng for the delay index)
        imu_history = jnp.roll(info["imu_history"], 3).at[:3].set(noisy_gravity)
        info["imu_history"] = imu_history
        imu_idx = jax.random.randint(
            noise_rng, (1,), minval=cfg.imu_min_delay, maxval=cfg.imu_max_delay
        )
        noisy_gravity = imu_history.reshape((-1, 3))[imu_idx[0]]

        # backlash folding: observed joint angle = actuator + backlash dof
        joint_angles = self.get_actuator_joints_qpos(data.qpos)
        joint_backlash = self.get_actuator_backlash_qpos(data.qpos)
        for i in self.backlash_idx_to_add:
            joint_backlash = jnp.insert(joint_backlash, i, 0)
        joint_angles = joint_angles + joint_backlash

        info["rng"], noise_rng = jax.random.split(info["rng"])
        noisy_joint_angles = (
            joint_angles
            + (2.0 * jax.random.uniform(noise_rng, shape=joint_angles.shape) - 1.0)
            * cfg.level
            * self._qpos_noise_scale
        )

        joint_vel = self.get_actuator_joints_qvel(data.qvel)
        info["rng"], noise_rng = jax.random.split(info["rng"])
        noisy_joint_vel = (
            joint_vel
            + (2.0 * jax.random.uniform(noise_rng, shape=joint_vel.shape) - 1.0)
            * cfg.level
            * cfg.scales.joint_vel
        )

        linvel = self.get_local_linvel(data)

        state = jnp.hstack(
            [
                noisy_gyro,  # 3
                noisy_accelerometer,  # 3
                info["command"],  # 7
                noisy_joint_angles - self._default_actuator,  # 14
                noisy_joint_vel * self._config.dof_vel_scale,  # 14
                info["last_act"],  # 14
                info["last_last_act"],  # 14
                info["last_last_last_act"],  # 14
                info["motor_targets"],  # 14
                contact,  # 2
                info["imitation_phase"],  # 2
            ]
        )

        global_angvel = self.get_global_angvel(data)
        feet_vel = data.sensordata[self._foot_linvel_sensor_adr].ravel()
        root_height = data.qpos[self._floating_base_qpos_addr + 2]

        privileged_state = jnp.hstack(
            [
                state,
                gyro,  # 3
                accelerometer,  # 3
                gravity,  # 3
                linvel,  # 3
                global_angvel,  # 3
                joint_angles - self._default_actuator,  # 14
                joint_vel,  # 14
                root_height,  # 1
                data.actuator_force,  # 14
                contact,  # 2
                feet_vel,  # 6
                info["feet_air_time"],  # 2
                info["current_reference_motion"],  # 40
                info["imitation_i"],  # 1
                info["imitation_phase"],  # 2
            ]
        )

        return {"state": state, "privileged_state": privileged_state}

    def _get_reward(self, data, action, info, done, first_contact, contact):
        del done, first_contact
        return {
            "tracking_lin_vel": rw.reward_tracking_lin_vel(
                info["command"], self.get_local_linvel(data),
                self._config.reward_config.tracking_sigma,
            ),
            "tracking_ang_vel": rw.reward_tracking_ang_vel(
                info["command"], self.get_gyro(data),
                self._config.reward_config.tracking_sigma,
            ),
            "torques": rw.cost_torques(data.actuator_force),
            "action_rate": rw.cost_action_rate(action, info["last_act"]),
            "alive": rw.reward_alive(),
            "imitation": reward_imitation(
                self.get_floating_base_qpos(data.qpos),
                self.get_floating_base_qvel(data.qvel),
                self.get_actuator_joints_qpos(data.qpos),
                self.get_actuator_joints_qvel(data.qvel),
                contact,
                info["current_reference_motion"],
                info["command"],
                USE_IMITATION_REWARD,
            ),
            "stand_still": rw.cost_stand_still(
                info["command"],
                self.get_actuator_joints_qpos(data.qpos),
                self.get_actuator_joints_qvel(data.qvel),
                self._default_actuator,
                ignore_head=False,
            ),
        }

    def sample_command(self, rng: jax.Array) -> jax.Array:
        rng1, rng2, rng3, rng4, rng5, rng6, rng7, rng8 = jax.random.split(rng, 8)
        cfg = self._config
        f = cfg.head_range_factor

        lin_vel_x = jax.random.uniform(
            rng1, minval=cfg.lin_vel_x[0], maxval=cfg.lin_vel_x[1]
        )
        lin_vel_y = jax.random.uniform(
            rng2, minval=cfg.lin_vel_y[0], maxval=cfg.lin_vel_y[1]
        )
        ang_vel_yaw = jax.random.uniform(
            rng3, minval=cfg.ang_vel_yaw[0], maxval=cfg.ang_vel_yaw[1]
        )
        neck_pitch = jax.random.uniform(
            rng5, minval=cfg.neck_pitch_range[0] * f, maxval=cfg.neck_pitch_range[1] * f
        )
        head_pitch = jax.random.uniform(
            rng6, minval=cfg.head_pitch_range[0] * f, maxval=cfg.head_pitch_range[1] * f
        )
        head_yaw = jax.random.uniform(
            rng7, minval=cfg.head_yaw_range[0] * f, maxval=cfg.head_yaw_range[1] * f
        )
        head_roll = jax.random.uniform(
            rng8, minval=cfg.head_roll_range[0] * f, maxval=cfg.head_roll_range[1] * f
        )

        return jnp.where(
            jax.random.bernoulli(rng4, p=0.1),
            jnp.zeros(7),
            jnp.hstack(
                [lin_vel_x, lin_vel_y, ang_vel_yaw, neck_pitch, head_pitch, head_yaw, head_roll]
            ),
        )
