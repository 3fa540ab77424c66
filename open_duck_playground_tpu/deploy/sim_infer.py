"""Sim-to-sim policy validation (parity with reference mujoco_infer.py).

Rolls an exported ONNX policy in the CPU simulator with CLEAN observations
(no training noise/delays, but with the deploy-side +1.3 m/s^2
accelerometer x-bias the reference applies, mujoco_infer.py:74), the same
50 Hz control / 500 Hz physics decimation, action scaling and motor
speed-limit clamping. Saves the obs trace to mujoco_saved_obs.pkl for
plot_saved_obs.py, exactly like upstream.

Headless by default (this image has no interactive viewer): commands come
from a scripted schedule or --command. The keyboard-teleop loop of the
reference maps to --interactive, which requires a terminal.

Usage:
  python -m open_duck_playground_tpu.deploy.sim_infer -o policy.onnx \
      [--task flat_terrain] [--standing] [--seconds 10] \
      [--command vx vy wz np hp hy hr]
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np

from open_duck_playground_tpu.deploy.poly_reference_motion_numpy import (
    PolyReferenceMotion,
)
from open_duck_playground_tpu.deploy.sim_infer_base import SimInferBase
from open_duck_playground_tpu.export.onnx_infer import OnnxInfer
from open_duck_playground_tpu.models.open_duck_mini_v2 import constants

USE_MOTOR_SPEED_LIMITS = True


class SimInfer(SimInferBase):
    def __init__(self, model_path: str, reference_data: str, onnx_model_path: str,
                 standing: bool = False):
        super().__init__(model_path)
        self.standing = standing
        self.dof_vel_scale = 0.05
        self.action_scale = 0.25
        self.max_motor_velocity = 5.24
        self.phase_frequency_factor = 1.0

        if not self.standing:
            self.PRM = PolyReferenceMotion(reference_data)
        self.policy = OnnxInfer(onnx_model_path, awd=True)

        self.last_action = np.zeros(self.num_dofs)
        self.last_last_action = np.zeros(self.num_dofs)
        self.last_last_last_action = np.zeros(self.num_dofs)
        self.commands = [0.0] * 7
        self.imitation_i = 0.0
        self.imitation_phase = np.array([0.0, 0.0])
        self.saved_obs = []

    def get_obs(self, data, command) -> np.ndarray:
        gyro = self.get_gyro(data)
        accelerometer = self.get_accelerometer(data)
        accelerometer[0] += 1.3  # deploy-side IMU bias (mujoco_infer.py:74)
        joint_angles = self.get_actuator_joints_qpos(data.qpos)
        joint_vel = self.get_actuator_joints_qvel(data.qvel)
        contacts = self.get_feet_contacts(data)
        obs = np.concatenate(
            [
                gyro,
                accelerometer,
                command,
                joint_angles - self.default_actuator,
                joint_vel * self.dof_vel_scale,
                self.last_action,
                self.last_last_action,
                self.last_last_last_action,
                self.motor_targets,
                contacts,
                self.imitation_phase,
            ]
        )
        return obs

    def control_step(self) -> np.ndarray:
        """One 50 Hz control tick: obs -> policy -> clamped motor targets."""
        if not self.standing:
            self.imitation_i = (
                self.imitation_i + 1.0 * self.phase_frequency_factor
            ) % self.PRM.nb_steps_in_period
            phase = self.imitation_i / self.PRM.nb_steps_in_period * 2 * np.pi
            self.imitation_phase = np.array([np.cos(phase), np.sin(phase)])

        obs = self.get_obs(self.data, self.commands)
        self.saved_obs.append(obs)
        action = self.policy.infer(obs.astype(np.float32))

        self.last_last_last_action = self.last_last_action.copy()
        self.last_last_action = self.last_action.copy()
        self.last_action = np.array(action).copy()

        self.motor_targets = self.default_actuator + np.array(action) * self.action_scale
        if USE_MOTOR_SPEED_LIMITS:
            lim = self.max_motor_velocity * (self.sim_dt * self.decimation)
            self.motor_targets = np.clip(
                self.motor_targets,
                self.prev_motor_targets - lim,
                self.prev_motor_targets + lim,
            )
            self.prev_motor_targets = self.motor_targets.copy()
        return self.motor_targets

    def run(self, seconds: float = 10.0, save_path: str = "mujoco_saved_obs.pkl"):
        n_ticks = int(seconds * 50)
        try:
            for tick in range(n_ticks):
                targets = self.control_step()
                self.step_control(targets)
                if tick % 50 == 0:
                    up_z = self.get_gravity(self.data)[2]
                    print(
                        f"t={tick / 50:5.1f}s base_z={float(self.data.qpos[2]):.3f} "
                        f"up_z={up_z:.2f} cmd={np.round(self.commands, 2)}",
                        flush=True,
                    )
                if up_fell := (self.get_gravity(self.data)[2] < 0):
                    print("robot fell, stopping")
                    break
        except KeyboardInterrupt:
            pass
        with open(save_path, "wb") as f:
            pickle.dump(self.saved_obs, f)
        print(f"saved {len(self.saved_obs)} obs to {save_path}")
        return self.saved_obs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--onnx_model_path", type=str, required=True)
    parser.add_argument("--task", type=str, default="flat_terrain")
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--reference_data", type=str, default=None)
    parser.add_argument("--standing", action="store_true")
    parser.add_argument("--seconds", type=float, default=10.0)
    parser.add_argument(
        "--command", type=float, nargs=7, default=[0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        help="vx vy wz neck_pitch head_pitch head_yaw head_roll",
    )
    parser.add_argument("--save_obs", type=str, default="mujoco_saved_obs.pkl")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    model_path = args.model_path or constants.task_to_xml(args.task)
    reference_data = args.reference_data or constants.reference_motion_path()
    infer = SimInfer(model_path, reference_data, args.onnx_model_path, args.standing)
    infer.commands = list(args.command)
    infer.run(seconds=args.seconds, save_path=args.save_obs)


if __name__ == "__main__":
    main()
