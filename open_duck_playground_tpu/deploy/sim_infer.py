"""Sim-to-sim policy validation on this framework's own engine.

Rolls an exported ONNX policy in the CPU simulator with CLEAN observations
(no training noise/delays, but with the deploy-side +1.3 m/s^2
accelerometer x-bias the reference applies, mujoco_infer.py:74), the same
50 Hz control / 500 Hz physics decimation, action scaling and motor
speed-limit clamping. Saves the obs trace to mujoco_saved_obs.pkl for
plot_saved_obs.py, exactly like upstream.

The control loop is shared with deploy/mujoco_infer.py (the independent
MuJoCo C engine twin) via deploy/policy_loop.py — run both and diff the
obs traces with deploy/plot_saved_obs.py to localize engine gaps.

Headless by default; `--interactive` enables terminal keyboard teleop
(same key map as the reference's viewer callback — see deploy/teleop.py).

Usage:
  python -m open_duck_playground_tpu.deploy.sim_infer -o policy.onnx \
      [--task flat_terrain] [--standing] [--seconds 10] \
      [--command vx vy wz np hp hy hr] [--interactive]
"""

from __future__ import annotations

import argparse

from open_duck_playground_tpu.deploy.policy_loop import (  # noqa: F401
    USE_MOTOR_SPEED_LIMITS,
    PolicyLoopMixin,
)
from open_duck_playground_tpu.deploy.sim_infer_base import SimInferBase
from open_duck_playground_tpu.models.open_duck_mini_v2 import constants


class SimInfer(PolicyLoopMixin, SimInferBase):
    def __init__(self, model_path: str, reference_data: str,
                 onnx_model_path: str, standing: bool = False):
        SimInferBase.__init__(self, model_path)
        self.init_policy_loop(reference_data, onnx_model_path, standing)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-o", "--onnx_model_path", type=str, required=True)
    parser.add_argument("--task", type=str, default="flat_terrain")
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--reference_data", type=str, default=None)
    parser.add_argument("--standing", action="store_true")
    parser.add_argument("--seconds", type=float, default=10.0)
    parser.add_argument(
        "--command", type=float, nargs=7,
        default=[0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        help="vx vy wz neck_pitch head_pitch head_yaw head_roll",
    )
    parser.add_argument("--interactive", action="store_true",
                        help="terminal keyboard teleop (see deploy/teleop.py)")
    parser.add_argument("--save_obs", type=str, default="mujoco_saved_obs.pkl")
    parser.add_argument("--render", type=str, default=None,
                        help="record the rollout to a .gif/.mp4 (EGL offscreen; "
                             "frames re-posed in MuJoCo from our engine's qpos)")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    model_path = args.model_path or constants.task_to_xml(args.task)
    reference_data = args.reference_data or constants.reference_motion_path()
    infer = SimInfer(model_path, reference_data, args.onnx_model_path,
                     args.standing)
    infer.commands = list(args.command)
    teleop = None
    if args.interactive:
        from open_duck_playground_tpu.deploy.teleop import StdinTeleop

        teleop = StdinTeleop()
    video = None
    if args.render:
        from open_duck_playground_tpu.deploy.render import MjVideoRenderer

        video = MjVideoRenderer(model_path)
    try:
        infer.run(seconds=args.seconds, save_path=args.save_obs, teleop=teleop,
                  video=video)
    finally:
        if teleop is not None:
            teleop.close()
        if video is not None and video.frames:
            video.save(args.render)


if __name__ == "__main__":
    main()
