"""Reference-gait playback (parity with reference ref_motion_viewer.py).

Kinematically replays the polynomial gait library by writing reference
joint targets into qpos each control tick and running forward kinematics.
The reference uses the interactive MuJoCo viewer (+ optional pygame
joysticks); this image is headless, so playback renders foot/base
trajectories to a PNG (--out), an offscreen MuJoCo video (--render), and
--print dumps per-tick frames.

Usage:
  python -m open_duck_playground_tpu.deploy.ref_motion_viewer \
      [--command dx dy dtheta] [--periods 3] [--out ref_motion.png] \
      [--render ref_motion.gif]
"""

from __future__ import annotations

import argparse

import numpy as np

from open_duck_playground_tpu.deploy.poly_reference_motion_numpy import (
    PolyReferenceMotion,
)
from open_duck_playground_tpu.mjcf import compile_mjcf
from open_duck_playground_tpu.mjcf import npdynamics as npd
from open_duck_playground_tpu.models.open_duck_mini_v2 import constants


def playback(command=(0.1, 0.0, 0.0), periods=3, out="ref_motion.png",
             verbose=False, render=None):
    # deploy-side tool: never touch the TPU tunnel for a kinematic replay
    import jax

    jax.config.update("jax_platforms", "cpu")
    prm = PolyReferenceMotion(constants.reference_motion_path())
    model = compile_mjcf(constants.task_to_xml("flat_terrain"))
    kf = model.keyframe("home")

    video = None
    if render:
        from open_duck_playground_tpu.deploy.render import MjVideoRenderer

        video = MjVideoRenderer(constants.task_to_xml("flat_terrain"))

    # reference joint frame indices 0..15 map to the 14 actuators by name
    # order (left leg 5, neck/head 4, right leg 5 with 2 antenna slots
    # dropped: ref dims 9, 10).
    ref_to_act = [0, 1, 2, 3, 4, 5, 6, 7, 8, 11, 12, 13, 14, 15]

    nm = npd.NpModel()
    nm.nbody, nm.njnt, nm.nv, nm.nq = model.nbody, model.njnt, model.nv, model.nq
    for f in ["body_parentid", "body_jntadr", "body_jntnum", "jnt_type",
              "jnt_qposadr", "jnt_dofadr", "jnt_bodyid"]:
        setattr(nm, f, getattr(model, f).np)
    for f in ["body_pos", "body_quat", "jnt_pos", "jnt_axis", "qpos0"]:
        setattr(nm, f, np.asarray(getattr(model, f), np.float64))

    act_qpos_addr = [
        int(model.jnt_qposadr[model.joint(n)]) for n in model.names.list("actuator")
    ]
    lf_site, rf_site = model.site("left_foot"), model.site("right_foot")
    site_bodyid = model.site_bodyid.np
    site_pos = np.asarray(model.site_pos, np.float64)

    foot_traj = []
    n = prm.nb_steps_in_period * periods
    for i in range(n):
        frame = prm.get_reference_motion(*command, i)
        qpos = np.array(kf.qpos, np.float64)
        for k, a in enumerate(ref_to_act):
            qpos[act_qpos_addr[k]] = frame[a]
        xpos, xquat, _, _ = npd.fk(nm, qpos)
        feet = []
        for sid in (lf_site, rf_site):
            b = site_bodyid[sid]
            feet.append(xpos[b] + npd.quat_rot(xquat[b], site_pos[sid]))
        foot_traj.append(np.concatenate(feet))
        if video is not None and i % 2 == 0:  # 50 Hz -> 25 fps
            video.add_qpos_frame(qpos)
        if verbose:
            print(f"i={i:3d} Lfoot={np.round(feet[0], 3)} Rfoot={np.round(feet[1], 3)}")

    foot_traj = np.asarray(foot_traj)
    if video is not None and video.frames:
        video.save(render)
    if out:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        axes[0].plot(foot_traj[:, 2], label="left foot z")
        axes[0].plot(foot_traj[:, 5], label="right foot z")
        axes[0].set_xlabel("tick")
        axes[0].legend()
        axes[1].plot(foot_traj[:, 0], foot_traj[:, 1], label="left foot xy")
        axes[1].plot(foot_traj[:, 3], foot_traj[:, 4], label="right foot xy")
        axes[1].legend()
        fig.suptitle(f"reference gait, cmd={command}")
        fig.tight_layout()
        fig.savefig(out, dpi=110)
        print(f"wrote {out}")
    return foot_traj


def live_view(command=(0.1, 0.0, 0.0), joystick=False, launch=None,
              pygame_module=None, max_seconds=None):
    """Live gait playback in a passive mujoco.viewer window with optional
    dual pygame joystick command input (reference ref_motion_viewer.py:
    67-86, 141-161, 176-207). Kinematic: reference joint targets are
    written into qpos each 50 Hz tick and mj_forward'd — no dynamics."""
    import time

    import mujoco

    from open_duck_playground_tpu.deploy.mujoco_infer_base import load_mj_model
    from open_duck_playground_tpu.deploy.viewer import PygameJoystickTeleop

    if launch is None:
        import mujoco.viewer

        launch = mujoco.viewer.launch_passive
    prm = PolyReferenceMotion(constants.reference_motion_path())
    model = load_mj_model(constants.task_to_xml("flat_terrain"))
    data = mujoco.MjData(model)
    kid = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_KEY, "home")
    mujoco.mj_resetDataKeyframe(model, data, kid)

    command = list(command)
    sticks = PygameJoystickTeleop(command, pygame_module) if joystick else None
    ref_to_act = [0, 1, 2, 3, 4, 5, 6, 7, 8, 11, 12, 13, 14, 15]
    act_qpos_addr = [
        model.jnt_qposadr[mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_JOINT,
                                            mujoco.mj_id2name(
                                                model, mujoco.mjtObj.mjOBJ_ACTUATOR, a))]
        for a in range(model.nu)
    ]
    i, ticks = 0, 0
    with launch(model, data) as viewer:
        while viewer.is_running():
            t0 = time.perf_counter()
            if sticks is not None:
                sticks.poll()
            frame = prm.get_reference_motion(*command, i)
            for k, a in enumerate(ref_to_act):
                data.qpos[act_qpos_addr[k]] = frame[a]
            mujoco.mj_forward(model, data)
            viewer.sync()
            i = (i + 1) % prm.nb_steps_in_period
            ticks += 1
            if max_seconds is not None and ticks >= int(max_seconds * 50):
                break
            leftover = 0.02 - (time.perf_counter() - t0)
            if leftover > 0:
                time.sleep(leftover)
    return ticks


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--command", type=float, nargs=3, default=[0.1, 0.0, 0.0])
    parser.add_argument("--periods", type=int, default=3)
    parser.add_argument("--out", type=str, default="ref_motion.png")
    parser.add_argument("--print", dest="verbose", action="store_true")
    parser.add_argument("--render", type=str, default=None,
                        help="also write a .gif/.mp4 of the playback (EGL)")
    parser.add_argument("--viewer", action="store_true",
                        help="live mujoco.viewer playback (needs a display)")
    parser.add_argument("--joystick", action="store_true",
                        help="pygame joystick command input (with --viewer)")
    args = parser.parse_args()
    if args.viewer:
        live_view(tuple(args.command), joystick=args.joystick)
        return
    playback(tuple(args.command), args.periods, args.out, args.verbose,
             args.render)


if __name__ == "__main__":
    main()
