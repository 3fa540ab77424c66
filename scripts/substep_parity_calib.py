"""Active-set-matched single-substep parity calibration vs real MuJoCo.

VERDICT r3 #6: the perturbed-TRACE tests bound rollout divergence at ~2x a
measured chaos floor, because iterations=1 Newton makes trajectories
active-set chaotic. This harness removes the trajectory from the equation
(see open_duck_playground_tpu/deploy/substep_parity.py for the comparison
core it shares with tests/test_substep_parity.py) and prints per-scene
error quantiles; the test pins bounds at ~2x the values measured here
(RESULTS/r4/substep_parity_calib.log, substep_parity_settled.log).

Reference anchor: mj_forward pipeline (MuJoCo 3.x engine_forward.c), our
ops/forward.py:193-245.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# the env var alone is ignored under the axon TPU plugin (it would grab the
# single-process tunnel); force the platform at the config level too
import jax

jax.config.update("jax_platforms", "cpu")

import mujoco
import numpy as np

from open_duck_playground_tpu.deploy.substep_parity import (
    geom_name_map,
    run_mode,
)
from open_duck_playground_tpu.mjcf.compiler import compile_mjcf

XMLS = "/root/reference/playground/open_duck_mini_v2/xmls"
SCENES = {
    "flat": f"{XMLS}/scene_flat_terrain.xml",
    "backlash": f"{XMLS}/scene_flat_terrain_backlash.xml",
}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", nargs="+", default=["perturbed", "settled"])
    ap.add_argument("--K", type=int, default=40)
    args = ap.parse_args()

    rngmaster = np.random.default_rng(0)
    for scene, path in SCENES.items():
        om = compile_mjcf(path, timestep=0.002)
        mm = mujoco.MjModel.from_xml_path(path)
        dd = mujoco.MjData(mm)
        gmap = geom_name_map(om, mm)
        kf = om.keyframe("home")
        for mode in args.modes:
            stats = run_mode(om, mm, dd, gmap, kf, mode, args.K, rngmaster)
            print(f"=== {scene} / {mode} (K={args.K} states) ===")
            for key, vals in stats.items():
                if not vals:
                    print(f"  {key:18s} (none)")
                    continue
                v = np.asarray(vals, np.float64)
                print(f"  {key:18s} n={len(v):4d} med={np.median(v):.3e} "
                      f"p90={np.percentile(v, 90):.3e} max={v.max():.3e}")


if __name__ == "__main__":
    main()
