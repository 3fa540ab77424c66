"""Root-cause probe: where is MuJoCo's prism hfield collider stable?

Round-3 finding (tests/test_mujoco_parity.py:360-436): on the reference's
256x256 hfield PNG (scene_rough_terrain_backlash.xml:22, 7.8 cm cells,
<=1 cm bumps) real MuJoCo ejects even a motionless duck from the home
keyframe — including on a CONSTANT-ZERO hfield — with contacts on the
rear/inner foot-mesh edges carrying sideways/downward normals.

This probe scans the two knobs VERDICT r3 #2 names (resolution coarsening,
settle protocol) plus amplitude, by rebuilding the scene with a synthetic
hfield of given (nrow, amplitude) and rolling 2 s from the settled home
keyframe in BOTH engines. Output: a stability matrix used to pick the
"judge hfield" — the roughest terrain where MuJoCo itself is well-posed —
so the rough policy gets a second-engine gate (scripts/sim2sim_check.py
--task rough_judge).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_XMLS = "/root/reference/playground/open_duck_mini_v2/xmls"
SCENE = f"{REF_XMLS}/scene_rough_terrain_backlash.xml"


def make_hfield(nrow: int, amplitude_m: float, zmax: float, seed: int = 0):
    """Synthetic rough terrain: the SAME recipe the shipped judge scene uses
    (one source of truth — the probe's stability matrix must measure the
    terrain the judge gate runs on)."""
    from open_duck_playground_tpu.models.open_duck_mini_v2.judge_terrain import (
        judge_heightfield,
    )

    h = judge_heightfield(nrow=nrow, seed=seed)
    # MuJoCo scales data [0,1] by size[2]=zmax; shrink to the amplitude
    return (h * (amplitude_m / zmax)).astype(np.float32)


def load_mj_with_hfield(nrow: int, amplitude_m: float, seed: int = 0):
    import mujoco

    # rebuild the hfield asset at the probe resolution (replacing the PNG
    # reference with an empty nrow x ncol elevation grid we then fill)
    with open(SCENE) as f:
        xml = f.read()
    xml = xml.replace('file="assets/hfield.png"', f'nrow="{nrow}" ncol="{nrow}"')
    spec_model = mujoco.MjModel.from_xml_string(xml, _asset_dict())
    zmax = float(spec_model.hfield_size[0][2])
    data = make_hfield(nrow, amplitude_m, zmax, seed)
    spec_model.hfield_data[:] = data.ravel()
    return spec_model, data


def _asset_dict():
    assets = {}
    adir = f"{REF_XMLS}/assets"
    for fn in os.listdir(adir):
        with open(os.path.join(adir, fn), "rb") as f:
            assets[f"assets/{fn}"] = f.read()
    # the scene <include>s the robot XML by bare name
    for fn in os.listdir(REF_XMLS):
        if fn.endswith(".xml"):
            with open(os.path.join(REF_XMLS, fn), "rb") as f:
                assets[fn] = f.read()
    return assets


def settle_and_roll(model, seconds=2.0, settle_forward=True, spawn_dz=0.0):
    import mujoco

    data = mujoco.MjData(model)
    mujoco.mj_resetDataKeyframe(model, data, 0)
    data.qpos[2] += spawn_dz
    if settle_forward:
        mujoco.mj_forward(model, data)
    n = int(seconds / model.opt.timestep)
    min_z, bad_normals = 1e9, 0
    for i in range(n):
        mujoco.mj_step(model, data)
        min_z = min(min_z, float(data.qpos[2]))
        for c in range(data.ncon):
            if data.contact[c].frame[2] < -0.2:  # downward-ish normal z
                bad_normals += 1
        if not np.isfinite(data.qpos).all():
            return {"stood": False, "min_z": min_z, "bad_normals": bad_normals,
                    "final_z": float("nan"), "qvel": float("nan")}
    return {
        "stood": bool(data.qpos[2] > 0.1 and min_z > 0.08),
        "min_z": round(min_z, 4),
        "final_z": round(float(data.qpos[2]), 4),
        "qvel": round(float(np.linalg.norm(data.qvel)), 4),
        "bad_normals": bad_normals,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nrows", type=int, nargs="+",
                   default=[256, 128, 64, 32, 16])
    p.add_argument("--amps", type=float, nargs="+",
                   default=[0.0, 0.005, 0.01])
    p.add_argument("--spawn_dz", type=float, default=0.0)
    p.add_argument("--seconds", type=float, default=2.0)
    args = p.parse_args()

    print(f"{'nrow':>5} {'amp_m':>6} {'stood':>5} {'min_z':>7} {'final_z':>8} "
          f"{'|qvel|':>7} {'bad_normals':>11}")
    for nrow in args.nrows:
        for amp in args.amps:
            model, _ = load_mj_with_hfield(nrow, amp)
            r = settle_and_roll(model, seconds=args.seconds,
                                spawn_dz=args.spawn_dz)
            print(f"{nrow:>5} {amp:>6} {str(r['stood']):>5} {r['min_z']:>7} "
                  f"{r['final_z']:>8} {r['qvel']:>7} {r['bad_normals']:>11}",
                  flush=True)


if __name__ == "__main__":
    main()
