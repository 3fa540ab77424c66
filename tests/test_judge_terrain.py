"""Judge hfield: the rough scene where BOTH engines are well-posed.

Round-4 root cause (scripts/probe_mj_hfield.py, RESULTS/r4/
probe_mj_hfield.log): real MuJoCo's prism hfield collider ejects the home-
keyframe duck at the reference PNG's 256x256 resolution even on a
CONSTANT-ZERO hfield (min_z -0.17 within 2 s), while at nrow<=128 it is
stable for all amplitudes up to the scene's 1 cm ceiling. The companion
test pinning the 256 pathology is
tests/test_mujoco_parity.py::test_hfield_rough_stands_where_mujoco_falls.

These tests pin the fix: the generated 64x64 judge scene
(models/open_duck_mini_v2/judge_terrain.py) keeps MuJoCo stable, so rough
policies get a real second-engine acceptance gate
(sim2sim_check.py --task rough_judge_backlash, VERDICT r3 #2). The
cross-engine settle agreement lives in scripts/judge_cross_engine.py
(RESULTS/r4/judge_cross_engine.log) and as the RUN_SLOW test below.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from open_duck_playground_tpu.models.open_duck_mini_v2 import judge_terrain
from open_duck_playground_tpu.models.open_duck_mini_v2.constants import task_to_xml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_judge_scene_generation_deterministic():
    path = task_to_xml("rough_judge_backlash")
    assert os.path.exists(path)
    h1 = judge_terrain.judge_heightfield()
    h2 = judge_terrain.judge_heightfield()
    assert h1.shape == (judge_terrain.JUDGE_NROW, judge_terrain.JUDGE_NROW)
    np.testing.assert_array_equal(h1, h2)
    assert h1.min() == 0.0 and h1.max() == 1.0
    # regeneration is idempotent: same scene path, same PNG bytes
    png = os.path.join(os.path.dirname(path), "assets", "hfield_judge.png")
    with open(png, "rb") as f:
        before = f.read()
    assert task_to_xml("rough_judge_backlash") == path
    with open(png, "rb") as f:
        assert f.read() == before


def test_mujoco_stable_on_judge_scene():
    """Real MuJoCo from the home keyframe: stands for 2 s on the judge
    hfield (the same protocol that ejects the duck on the 256x256 PNG)."""
    import mujoco

    from open_duck_playground_tpu.deploy.mujoco_infer_base import load_mj_model

    path = task_to_xml("rough_judge_backlash")
    mm = load_mj_model(path)
    assert int(mm.hfield_nrow[0]) == judge_terrain.JUDGE_NROW
    dd = mujoco.MjData(mm)
    kid = mujoco.mj_name2id(mm, mujoco.mjtObj.mjOBJ_KEY, "home")
    mujoco.mj_resetDataKeyframe(mm, dd, kid)
    dd.ctrl[:] = mm.key_ctrl[kid]
    min_z = 1e9
    for _ in range(1000):  # 2 s at 2 ms
        mujoco.mj_step(mm, dd)
        min_z = min(min_z, float(dd.qpos[2]))
    assert np.isfinite(dd.qpos).all()
    assert dd.qpos[2] > 0.1 and min_z > 0.08, (dd.qpos[2], min_z)
    assert np.linalg.norm(dd.qvel) < 0.5


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="pays the hfield physics compile; set RUN_SLOW=1")
def test_judge_scene_cross_engine_settle():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "judge_cross_engine.py")],
        cwd=REPO, capture_output=True, text=True, timeout=3000,
    )
    assert out.returncode == 0, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr}"
    assert "JUDGE SCENE cross-engine: OK" in out.stdout
