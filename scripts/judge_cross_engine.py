"""Judge-scene cross-engine settle check: both engines stand and agree.

Evidence for VERDICT r3 #2: on the generated 64x64 judge hfield
(models/open_duck_mini_v2/judge_terrain.py) real MuJoCo is stable — unlike
on the reference's 256x256 PNG (RESULTS/r4/probe_mj_hfield.log) — and our
engine settles to the same stance, giving rough policies a second-engine
gate scene.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
from open_duck_playground_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

import jax.numpy as jnp
import mujoco
import numpy as np

from open_duck_playground_tpu.deploy.mujoco_infer_base import load_mj_model
from open_duck_playground_tpu.mjcf.compiler import compile_mjcf
from open_duck_playground_tpu.models.open_duck_mini_v2.constants import task_to_xml
from open_duck_playground_tpu.ops import forward as fwd

path = task_to_xml("rough_judge_backlash")
om = compile_mjcf(path, timestep=0.002)
kf = om.keyframe("home")
d = fwd.init(om, jnp.asarray(kf.qpos, jnp.float32),
             jnp.zeros(om.nv, jnp.float32), jnp.asarray(kf.ctrl, jnp.float32))
ctrl = jnp.asarray(kf.ctrl, jnp.float32)
step10 = jax.jit(lambda d: fwd.step_n(om, d, ctrl, 10))
mm = load_mj_model(path)
dd = mujoco.MjData(mm)
kid = mujoco.mj_name2id(mm, mujoco.mjtObj.mjOBJ_KEY, "home")
mujoco.mj_resetDataKeyframe(mm, dd, kid)
dd.ctrl[:] = mm.key_ctrl[kid]
for _ in range(100):  # 2 s
    d = step10(d)
    for _ in range(10):
        mujoco.mj_step(mm, dd)
z_o, z_m = float(d.qpos[2]), float(dd.qpos[2])
v_o = float(jnp.linalg.norm(d.qvel))
v_m = float(np.linalg.norm(dd.qvel))
jerr = float(np.abs(np.asarray(d.qpos[7:], np.float64) - dd.qpos[7:]).max())
print(f"ours: z={z_o:.4f} |qvel|={v_o:.4f}")
print(f"mj:   z={z_m:.4f} |qvel|={v_m:.4f}")
print(f"dz={abs(z_o - z_m):.5f}  joint max err={jerr:.4f}")
assert z_o > 0.1 and z_m > 0.1, "an engine fell on the judge scene"
assert v_o < 0.2 and v_m < 0.2, "an engine did not settle"
assert abs(z_o - z_m) < 5e-3, "settled heights disagree"
print("JUDGE SCENE cross-engine: OK")
