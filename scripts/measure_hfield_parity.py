#!/usr/bin/env python
"""Measure our-engine vs mj_step divergence on the rough (hfield) scene.

Produces the calibration numbers for tests/test_mujoco_parity.py's hfield
trace tests (VERDICT r2 #3a): settled rollout base-height/posture error,
perturbed-trace qpos/qvel quantiles, and the MuJoCo-vs-MuJoCo chaos
baseline (1e-6-perturbed start) that bounds what parity can mean at
iterations=1.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import mujoco
import numpy as np

from open_duck_playground_tpu.mjcf import compile_mjcf
from open_duck_playground_tpu.ops import forward as fwd
from open_duck_playground_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

PATH = "/root/reference/playground/open_duck_mini_v2/xmls/scene_rough_terrain_backlash.xml"


def load_mj(path):
    root = os.path.dirname(path)
    assets = {}
    for dirpath, _, files in os.walk(os.path.join(root, "assets")):
        for f in files:
            with open(os.path.join(dirpath, f), "rb") as fh:
                assets[f] = fh.read()
    for f in os.listdir(root):
        if f.endswith(".xml"):
            with open(os.path.join(root, f), "rb") as fh:
                assets[f] = fh.read()
    with open(path) as fh:
        return mujoco.MjModel.from_xml_string(fh.read(), assets)


om = compile_mjcf(PATH, timestep=0.002)
mm = load_mj(PATH)
mm.opt.timestep = 0.002
kf = om.keyframe("home")

# --- settled rollout -------------------------------------------------------
dd = mujoco.MjData(mm)
kid = mujoco.mj_name2id(mm, mujoco.mjtObj.mjOBJ_KEY, "home")
mujoco.mj_resetDataKeyframe(mm, dd, kid)
dd.ctrl[:] = mm.key_ctrl[kid]
d = fwd.init(om, jnp.asarray(kf.qpos, jnp.float32), jnp.zeros(om.nv, jnp.float32),
             jnp.asarray(kf.ctrl, jnp.float32))
ctrl = jnp.asarray(kf.ctrl, jnp.float32)
step10 = jax.jit(lambda d: fwd.step_n(om, d, ctrl, 10))
zs = []
for t in range(100):  # 2 s
    d = step10(d)
    for _ in range(10):
        mujoco.mj_step(mm, dd)
    zs.append((float(d.qpos[2]), float(dd.qpos[2])))
z_ours, z_mj = zs[-1]
print(f"settled: z_ours={z_ours:.4f} z_mj={z_mj:.4f} dz={abs(z_ours-z_mj):.4g}")
print(f"settled qvel norms: ours={float(jnp.linalg.norm(d.qvel)):.3g} "
      f"mj={np.linalg.norm(dd.qvel):.3g}")
post = np.abs(np.asarray(d.qpos[7:], np.float64) - dd.qpos[7:])
print(f"settled posture err: max={post.max():.4g} median={np.median(post):.4g}")
print(f"xy drift: ours={np.asarray(d.qpos[:2])} mj={dd.qpos[:2]}")

# --- perturbed traces + chaos baseline --------------------------------------
rng = np.random.default_rng(0)
K, T = 6, 30
stepc = jax.jit(lambda d, c: fwd.step_n(om, d, c, 10))
errs_q, errs_v, chaos_q = [], [], []
dd = mujoco.MjData(mm)
dd2 = mujoco.MjData(mm)
for k in range(K):
    qpos = np.asarray(kf.qpos, np.float64).copy()
    qpos[0:2] += rng.uniform(-0.05, 0.05, 2)
    qpos[7:] += rng.uniform(-0.1, 0.1, om.nq - 7)
    qvel = rng.uniform(-0.1, 0.1, om.nv)
    c = np.asarray(kf.ctrl) + rng.uniform(-0.1, 0.1, om.nu)
    for ddx, eps in ((dd, 0.0), (dd2, 1e-6)):
        mujoco.mj_resetData(mm, ddx)
        ddx.qpos[:] = qpos
        ddx.qpos[2] += eps
        ddx.qvel[:] = qvel
        ddx.ctrl[:] = c
    d = fwd.make_data(om).replace(qpos=jnp.asarray(qpos, jnp.float32),
                                  qvel=jnp.asarray(qvel, jnp.float32))
    c32 = jnp.asarray(c, jnp.float32)
    for t in range(T):
        d = stepc(d, c32)
        for _ in range(10):
            mujoco.mj_step(mm, dd)
            mujoco.mj_step(mm, dd2)
        errs_q.append(np.abs(np.asarray(d.qpos, np.float64) - dd.qpos).max())
        errs_v.append(np.abs(np.asarray(d.qvel, np.float64) - dd.qvel).max())
        chaos_q.append(np.abs(dd2.qpos - dd.qpos).max())
errs_q, errs_v, chaos_q = map(np.asarray, (errs_q, errs_v, chaos_q))
print(f"perturbed qpos: median={np.median(errs_q):.4g} "
      f"p90={np.percentile(errs_q, 90):.4g} max={errs_q.max():.4g}")
print(f"perturbed qvel: median={np.median(errs_v):.4g} "
      f"p90={np.percentile(errs_v, 90):.4g} max={errs_v.max():.4g}")
print(f"chaos baseline qpos: median={np.median(chaos_q):.4g} "
      f"p90={np.percentile(chaos_q, 90):.4g}")
