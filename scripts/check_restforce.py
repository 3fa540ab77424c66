#!/usr/bin/env python
"""Time-averaged rest normal force vs weight (solver limit-cycle check)."""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from open_duck_playground_tpu.mjcf import compile_mjcf
from open_duck_playground_tpu.ops import forward as fwd

m = compile_mjcf(
    "/root/reference/playground/open_duck_mini_v2/xmls/scene_flat_terrain.xml",
    timestep=0.002,
)
kf = m.keyframe("home")
d = fwd.init(m, jnp.asarray(kf.qpos, jnp.float32), jnp.zeros(m.nv),
             jnp.asarray(kf.ctrl, jnp.float32))
ctrl = jnp.asarray(kf.ctrl, jnp.float32)
step1 = jax.jit(lambda dd: fwd.step_n(m, dd, ctrl, 1))
for _ in range(1000):
    d = step1(d)
fzs, qaccs = [], []
for _ in range(200):
    d = step1(d)
    fzs.append(float(d.qfrc_constraint[2]))
    qaccs.append(float(d.qacc[2]))
w = float(m.body_subtreemass[1]) * 9.81
print("weight =", w)
print("fz mean =", np.mean(fzs), "min/max =", np.min(fzs), np.max(fzs))
print("qacc_z mean =", np.mean(qaccs), "min/max =", np.min(qaccs), np.max(qaccs))
