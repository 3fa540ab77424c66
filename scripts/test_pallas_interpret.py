#!/usr/bin/env python
"""Interpret-mode check of the fused pallas kernel vs the XLA path (CPU)."""

import os
import sys

os.environ["DUCK_PALLAS_INTERPRET"] = "1"
os.environ["DUCK_PALLAS_SUB"] = "2"
os.environ["DUCK_PALLAS_LANE"] = "8"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from open_duck_playground_tpu.mjcf import compile_mjcf
from open_duck_playground_tpu.ops import forward as fwd
from open_duck_playground_tpu.ops import pallas_step as ps

m = compile_mjcf(
    "/root/reference/playground/open_duck_mini_v2/xmls/scene_flat_terrain.xml",
    timestep=0.002,
)
kf = m.keyframe("home")
B = ps.BLOCK
rng = np.random.RandomState(0)
qpos = np.tile(np.asarray(kf.qpos, np.float32), (B, 1))
qpos[:, 7:] += rng.uniform(-0.02, 0.02, (B, m.nq - 7)).astype(np.float32)
qvel = rng.uniform(-0.01, 0.01, (B, m.nv)).astype(np.float32)
ctrl = (np.asarray(kf.ctrl, np.float32)
        + rng.uniform(-0.05, 0.05, (B, m.nu)).astype(np.float32))
qpos, qvel, ctrl = jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl)

init_b = jax.jit(jax.vmap(lambda q, v, c: fwd.init(m, q, v, c)))
d = init_b(qpos, qvel, ctrl)

N = 2
ref = jax.jit(jax.vmap(lambda dd, cc: fwd.step_n(m, dd, cc, N)))(d, ctrl)
out = ps.fused_step_n_batched(m, d, ctrl, N)

for name in ("qpos", "qvel"):
    a = np.asarray(getattr(out, name))
    b = np.asarray(getattr(ref, name))
    err = np.abs(a - b).max()
    print(f"{name}: max_abs={err:.3e}")
    assert err < 2e-3, name
sd = np.abs(np.asarray(out.sensordata) - np.asarray(ref.sensordata)).max()
print("sensordata:", sd)
assert sd < 2e-2
af = np.abs(np.asarray(out.actuator_force) - np.asarray(ref.actuator_force)).max()
print("actuator_force:", af)
cd_a = np.asarray(out.contact.dist)
cd_b = np.asarray(ref.contact.dist)
same_valid = ((cd_a < 1e9) == (cd_b < 1e9)).mean()
print("contact valid agreement:", same_valid)
sx = np.abs(np.asarray(out.site_xpos) - np.asarray(ref.site_xpos)).max()
print("site_xpos:", sx)
print("PALLAS INTERPRET OK")
