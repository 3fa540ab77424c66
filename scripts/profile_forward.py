#!/usr/bin/env python
"""Per-stage timing of forward dynamics at batch 4096 on the current backend."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from open_duck_playground_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

from open_duck_playground_tpu.envs.joystick import Joystick
from open_duck_playground_tpu.ops import collision as coll
from open_duck_playground_tpu.ops import constraint as con
from open_duck_playground_tpu.ops import forward as fwd
from open_duck_playground_tpu.ops import linalg
from open_duck_playground_tpu.ops import smooth
from open_duck_playground_tpu.ops import solver as nsolver

B = 4096
env = Joystick(task="flat_terrain")
m = env.model
kf = m.keyframe("home")

qpos = jnp.tile(jnp.asarray(kf.qpos, jnp.float32), (B, 1))
qvel = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (B, m.nv))
ctrl = jnp.tile(jnp.asarray(kf.ctrl, jnp.float32), (B, 1))


def timeit(name, fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt * 1e3:8.2f} ms")
    return out


# stage inputs (computed once)
kin = jax.jit(jax.vmap(lambda q: smooth.kinematics(m, q)))
xpos, xquat, xmat, xanchor, xaxis = timeit("kinematics", kin, qpos)

geo = jax.jit(jax.vmap(lambda xp, xq: smooth.geom_kinematics(m, xp, xq)))
gpos, gmat = timeit("geom_kinematics", geo, xpos, xquat)

site = jax.jit(jax.vmap(lambda xp, xq: smooth.site_kinematics(m, xp, xq)))
timeit("site_kinematics", site, xpos, xquat)

comp = jax.jit(jax.vmap(lambda a, b, c, d, e: smooth.com_pos(m, a, b, c, d, e)))
subtree_com, xipos, cinert, cdof = timeit("com_pos", comp, xpos, xquat, xmat, xanchor, xaxis)

crbf = jax.jit(jax.vmap(lambda ci, cd: smooth.crb(m, ci, cd)))
M = timeit("crb", crbf, cinert, cdof)

colf = jax.jit(jax.vmap(lambda gp, gm: fwd.collide(m, gp, gm)))
contact = timeit("collide", colf, gpos, gmat)

cvf = jax.jit(jax.vmap(lambda cd, qv: smooth.com_vel(m, cd, qv)))
cvel, cdofdot = timeit("com_vel", cvf, cdof, qvel)

rnef = jax.jit(jax.vmap(lambda a, b, c, d, e: smooth.rne(m, a, b, c, d, e)))
qfrc_bias = timeit("rne", rnef, cinert, cdof, cdofdot, cvel, qvel)

actf = jax.jit(jax.vmap(lambda q, v, c: fwd.actuation(m, q, v, c)))
_, qfrc_act = timeit("actuation", actf, qpos, qvel, ctrl)

qfrc_smooth = qfrc_act - qfrc_bias - m.dof_damping * qvel
solvef = jax.jit(jax.vmap(linalg.solve_psd))
qacc_smooth = timeit("solve_psd (M)", solvef, M, qfrc_smooth)

efcf = jax.jit(jax.vmap(lambda qv, qp, ct, cd, sc: con.make_efc(m, qv, qp, ct, cd, sc)))
efc = timeit("make_efc", efcf, qvel, qpos, contact, cdof, subtree_com)
print("nefc =", efc.J.shape[-2])

solf = jax.jit(jax.vmap(lambda M, qa, e: nsolver.solve(m, M, qa, e)))
timeit("newton solve", solf, M, qacc_smooth, efc)

senf = jax.jit(jax.vmap(lambda d: fwd.forward(m, d)))
