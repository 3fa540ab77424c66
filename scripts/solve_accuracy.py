#!/usr/bin/env python
"""Accuracy of f32 solve backends on the real duck Newton system vs f64."""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from open_duck_playground_tpu.mjcf import compile_mjcf
from open_duck_playground_tpu.ops import constraint as con
from open_duck_playground_tpu.ops import forward as fwd
from open_duck_playground_tpu.ops import linalg, smooth

m = compile_mjcf(
    "/root/reference/playground/open_duck_mini_v2/xmls/scene_flat_terrain.xml",
    timestep=0.002,
)
kf = m.keyframe("home")
d = fwd.init(m, jnp.asarray(kf.qpos, jnp.float32), jnp.zeros(m.nv),
             jnp.asarray(kf.ctrl, jnp.float32))
ctrl = jnp.asarray(kf.ctrl, jnp.float32)
step10 = jax.jit(lambda dd: fwd.step_n(m, dd, ctrl, 10))
for _ in range(100):
    d = step10(d)


@jax.jit
def stage(d):
    qpos, qvel = d.qpos, d.qvel
    xpos, xquat, xmat, xanchor, xaxis = smooth.kinematics(m, qpos)
    geom_xpos, geom_xmat = smooth.geom_kinematics(m, xpos, xquat)
    subtree_com, xipos, cinert, cdof = smooth.com_pos(m, xpos, xquat, xmat, xanchor, xaxis)
    M = smooth.crb(m, cinert, cdof)
    contact = fwd.collide(m, geom_xpos, geom_xmat)
    cvel, cdofdot = smooth.com_vel(m, cdof, qvel)
    qfrc_bias = smooth.rne(m, cinert, cdof, cdofdot, cvel, qvel)
    _, qfrc_act = fwd.actuation(m, qpos, qvel, d.ctrl)
    qfrc_smooth = -m.dof_damping * qvel - qfrc_bias + qfrc_act
    qacc_smooth = linalg.solve_psd(M, qfrc_smooth)
    efc = con.make_efc(m, qvel, qpos, contact, cdof, subtree_com)
    return M, qacc_smooth, efc


M, qacc_smooth, efc = stage(d)

Mn = np.asarray(M, np.float64)
qa = np.asarray(qacc_smooth, np.float64)
J = np.asarray(efc.J, np.float64)
D = np.asarray(efc.D, np.float64)
aref = np.asarray(efc.aref, np.float64)
pos = np.asarray(efc.pos, np.float64)
floss = np.asarray(efc.floss, np.float64)
isfri = np.asarray(efc.is_friction)
isq = np.asarray(efc.is_quad)
Jaref = J @ qa - aref
exists = pos < 0
quad = isq & exists & (Jaref < 0)
Dx = D * Jaref
inside = isfri & (np.abs(Dx) <= floss)
f = np.where(quad, -Dx, 0.0)
f = np.where(isfri, -np.clip(Dx, -floss, floss), f)
mask = quad | inside
grad = -J.T @ f
H = Mn + (J * (D * mask)[:, None]).T @ J
print("cond(H) =", np.linalg.cond(H), " cond(M) =", np.linalg.cond(Mn))
x_exact = np.linalg.solve(H, grad)

Hj = jnp.asarray(H, jnp.float32)
gj = jnp.asarray(grad, jnp.float32)
linalg.set_backend("cholesky")
x_c = np.asarray(jax.jit(linalg.solve_psd)(Hj, gj), np.float64)
linalg.set_backend("ldl")
x_l = np.asarray(jax.jit(linalg._ldl_solve)(Hj, gj), np.float64)
for name, x in (("chol", x_c), ("ldl", x_l)):
    rel = np.linalg.norm(x - x_exact) / max(np.linalg.norm(x_exact), 1e-30)
    res = np.linalg.norm(H @ x - grad) / max(np.linalg.norm(grad), 1e-30)
    print(f"{name}: rel_err={rel:.3e} residual={res:.3e}")
