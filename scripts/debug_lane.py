#!/usr/bin/env python
"""Stage-by-stage comparison: lane pipeline vs XLA pipeline on CPU."""

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
from open_duck_playground_tpu.ops import solver as nsolver
from open_duck_playground_tpu.ops.lane_physics import LanePhysics

m = compile_mjcf(
    "/root/reference/playground/open_duck_mini_v2/xmls/scene_flat_terrain.xml",
    timestep=0.002,
)
lane = LanePhysics(m)
kf = m.keyframe("home")
B = 16
rng = np.random.RandomState(0)
qpos = np.tile(np.asarray(kf.qpos, np.float32), (B, 1))
qpos[:, :2] += rng.uniform(-0.02, 0.02, (B, 2)).astype(np.float32)
qpos[:, 2] += rng.uniform(-0.005, 0.02, B).astype(np.float32)
qpos[:, 7:] += rng.uniform(-0.1, 0.1, (B, m.nq - 7)).astype(np.float32)
qvel = rng.uniform(-0.2, 0.2, (B, m.nv)).astype(np.float32)
ctrl = (np.asarray(kf.ctrl, np.float32)
        + rng.uniform(-0.2, 0.2, (B, m.nu)).astype(np.float32))
qpos, qvel, ctrl = jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl)


@jax.jit
@jax.vmap
def xla_stages(qpos, qvel, ctrl):
    xpos, xquat, xmat, xanchor, xaxis = smooth.kinematics(m, qpos)
    geom_xpos, geom_xmat = smooth.geom_kinematics(m, xpos, xquat)
    subtree_com, xipos, cinert, cdof = smooth.com_pos(m, xpos, xquat, xmat, xanchor, xaxis)
    M = smooth.crb(m, cinert, cdof)
    contact = fwd.collide(m, geom_xpos, geom_xmat)
    cvel, cdofdot = smooth.com_vel(m, cdof, qvel)
    qfrc_bias = smooth.rne(m, cinert, cdof, cdofdot, cvel, qvel)
    _, qfrc_act = fwd.actuation(m, qpos, qvel, ctrl)
    qfrc_smooth = qfrc_act - qfrc_bias - m.dof_damping * qvel
    qacc_smooth = linalg.solve_psd(M, qfrc_smooth)
    efc = con.make_efc(m, qvel, qpos, contact, cdof, subtree_com)
    qacc, qfrc_c = nsolver.solve(m, M, qacc_smooth, efc)
    return dict(
        M=M, dist=contact.dist, cpos=contact.pos, qacc_smooth=qacc_smooth,
        J=efc.J, D=efc.D, aref=efc.aref, pos=efc.pos, qacc=qacc,
        qfrc_bias=qfrc_bias,
    )


ref = xla_stages(qpos, qvel, ctrl)

lanes_q = [qpos[:, i] for i in range(m.nq)]
lanes_v = [qvel[:, i] for i in range(m.nv)]
lanes_c = [ctrl[:, i] for i in range(m.nu)]

xpos, xquat, xanchor, xaxis = lane.kinematics(lanes_q, None)
subtree_com, xipos, cinert, cdof = lane.com_pos(xpos, xquat, xanchor, xaxis, None)
M = lane.crb(cinert, cdof, None)
contacts = lane.collide(xpos, xquat)
cvel, cdofdot = lane.com_vel(cdof, lanes_v)
qfrc_bias = lane.rne(cinert, cdof, cdofdot, cvel, lanes_v)
act_force, qfrc_act = lane.actuation(lanes_q, lanes_v, lanes_c, None)
qfrc_smooth = [qfrc_act[i] - qfrc_bias[i] - float(lane.c.dof_damping[i]) * lanes_v[i]
               for i in range(m.nv)]
L, dinv = lane.ldl.factor(M)
qacc_smooth = lane.ldl.solve(L, dinv, qfrc_smooth)
rows = lane.make_efc(lanes_v, lanes_q, contacts, cdof, subtree_com, None)
qacc, qfrc_c = lane.solve_constraints(M, qacc_smooth, rows)


def cmp(name, lane_val, ref_val, tol=1e-3):
    a = np.asarray(lane_val)
    b = np.asarray(ref_val)
    if a.shape != b.shape:
        a = a.reshape(b.shape)
    err = np.abs(a - b)
    rel = err / (np.abs(b) + 1e-6)
    bad = (err > tol) & (rel > tol)
    print(f"{name:16s} max_abs={err.max():.3e} n_bad={bad.sum()}/{bad.size}")
    return bad


cmp("qfrc_bias", np.stack([np.asarray(t) for t in qfrc_bias], 1), ref["qfrc_bias"])
cmp("qacc_smooth", np.stack([np.asarray(t) for t in qacc_smooth], 1), ref["qacc_smooth"])

# M comparison on the tree pattern
Mr = np.asarray(ref["M"])
maxe = 0.0
for (i, j), v in M.items():
    maxe = max(maxe, float(np.abs(np.asarray(v) - Mr[:, i, j]).max()))
print(f"M pattern        max_abs={maxe:.3e}")

dist_l = np.stack([np.asarray(d) for (cand, fr, _) in contacts for (d, p, v) in cand], 1)
cmp("contact dist", np.minimum(dist_l, 1e9), np.minimum(ref["dist"], 1e9))
pos_l = np.stack(
    [np.stack([np.asarray(x) for x in p], -1) for (cand, fr, _) in contacts
     for (d, p, v) in cand], 1)
real = np.asarray(ref["dist"]) < 1e9
pe = np.abs(pos_l - np.asarray(ref["cpos"]))[real]
print(f"contact pos      max_abs={pe.max() if pe.size else 0:.3e} (valid only)")

# efc rows
nrows = len(rows)
print("lane rows:", nrows, " xla rows:", ref["J"].shape[1])
D_l = np.stack([np.broadcast_to(np.asarray(r["D"]), (B,)) for r in rows], 1)
cmp("efc D", D_l, ref["D"], tol=1e-2)
aref_l = np.stack([np.broadcast_to(np.asarray(r["aref"]), (B,)) for r in rows], 1)
cmp("efc aref", aref_l, ref["aref"], tol=1e-2)
# J rows
Jl = np.zeros((B, nrows, m.nv), np.float32)
for r_i, r in enumerate(rows):
    for (d, cf) in r["support"]:
        Jl[:, r_i, d] = np.broadcast_to(np.asarray(cf), (B,))
cmp("efc J", Jl, ref["J"], tol=1e-3)
cmp("qacc", np.stack([np.asarray(t) for t in qacc], 1), ref["qacc"], tol=1e-2)

# ---------------------------------------------------------------------------
# deep dive into the Newton iteration: numpy oracle from XLA's own inputs
# ---------------------------------------------------------------------------
print("\n--- newton internals (env with worst qacc error) ---")
qacc_l = np.stack([np.asarray(t) for t in qacc], 1)
err = np.abs(qacc_l - np.asarray(ref["qacc"])).max(1)
e = int(np.argmax(err))
print("env", e, "err", err[e])

Jn = np.asarray(ref["J"][e], np.float64)
Dn = np.asarray(ref["D"][e], np.float64)
arefn = np.asarray(ref["aref"][e], np.float64)
posn = np.asarray(ref["pos"][e], np.float64)
Mn = np.asarray(ref["M"][e], np.float64)
qa0 = np.asarray(ref["qacc_smooth"][e], np.float64)
floss_n = np.zeros_like(Dn)
isfri = np.zeros(len(Dn), bool)
nf = len(lane.fri_dofs)
isfri[:nf] = True
for k, i in enumerate(lane.fri_dofs):
    floss_n[k] = float(lane.c.dof_frictionloss[i])

Jaref = Jn @ qa0 - arefn
exists = posn < 0
quad = ~isfri & exists & (Jaref < 0)
Dx = Dn * Jaref
inside = isfri & (np.abs(Dx) <= floss_n)
f = np.where(quad, -Dx, 0.0)
f = np.where(isfri, -np.clip(Dx, -floss_n, floss_n), f)
mask = quad | inside
grad = -Jn.T @ f
H = Mn + (Jn * (Dn * mask)[:, None]).T @ Jn
dirn = -np.linalg.solve(H, grad)

Jd = Jn @ dirn
smooth_a = dirn @ (Mn @ dirn)

def dphi_np(alpha):
    x = Jaref + alpha * Jd
    Dx = Dn * x
    inside = isfri & (np.abs(Dx) <= floss_n)
    sat = isfri & ~inside
    act = (~isfri & exists & (x < 0)) | inside
    d1 = smooth_a * alpha + np.sum(Dn * x * Jd * act) + np.sum(
        floss_n * np.sign(x) * Jd * sat)
    d2 = smooth_a + np.sum(Dn * Jd * Jd * act)
    return d1, d2

d1_0, d2_0 = dphi_np(0.0)
hi0 = -d1_0 / max(d2_0, 1e-12) if d2_0 > 1e-12 else 1.0
hi0 = max(hi0, 1e-8)
count = 0
for k in range(8):
    d1k, _ = dphi_np(hi0 * 2.0 ** k)
    if d1k < 0:
        count += 1
    else:
        break
hi = hi0 * 2.0 ** count
lo = 0.0
alpha = 0.5 * (lo + hi)
for _ in range(5):
    d1a, d2a = dphi_np(alpha)
    if d1a < 0:
        lo = alpha
    else:
        hi = alpha
    newton = alpha - d1a / max(d2a, 1e-12)
    mid = 0.5 * (lo + hi)
    alpha = newton if (lo < newton < hi and d2a > 1e-12) else mid
if d1_0 >= 0:
    alpha = 0.0
qacc_np = qa0 + alpha * dirn
print("numpy oracle: alpha=", alpha, " d1_0=", d1_0, " d2_0=", d2_0, " hi0=", hi0,
      " count=", count)
print("qacc_np vs xla:", np.abs(qacc_np - np.asarray(ref["qacc"][e])).max())
print("qacc_np vs lane:", np.abs(qacc_np - qacc_l[e]).max())

# is the XLA deviation caused by the ldl backend?
from open_duck_playground_tpu.ops import linalg as _lin
_lin.set_backend("cholesky")


@jax.jit
@jax.vmap
def xla_solver_only(qpos, qvel, ctrl):
    xpos, xquat, xmat, xanchor, xaxis = smooth.kinematics(m, qpos)
    geom_xpos, geom_xmat = smooth.geom_kinematics(m, xpos, xquat)
    subtree_com, xipos, cinert, cdof = smooth.com_pos(m, xpos, xquat, xmat, xanchor, xaxis)
    M = smooth.crb(m, cinert, cdof)
    contact = fwd.collide(m, geom_xpos, geom_xmat)
    cvel, cdofdot = smooth.com_vel(m, cdof, qvel)
    qfrc_bias = smooth.rne(m, cinert, cdof, cdofdot, cvel, qvel)
    _, qfrc_act = fwd.actuation(m, qpos, qvel, ctrl)
    qfrc_smooth = qfrc_act - qfrc_bias - m.dof_damping * qvel
    qacc_smooth = _lin.solve_psd(M, qfrc_smooth)
    efc = con.make_efc(m, qvel, qpos, contact, cdof, subtree_com)
    qacc, _ = nsolver.solve(m, M, qacc_smooth, efc)
    return qacc


qacc_chol = np.asarray(xla_solver_only(qpos, qvel, ctrl))
print("xla-chol vs lane:", np.abs(qacc_chol - qacc_l).max())
print("xla-chol vs xla-ldl:", np.abs(qacc_chol - np.asarray(ref["qacc"])).max())
