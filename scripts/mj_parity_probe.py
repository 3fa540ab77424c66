"""Exploratory probe: our compiler vs mujoco.MjModel field-by-field.

Usage: JAX_PLATFORMS=cpu python scripts/mj_parity_probe.py [scene]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import mujoco

from open_duck_playground_tpu.mjcf import compile_mjcf

XMLS = "/root/reference/playground/open_duck_mini_v2/xmls"
scene = sys.argv[1] if len(sys.argv) > 1 else f"{XMLS}/scene_flat_terrain.xml"

mm = mujoco.MjModel.from_xml_path(scene)
om = compile_mjcf(scene)

def cmp(name, ours, theirs, atol=1e-6, rtol=1e-5):
    ours = np.asarray(ours, np.float64)
    theirs = np.asarray(theirs, np.float64)
    if ours.shape != theirs.shape:
        print(f"  MISMATCH {name}: shape {ours.shape} vs {theirs.shape}")
        return
    if ours.size == 0:
        print(f"  ok {name} (empty)")
        return
    d = np.abs(ours - theirs)
    tol = atol + rtol * np.abs(theirs)
    bad = d > tol
    if bad.any():
        idx = np.argwhere(bad)[:5]
        print(f"  MISMATCH {name}: {bad.sum()}/{bad.size} bad, maxdiff={d.max():.3e}")
        for i in idx:
            i = tuple(i)
            print(f"    [{i}] ours={ours[i]:.6g} theirs={theirs[i]:.6g}")
    else:
        print(f"  ok {name} (maxdiff={d.max():.3e})")

print(f"scene: {scene}")
print(f"sizes: nq {om.nq}/{mm.nq} nv {om.nv}/{mm.nv} nu {om.nu}/{mm.nu} "
      f"nbody {om.nbody}/{mm.nbody} njnt {om.njnt}/{mm.njnt} ngeom {om.ngeom}/{mm.ngeom} "
      f"nsite {om.nsite}/{mm.nsite} nsensordata {om.nsensordata}/{mm.nsensordata}")
print(f"opt: timestep {om.opt.timestep}/{mm.opt.timestep} iters {om.opt.iterations}/{mm.opt.iterations} "
      f"ls {om.opt.ls_iterations}/{mm.opt.ls_iterations} gravity {np.asarray(om.opt.gravity)}/{mm.opt.gravity}")

cmp("jnt_qposadr", om.jnt_qposadr.np, mm.jnt_qposadr)
cmp("jnt_dofadr", om.jnt_dofadr.np, mm.jnt_dofadr)
cmp("jnt_type", om.jnt_type.np, mm.jnt_type)
cmp("jnt_bodyid", om.jnt_bodyid.np, mm.jnt_bodyid)
cmp("jnt_range", om.jnt_range, mm.jnt_range)
cmp("jnt_pos", om.jnt_pos, mm.jnt_pos)
cmp("jnt_axis", om.jnt_axis, mm.jnt_axis)
cmp("qpos0", om.qpos0, mm.qpos0)
cmp("body_parentid", om.body_parentid.np, mm.body_parentid)
cmp("body_rootid", om.body_rootid.np, mm.body_rootid)
cmp("body_pos", om.body_pos, mm.body_pos)
cmp("body_quat", om.body_quat, mm.body_quat, atol=1e-5)
cmp("body_ipos", om.body_ipos, mm.body_ipos)
# quats are sign-ambiguous: compare |q . q'|
qd = np.abs(np.sum(np.asarray(om.body_iquat, np.float64) * mm.body_iquat, axis=1))
print(f"  body_iquat |dot| min = {qd.min():.8f}")
cmp("body_mass", om.body_mass, mm.body_mass)
cmp("body_inertia", om.body_inertia, mm.body_inertia, rtol=1e-4)
cmp("body_subtreemass", om.body_subtreemass, mm.body_subtreemass, rtol=1e-5)
cmp("body_invweight0", om.body_invweight0, mm.body_invweight0, rtol=1e-3)
cmp("dof_invweight0", om.dof_invweight0, mm.dof_invweight0, rtol=1e-3)
cmp("dof_bodyid", om.dof_bodyid.np, mm.dof_bodyid)
cmp("dof_parentid", om.dof_parentid.np, mm.dof_parentid)
cmp("dof_armature", om.dof_armature, mm.dof_armature)
cmp("dof_damping", om.dof_damping, mm.dof_damping)
cmp("dof_frictionloss", om.dof_frictionloss, mm.dof_frictionloss)
cmp("actuator_trnid", om.actuator_trnid.np, mm.actuator_trnid[:, 0])
cmp("actuator_gainprm", om.actuator_gainprm, mm.actuator_gainprm[:, :3])
cmp("actuator_biasprm", om.actuator_biasprm, mm.actuator_biasprm[:, :3])
cmp("actuator_ctrlrange", om.actuator_ctrlrange, mm.actuator_ctrlrange)
cmp("actuator_forcerange", om.actuator_forcerange, mm.actuator_forcerange)
cmp("geom_pos", om.geom_pos, mm.geom_pos)
cmp("geom_friction", om.geom_friction, mm.geom_friction)
cmp("geom_type", om.geom_type.np, mm.geom_type)
cmp("geom_bodyid", om.geom_bodyid.np, mm.geom_bodyid)
cmp("geom_condim", om.geom_condim.np, mm.geom_condim)
cmp("geom_contype", om.geom_contype.np, mm.geom_contype)
cmp("geom_conaffinity", om.geom_conaffinity.np, mm.geom_conaffinity)
cmp("geom_solref", om.geom_solref, mm.geom_solref)
cmp("geom_solimp", om.geom_solimp, mm.geom_solimp)
cmp("geom_margin", om.geom_margin, mm.geom_margin)
cmp("site_pos", om.site_pos, mm.site_pos)
cmp("site_bodyid", om.site_bodyid.np, mm.site_bodyid)

# keyframes
kid = mujoco.mj_name2id(mm, mujoco.mjtObj.mjOBJ_KEY, "home")
kf = om.keyframes["home"]
cmp("key[home].qpos", kf.qpos, mm.key_qpos[kid])
cmp("key[home].ctrl", kf.ctrl, mm.key_ctrl[kid])

# name maps
import mujoco as mj
for j, name in enumerate(om.names.list("joint")):
    mid = mj.mj_name2id(mm, mj.mjtObj.mjOBJ_JOINT, name)
    if mid != j:
        print(f"  NAME MISMATCH joint {name}: ours {j} theirs {mid}")
for a, name in enumerate(om.names.list("actuator")):
    mid = mj.mj_name2id(mm, mj.mjtObj.mjOBJ_ACTUATOR, name)
    if mid != a:
        print(f"  NAME MISMATCH actuator {name}: ours {a} theirs {mid}")
print("done")
