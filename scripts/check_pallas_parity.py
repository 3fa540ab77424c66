#!/usr/bin/env python
"""TPU fused-kernel vs eager-CPU lane-pipeline parity on identical inputs.

The lane pipeline is layout-agnostic, so running it eagerly on CPU with
(B,) tiles gives a compile-free oracle for the TPU kernel (same math,
different layout/backend). Catches wrapper bugs: lane-layout reshapes, DR
field plumbing, output scatter.

--dr additionally exercises the domain-randomization kernel variant: the 8
randomized model fields (envs/randomize.py) ride in as per-env tiles and
the per-env values must land on the right envs/rows through the lane
layout (the strongest check of the DR plumbing: every env has different
physics, so any row/env transposition shows up as gross error).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from open_duck_playground_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

from open_duck_playground_tpu.mjcf import compile_mjcf
from open_duck_playground_tpu.ops import forward as fwd
from open_duck_playground_tpu.ops import pallas_step as ps
from open_duck_playground_tpu.ops.lane_physics import DR_FIELDS, LanePhysics

parser = argparse.ArgumentParser()
parser.add_argument("--dr", action="store_true", help="exercise the DR kernel")
parser.add_argument("--rough", action="store_true",
                    help="rough-terrain scene (heightfield gather path)")
args = parser.parse_args()

B = ps.BLOCK  # one block
N = 10
scene = ("scene_rough_terrain_backlash.xml" if args.rough
         else "scene_flat_terrain.xml")
m = compile_mjcf(
    f"/root/reference/playground/open_duck_mini_v2/xmls/{scene}",
    timestep=0.002,
)
kf = m.keyframe("home")
rng = np.random.RandomState(0)
qpos = np.tile(np.asarray(kf.qpos, np.float32), (B, 1))
if args.rough:
    qpos[:, 2] += 0.11  # hfield base lifts the ground
qpos[:, 7:] += rng.uniform(-0.02, 0.02, (B, m.nq - 7)).astype(np.float32)
qvel = rng.uniform(-0.01, 0.01, (B, m.nv)).astype(np.float32)
ctrl = (np.asarray(kf.ctrl, np.float32)
        + rng.uniform(-0.05, 0.05, (B, m.nu)).astype(np.float32))

dr_flat = None
if args.dr:
    from open_duck_playground_tpu.envs import randomize

    m_batched, _ = randomize.domain_randomize(m, jax.random.split(jax.random.PRNGKey(7), B))
    dr_flat = {
        k: jnp.asarray(np.asarray(v), jnp.float32)
        for k, v in ps.flatten_dr_fields(m_batched).items()
    }
    assert set(dr_flat) == set(DR_FIELDS)

# --- TPU fused ---
d0 = fwd.make_data(m)
d = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), d0)
d = d.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
              ctrl=jnp.asarray(ctrl))
fused = jax.jit(lambda d, c, dr: ps.fused_step_n_batched(m, d, c, N, dr))
out = fused(d, jnp.asarray(ctrl), dr_flat)
jax.block_until_ready(out.qpos)
print("fused done", flush=True)

# --- eager CPU lane oracle ---
cpu = jax.devices("cpu")[0]
lane = LanePhysics(m)
t0 = time.perf_counter()
with jax.default_device(cpu):
    lq = [jnp.asarray(qpos[:, i]) for i in range(m.nq)]
    lv = [jnp.asarray(qvel[:, i]) for i in range(m.nv)]
    lc = [jnp.asarray(ctrl[:, i]) for i in range(m.nu)]
    dr_tiles = None
    if dr_flat is not None:
        # same nested [field][i][j] tile structure _nest_dr builds in-kernel
        dr_np = {k: np.asarray(v) for k, v in dr_flat.items()}
        dr_tiles = {}
        for f in DR_FIELDS:
            dims = ps._DR_SHAPES[f]
            flat = dr_np[f]
            if len(dims) == 1:
                dr_tiles[f] = [jnp.asarray(flat[:, i])
                               for i in range(ps._field_rows(m, f))]
            else:
                n0 = getattr(m, dims[0])
                n1 = dims[1]
                dr_tiles[f] = [
                    [jnp.asarray(flat[:, i * n1 + j]) for j in range(n1)]
                    for i in range(n0)
                ]
    qp, qv, _w, derived = lane.step_n(lq, lv, lc, N, dr=dr_tiles)
print(f"eager lane done in {time.perf_counter() - t0:.1f}s", flush=True)


def batch(lanes):
    return np.stack([np.asarray(t) for t in lanes], 1)


# Tolerance note (see tests/test_lane.py docstring): the iterations=1
# Newton solve is discontinuous at friction/contact breakpoints, and the
# settled duck rings in a limit cycle around them, so over 10 substeps a
# large fraction of envs legitimately flip branches between any two f32
# implementations (the XLA path self-diverges identically under a 1e-6
# perturbation). Medians must be tight; tails get loose physical bounds.
# Positions (qpos/site/contact) integrate the ringing away and stay tight.
checks = [
    ("qpos", np.asarray(out.qpos), batch(qp), 1e-3, 1e-2),
    ("qvel", np.asarray(out.qvel), batch(qv), 5e-3, 1.0),
    ("sensordata", np.asarray(out.sensordata), batch(derived["sensordata"]),
     1e-2, 50.0),
    ("actuator_force", np.asarray(out.actuator_force),
     batch(derived["actuator_force"]), 2e-3, 0.5),
    ("contact_dist", np.minimum(np.asarray(out.contact.dist), 1e9),
     np.minimum(batch(derived["contact_dist"]), 1e9), 1e-3, 2e-2),
    ("site_xpos", np.asarray(out.site_xpos).reshape(B, -1),
     batch(derived["site_xpos"]), 1e-3, 5e-3),
]
ok = True
for name, a, b, q50tol, maxtol in checks:
    err = np.abs(a - b)
    q50, q95, mx = (np.quantile(err, 0.5), np.quantile(err, 0.95), err.max())
    status = "OK" if (q50 < q50tol and mx < maxtol) else "FAIL"
    ok &= status == "OK"
    print(f"{name:16s} q50={q50:.2e} q95={q95:.2e} max={mx:.2e}  {status}",
          flush=True)
print("PARITY", "OK" if ok else "FAIL")
sys.exit(0 if ok else 1)
