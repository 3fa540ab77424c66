#!/usr/bin/env python
"""Benchmark the fused Pallas physics step vs the XLA pipeline on TPU."""

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

B = int(os.environ.get("BENCH_B", "4096"))
m = compile_mjcf(
    "/root/reference/playground/open_duck_mini_v2/xmls/scene_flat_terrain.xml",
    timestep=0.002,
)
kf = m.keyframe("home")
rng = np.random.RandomState(0)
qpos = np.tile(np.asarray(kf.qpos, np.float32), (B, 1))
qpos[:, 7:] += rng.uniform(-0.02, 0.02, (B, m.nq - 7)).astype(np.float32)
qvel = rng.uniform(-0.01, 0.01, (B, m.nv)).astype(np.float32)
ctrl = np.tile(np.asarray(kf.ctrl, np.float32), (B, 1))
qpos, qvel, ctrl = jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ctrl)

print("building data...", flush=True)
t0 = time.perf_counter()
# batched Data without the expensive vmapped fwd.init compile: the fused
# kernel reads only qpos/qvel/ctrl; derived fields start as zeros.
d0 = fwd.make_data(m)
d = jax.tree_util.tree_map(lambda x: jnp.broadcast_to(x, (B,) + x.shape).copy(), d0)
d = d.replace(qpos=qpos, qvel=qvel, ctrl=ctrl)
jax.block_until_ready(d.qpos)
print(f"data built in {time.perf_counter() - t0:.1f}s", flush=True)

fused = jax.jit(lambda d, c: ps.fused_step_n_batched(m, d, c, 10))
t0 = time.perf_counter()
out = fused(d, ctrl)
jax.block_until_ready(out.qpos)
print(f"fused compile+warmup in {time.perf_counter() - t0:.1f}s", flush=True)

iters = 20
t0 = time.perf_counter()
for _ in range(iters):
    out = fused(out, ctrl)
jax.block_until_ready(out.qpos)
dt = (time.perf_counter() - t0) / iters
print(f"FUSED step10: {dt * 1e3:.2f} ms  -> {B / dt:.0f} env-steps/s", flush=True)

# sanity: compare one step vs XLA (expensive compile; opt-in)
if not int(os.environ.get("BENCH_XLA_REF", "1")):
    sys.exit(0)
ref = jax.jit(jax.vmap(lambda dd, cc: fwd.step_n(m, dd, cc, 10)))
r = ref(d, ctrl)
jax.block_until_ready(r.qpos)
f1 = fused(d, ctrl)
qerr = np.abs(np.asarray(f1.qpos) - np.asarray(r.qpos))
verr = np.abs(np.asarray(f1.qvel) - np.asarray(r.qvel))
print("qpos err q95/max:", np.quantile(qerr, 0.95), qerr.max(), flush=True)
print("qvel err q95/max:", np.quantile(verr, 0.95), verr.max(), flush=True)

t0 = time.perf_counter()
for _ in range(10):
    r = ref(r, ctrl)
jax.block_until_ready(r.qpos)
print(f"XLA   step10: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms", flush=True)
