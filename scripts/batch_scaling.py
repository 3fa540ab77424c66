#!/usr/bin/env python
"""Physics step throughput vs env batch size on the current backend."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from open_duck_playground_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()

from open_duck_playground_tpu.envs.joystick import Joystick
from open_duck_playground_tpu.ops import forward as fwd

env = Joystick(task="flat_terrain")
m = env.model
kf = m.keyframe("home")


def bench(B, iters=10):
    qpos = jnp.tile(jnp.asarray(kf.qpos, jnp.float32), (B, 1))
    qvel = 0.01 * jax.random.normal(jax.random.PRNGKey(0), (B, m.nv))
    ctrl = jnp.tile(jnp.asarray(kf.ctrl, jnp.float32), (B, 1))
    init_b = jax.jit(jax.vmap(lambda q, v, c: fwd.init(m, q, v, c)))
    d = init_b(qpos, qvel, ctrl)
    step10 = jax.jit(jax.vmap(lambda d, c: fwd.step_n(m, d, c, 10)))
    d2 = step10(d, ctrl)
    jax.block_until_ready(d2.qpos)
    t0 = time.perf_counter()
    for _ in range(iters):
        d2 = step10(d2, ctrl)
    jax.block_until_ready(d2.qpos)
    dt = (time.perf_counter() - t0) / iters
    print(f"B={B:6d}  step10={dt * 1e3:8.1f} ms  env-steps/s={B / dt:10.0f}",
          flush=True)


if __name__ == "__main__":
    for B in (4096, 8192, 16384):
        bench(B)
