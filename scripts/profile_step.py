#!/usr/bin/env python
"""Stage-by-stage TPU timing of the hot path: physics, env.step, TrainEnv."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from open_duck_playground_tpu.utils.cache import setup_compilation_cache

setup_compilation_cache()


def timeit(name, fn, *args, iters=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt * 1e3:10.2f} ms/call")
    return out, dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_envs", type=int, default=4096)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from open_duck_playground_tpu.envs import randomize
    from open_duck_playground_tpu.envs.joystick import Joystick
    from open_duck_playground_tpu.envs.wrapper import TrainEnv
    from open_duck_playground_tpu.ops import forward as fwd

    B = args.num_envs
    env = Joystick(task="flat_terrain")
    m = env.model
    kf = m.keyframe("home")

    qpos = jnp.tile(jnp.asarray(kf.qpos, jnp.float32), (B, 1))
    qvel = jnp.zeros((B, m.nv), jnp.float32)
    ctrl = jnp.tile(jnp.asarray(kf.ctrl, jnp.float32), (B, 1))

    init_b = jax.jit(jax.vmap(lambda q, v, c: fwd.init(m, q, v, c)))
    d = init_b(qpos, qvel, ctrl)
    jax.block_until_ready(d.qpos)

    # bare physics: 10 substeps
    step10 = jax.jit(jax.vmap(lambda d, c: fwd.step_n(m, d, c, 10)))
    timeit("physics step_n(10) x B", lambda: step10(d, ctrl))

    # one substep
    step1 = jax.jit(jax.vmap(lambda d, c: fwd.step_n(m, d, c, 1)))
    timeit("physics step_n(1) x B", lambda: step1(d, ctrl))

    # forward only (no integrate)
    fwd1 = jax.jit(jax.vmap(lambda d: fwd.forward(m, d)))
    timeit("forward only x B", lambda: fwd1(d))

    # env.step full (no DR)
    reset_b = jax.jit(jax.vmap(env.reset))
    st = reset_b(jax.random.split(jax.random.PRNGKey(0), B))
    act = jnp.zeros((B, env.action_size), jnp.float32)
    estep = jax.jit(jax.vmap(env.step))
    timeit("env.step x B (vmap, no DR)", lambda: estep(st, act))

    # TrainEnv with DR
    tenv = TrainEnv(env, num_envs=B, episode_length=1000,
                    randomization_fn=randomize.domain_randomize,
                    randomization_rng=jax.random.PRNGKey(0))
    ts = jax.jit(tenv.reset)(jax.random.PRNGKey(1))
    tstep = jax.jit(tenv.step)
    timeit("TrainEnv.step x B (DR)", lambda: tstep(ts, act))


if __name__ == "__main__":
    main()
