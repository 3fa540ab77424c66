"""Benchmark: env-steps/s per chip on the Joystick task (BASELINE.json metric).

Measures the fully randomized (domain randomization on) Joystick env at
4096 parallel envs -- BASELINE.json config #3 -- on the default backend
(one TPU chip under the driver; CPU with --cpu). Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "env_steps_per_sec_per_chip",
   "vs_baseline": N}

`vs_baseline` is value / 10,000: the reference publishes no numbers
(BASELINE.md), so we anchor to the driver's ">= 10x CPU MJX" target with a
nominal 1,000 env-steps/s CPU-MJX figure for the 64-env config; >= 1.0
means the 10x throughput target is met under that assumption.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

BASELINE_TARGET_STEPS_PER_SEC = 10_000.0


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_envs", type=int, default=4096)
    parser.add_argument("--steps", type=int, default=100, help="control steps to time")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--no_dr", action="store_true")
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from open_duck_playground_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()

    import jax.numpy as jnp

    from open_duck_playground_tpu.envs import randomize
    from open_duck_playground_tpu.envs.joystick import Joystick
    from open_duck_playground_tpu.envs.wrapper import TrainEnv

    env = Joystick(task="flat_terrain")
    train_env = TrainEnv(
        env,
        num_envs=args.num_envs,
        episode_length=1000,
        randomization_fn=None if args.no_dr else randomize.domain_randomize,
        randomization_rng=jax.random.PRNGKey(0),
    )

    reset = jax.jit(train_env.reset)

    step = jax.jit(train_env.step)

    def log(msg):
        print(msg, file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    state = reset(jax.random.PRNGKey(1))
    jax.block_until_ready(state.reward)
    log(f"[bench] reset done in {time.perf_counter() - t0:.1f}s")

    # pre-generated random actions for the warmup calls
    actions = jax.random.uniform(
        jax.random.PRNGKey(2),
        (2, args.num_envs, env.action_size),
        minval=-1.0, maxval=1.0,
    )
    jax.block_until_ready(actions)

    # warmup / compile. Two warmup calls, not one: the first step's output
    # state carries slightly different avals than reset's (weak-type
    # promotion), so the SECOND call compiles a second jit variant — timing
    # must not start until both are compiled (verified via step._cache_size()).
    t0 = time.perf_counter()
    state = step(state, actions[0])
    jax.block_until_ready(state.reward)
    log(f"[bench] step compile+warmup in {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    state = step(state, actions[1])
    jax.block_until_ready(state.reward)
    log(f"[bench] second-variant compile+warmup in {time.perf_counter() - t0:.1f}s")

    # timed section: a scanned rollout, exactly how the PPO trainer consumes
    # the env (lax.scan over steps inside one jitted program — no host
    # dispatch per step). Random actions are generated in-scan from a
    # folded key, like a stochastic policy would.
    def rollout(state, key):
        def body(carry, _):
            st, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(
                ka, (args.num_envs, env.action_size), minval=-1.0, maxval=1.0
            )
            return (train_env.step(st, a), k), None
        (state, key), _ = jax.lax.scan(
            body, (state, key), None, length=args.steps
        )
        return state

    rollout = jax.jit(rollout)
    t0 = time.perf_counter()
    state = rollout(state, jax.random.PRNGKey(3))
    jax.block_until_ready(state.reward)
    log(f"[bench] rollout compile+first in {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    state = rollout(state, jax.random.PRNGKey(4))
    jax.block_until_ready(state.reward)
    dt = time.perf_counter() - t0

    n_chips = jax.device_count() if not args.cpu else 1
    env_steps_per_sec = args.steps * args.num_envs / dt
    per_chip = env_steps_per_sec / n_chips

    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip_joystick_dr_4096envs",
                "value": round(per_chip, 1),
                "unit": "env-steps/s/chip",
                "vs_baseline": round(per_chip / BASELINE_TARGET_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
