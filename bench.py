"""Benchmark: env-steps/s per chip on the Joystick task (BASELINE.json metric).

Measures the fully randomized (domain randomization on) Joystick env at
4096 parallel envs -- BASELINE.json config #3 -- on the default backend
(one TPU chip under the driver; CPU with --cpu). Prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "env_steps_per_sec_per_chip",
   "vs_baseline": N}

`vs_baseline` anchors to a MEASURED CPU baseline of this same config:
CPU_BASELINE_STEPS_PER_SEC below is this engine's own throughput on the
image's CPU (the reference's CPU-MJX is not installable here, and our
engine replaces MJX 1:1, so own-engine-CPU is the honest denominator).
The BASELINE.json target is >= 10x CPU, i.e. vs_baseline >= 10 passes.

Robustness: the TPU tunnel admits one process and can be briefly held by
a dying predecessor, so backend init retries with backoff; any failure
still emits a parseable JSON line with an "error" field (exit 0) so the
driver's BENCH_r*.json is never a bare traceback.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import traceback

# Measured 2026-08-17 on this image's CPU (bench.py --cpu --num_envs 4096
# --steps 20, DR on, same scanned-rollout methodology): see RESULTS.md.
CPU_BASELINE_STEPS_PER_SEC = 11_000.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _init_backend(force_cpu: bool, attempts: int = 5, hang_timeout: float = 600.0):
    """Initialize a JAX backend; retry the TPU tunnel with backoff.

    The axon tunnel can HANG (not raise) when the remote chip claim is
    wedged by a dead predecessor — observed round 1/2. jax.devices() is
    uninterruptible from Python, so a watchdog emits the parseable error
    JSON and exits the process if init exceeds `hang_timeout`.
    """
    import os
    import threading

    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
        return jax.devices()

    def _watchdog():
        log(f"[bench] backend init exceeded {hang_timeout:.0f}s — tunnel wedged")
        print(json.dumps({
            "metric": "env_steps_per_sec_per_chip_joystick_dr_4096envs",
            "value": 0,
            "unit": "env-steps/s/chip",
            "vs_baseline": 0,
            "error": f"TunnelHang: backend init exceeded {hang_timeout:.0f}s",
        }), flush=True)
        os._exit(0)

    guard = threading.Timer(hang_timeout, _watchdog)
    guard.daemon = True
    guard.start()
    try:
        delay = 10.0
        for i in range(attempts):
            try:
                devs = jax.devices()
                log(f"[bench] backend {jax.default_backend()} with {len(devs)} device(s)")
                return devs
            except Exception as e:  # tunnel busy / init failure
                log(f"[bench] backend init attempt {i + 1}/{attempts} failed: {e}")
                if i == attempts - 1:
                    raise
                time.sleep(delay)
                delay = min(delay * 1.7, 60.0)
    finally:
        guard.cancel()


def run_bench(args) -> dict:
    import jax

    _init_backend(args.cpu)

    from open_duck_playground_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()

    from open_duck_playground_tpu.envs import randomize
    from open_duck_playground_tpu.envs.joystick import Joystick
    from open_duck_playground_tpu.envs.wrapper import TrainEnv

    env = Joystick(task=args.task)
    train_env = TrainEnv(
        env,
        num_envs=args.num_envs,
        episode_length=1000,
        randomization_fn=None if args.no_dr else randomize.domain_randomize,
        randomization_rng=jax.random.PRNGKey(0),
    )

    reset = jax.jit(train_env.reset)
    step = jax.jit(train_env.step)

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

    def hard_barrier(x):
        """Materialize on host and fold into a python float.

        block_until_ready alone has been observed to NOT block on the
        axon tunnel after long sessions (round 5: a 100-step 4096-env
        rollout 'completed' in 3.9 ms -> a bogus 103M steps/s bench).
        device_get cannot lie: the bytes must exist host-side.
        """
        import numpy as _np

        return float(_np.asarray(jax.device_get(x)).sum())

    rollout = jax.jit(rollout)
    t0 = time.perf_counter()
    state = rollout(state, jax.random.PRNGKey(3))
    hard_barrier(state.reward)
    log(f"[bench] rollout compile+first in {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    state = rollout(state, jax.random.PRNGKey(4))
    hard_barrier(state.reward)
    dt = time.perf_counter() - t0

    # plausibility guard: re-measure if the implied rate exceeds any
    # physically-credible single-chip number for this engine (~6x the
    # round-3/4 measured 3.3-3.5M); keep the SLOWEST measurement
    implied = args.steps * args.num_envs / dt
    if implied > 2e7:
        log(f"[bench] suspect fast measurement {implied:.3g} steps/s; "
            f"re-measuring")
        t0 = time.perf_counter()
        state = rollout(state, jax.random.PRNGKey(5))
        hard_barrier(state.reward)
        dt = max(dt, time.perf_counter() - t0)

    n_chips = jax.device_count() if not args.cpu else 1
    env_steps_per_sec = args.steps * args.num_envs / dt
    per_chip = env_steps_per_sec / n_chips

    metric = f"env_steps_per_sec_per_chip_joystick_dr_{args.num_envs}envs"
    if args.task != "flat_terrain":
        metric += f"_{args.task}"
    return {
        "metric": metric,
        "value": round(per_chip, 1),
        "unit": "env-steps/s/chip",
        "vs_baseline": round(per_chip / CPU_BASELINE_STEPS_PER_SEC, 3),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--num_envs", type=int, default=4096)
    parser.add_argument("--task", type=str, default="flat_terrain",
                        help="e.g. rough_terrain_backlash for the hfield bench")
    parser.add_argument("--steps", type=int, default=100, help="control steps to time")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--no_dr", action="store_true")
    args = parser.parse_args()

    try:
        result = run_bench(args)
    except Exception as e:
        log(traceback.format_exc())
        result = {
            "metric": "env_steps_per_sec_per_chip_joystick_dr_4096envs",
            "value": 0,
            "unit": "env-steps/s/chip",
            "vs_baseline": 0,
            "error": f"{type(e).__name__}: {e}",
            "last_live_measurement": "RESULTS/r5/bench_flat2.json "
            "(3.40M env-steps/s/chip, 2026-08-20; the axon tunnel has "
            "intermittent outages — see RESULTS.md)",
        }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
