"""Absolute perf: MFU / roofline for the fused step + epoch breakdown.

VERDICT r4 #2: the 3.53M env-steps/s/chip headline is a ratio to our own
CPU baseline; this script produces the ABSOLUTE numbers a TPU engineer
would ask for:

  kernel mode (default):
    - XLA cost analysis (flops, bytes accessed) of the exact scanned
      rollout program bench.py times (4096 DR envs, 100 control steps)
    - achieved FLOP/s and HBM bytes/s from the measured wall time
    - arithmetic intensity vs the v5e ridge point -> compute- or
      memory-bound verdict, and % of the binding roofline achieved
    - per-control-step and per-substep FLOPs/bytes (nv=30 pipeline)

  --epoch mode:
    - ppo.train(profile_breakdown=True) at the recipe scale (8192 envs):
      times the REAL jitted sub-programs (rollout / sgd / eval /
      full-state checkpoint save) to attribute the end-to-end train sps
      vs the rollout-only bench sps (VERDICT r4 #2), and measures the
      full-state checkpoint cost at production shapes (VERDICT r4 #6).

TPU v5e (1 chip) public peaks used for the roofline:
  bf16 MXU 197 TFLOP/s, HBM 819 GB/s  (ridge ~240 FLOP/byte)
The physics pipeline is mostly f32 VPU work; vs the bf16 MXU peak the
reported MFU is therefore a LOWER bound on "how far from any speed of
light" — the binding wall in practice is HBM bandwidth, which is
dtype-agnostic and is the number to read.

Artifacts: RESULTS/r5/mfu_roofline*.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BPS = 819e9


def kernel_mode(args) -> dict:
    import jax

    from open_duck_playground_tpu.envs import randomize
    from open_duck_playground_tpu.envs.joystick import Joystick
    from open_duck_playground_tpu.envs.wrapper import TrainEnv
    from open_duck_playground_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    env = Joystick(task=args.task)
    train_env = TrainEnv(
        env, num_envs=args.num_envs, episode_length=1000,
        randomization_fn=randomize.domain_randomize,
        randomization_rng=jax.random.PRNGKey(0),
    )
    state = jax.jit(train_env.reset)(jax.random.PRNGKey(1))
    jax.block_until_ready(state.reward)

    def rollout(state, key):
        def body(carry, _):
            st, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(
                ka, (args.num_envs, env.action_size), minval=-1.0, maxval=1.0)
            return (train_env.step(st, a), k), None
        (state, key), _ = jax.lax.scan(body, (state, key), None,
                                       length=args.steps)
        return state

    import numpy as np

    def hard_barrier(x):
        # device_get, not block_until_ready: the axon tunnel has been seen
        # reporting completion without the result existing (bench.py note)
        return float(np.asarray(jax.device_get(x)).sum())

    rollout_jit = jax.jit(rollout)
    # compile + warm (two calls: weak-type second variant, see bench.py)
    state = rollout_jit(state, jax.random.PRNGKey(3))
    hard_barrier(state.reward)
    t0 = time.perf_counter()
    state = rollout_jit(state, jax.random.PRNGKey(4))
    hard_barrier(state.reward)
    dt = time.perf_counter() - t0

    out = {
        "mode": "kernel", "task": args.task, "num_envs": args.num_envs,
        "control_steps": args.steps, "wall_s": round(dt, 4),
        "env_steps_per_s": round(args.num_envs * args.steps / dt, 1),
    }
    try:
        ca = (rollout_jit.lower(state, jax.random.PRNGKey(5))
              .compile().cost_analysis())
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        byt = float(ca.get("bytes accessed", 0.0))
        out["program_flops"] = flops
        out["program_bytes"] = byt
        n_ctrl = args.num_envs * args.steps
        n_sub = n_ctrl * 10  # decimation 10: ctrl_dt 0.02 / sim_dt 0.002
        out["flops_per_env_ctrl_step"] = round(flops / n_ctrl, 1)
        out["bytes_per_env_ctrl_step"] = round(byt / n_ctrl, 1)
        out["flops_per_env_substep"] = round(flops / n_sub, 1)
        out["achieved_gflops"] = round(flops / dt / 1e9, 2)
        out["achieved_gbps"] = round(byt / dt / 1e9, 2)
        ai = flops / max(byt, 1.0)
        out["arithmetic_intensity_flop_per_byte"] = round(ai, 3)
        ridge = V5E_PEAK_BF16_FLOPS / V5E_PEAK_HBM_BPS
        out["v5e_ridge_flop_per_byte"] = round(ridge, 1)
        out["bound"] = "memory" if ai < ridge else "compute"
        out["pct_of_hbm_roofline"] = round(100 * (byt / dt) / V5E_PEAK_HBM_BPS, 2)
        out["pct_of_bf16_mxu_roofline"] = round(
            100 * (flops / dt) / V5E_PEAK_BF16_FLOPS, 3)
        # speed-of-light wall time if the binding wall were fully utilized
        sol = byt / V5E_PEAK_HBM_BPS if ai < ridge else flops / V5E_PEAK_BF16_FLOPS
        out["speed_of_light_wall_s"] = round(sol, 4)
        out["x_from_speed_of_light"] = round(dt / sol, 1)
    except Exception as e:
        out["cost_analysis_error"] = str(e)
    return out


def epoch_mode(args) -> dict:
    import jax

    from open_duck_playground_tpu.envs import randomize
    from open_duck_playground_tpu.envs.joystick import Joystick
    from open_duck_playground_tpu.train import ppo
    from open_duck_playground_tpu.utils.cache import setup_compilation_cache

    setup_compilation_cache()
    env = Joystick(task=args.task)
    eval_env = Joystick(task=args.task)
    tmp = tempfile.mkdtemp(prefix="ckpt_cost_")
    # recipe-scale shapes (train/config.py); num_timesteps only sets the
    # epoch trip count — profile_breakdown runs before the loop
    ppo.train(
        env, eval_env=eval_env,
        num_timesteps=2 * 8192 * 20,
        episode_length=1000, num_envs=8192, num_eval_envs=1024,
        unroll_length=20, num_minibatches=32, batch_size=256,
        num_updates_per_batch=4, num_evals=2, seed=0,
        randomization_fn=randomize.domain_randomize,
        save_full_state_dir=tmp,
        profile_breakdown=True,
    )
    bd = dict(ppo.LAST_PROFILE_BREAKDOWN or {})
    bd["mode"] = "epoch"
    bd["task"] = args.task
    return bd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epoch", action="store_true")
    ap.add_argument("--task", default="flat_terrain")
    ap.add_argument("--num_envs", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    result = epoch_mode(args) if args.epoch else kernel_mode(args)
    line = json.dumps(result)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
