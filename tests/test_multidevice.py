"""Device-count invariance: the same training math on a 1-device and an
8-device mesh (GSPMD shards data, not semantics).

RUN_SLOW-gated: two full jit compiles of the PPO training epoch on CPU.
"""

import os

import jax
import numpy as np
import pytest
from jax.sharding import Mesh


@pytest.mark.skipif(
    os.environ.get("RUN_SLOW", "0") != "1",
    reason="two PPO epoch compiles on CPU; set RUN_SLOW=1",
)
def test_training_invariant_to_device_count(flat_model):
    del flat_model  # only to reuse the session's compile cache warmup
    from open_duck_playground_tpu.envs.joystick import Joystick
    from open_duck_playground_tpu.train import ppo

    assert jax.device_count() >= 8, "conftest provides 8 virtual CPU devices"

    def run(n_dev):
        env = Joystick(task="flat_terrain")
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("env",))
        _, (normalizer, params), _ = ppo.train(
            env,
            eval_env=None,
            num_timesteps=32,
            episode_length=8,
            num_envs=16,
            unroll_length=2,
            num_minibatches=2,
            batch_size=8,
            num_updates_per_batch=1,
            num_evals=2,
            seed=0,
            mesh=mesh,
        )
        return jax.tree_util.tree_leaves((normalizer, params))

    l1 = run(1)
    l8 = run(8)
    assert len(l1) == len(l8)
    # Bit-invariance across device counts is unattainable here: GSPMD
    # fuses/vectorizes per-shard shapes differently, so even per-env
    # physics differs at f32 epsilon, and the iterations=1 solver plus the
    # qacc-carrying sensors amplify epsilon into O(1) on the chaotic obs
    # dims (accelerometer/force entries; see tests/test_lane.py docstring).
    # Verified separately: run(1) twice is bit-identical. This test guards
    # the sharding itself — a transposed shard, wrong reduction axis, or
    # dropped device produces wholesale (>50%) mismatch or NaNs, while
    # legitimate chaos leaves the majority of elements in agreement.
    for a, b in zip(l1, l8):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        assert np.isfinite(a).all() and np.isfinite(b).all()
        close = np.isclose(a, b, rtol=1e-4, atol=1e-5)
        assert close.mean() > 0.5, (a.shape, close.mean())
