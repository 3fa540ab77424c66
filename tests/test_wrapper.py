"""Episode/auto-reset wrapper semantics + multi-device sharding tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_duck_playground_tpu.envs.joystick import Joystick
from open_duck_playground_tpu.envs.wrapper import TrainEnv


@pytest.fixture(scope="module")
def jenv():
    return Joystick(task="flat_terrain")


def test_episode_truncation_and_autoreset(jenv):
    env = TrainEnv(jenv, num_envs=2, episode_length=3)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    act = jnp.zeros((2, jenv.action_size))

    first_qpos = np.asarray(state.data.qpos)
    for i in range(3):
        state = step(state, act)
    # at step 3 == episode_length: done with truncation (robot still standing)
    assert np.asarray(state.done).min() == 1.0
    assert np.asarray(state.info["truncation"]).min() == 1.0

    # next step auto-resets to the cached first state before stepping
    state = step(state, act)
    assert np.asarray(state.done).max() == 0.0
    assert np.asarray(state.info["steps"]).max() == 1.0
    # the env restarted near its first state (one control step after it)
    assert np.abs(np.asarray(state.data.qpos)[:, :2] - first_qpos[:, :2]).max() < 0.05


def test_steps_counter_resets_only_done_envs(jenv):
    env = TrainEnv(jenv, num_envs=2, episode_length=1000)
    state = jax.jit(env.reset)(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    act = jnp.zeros((2, jenv.action_size))
    for _ in range(3):
        state = step(state, act)
    # flip env 0 upside down: termination (upvector z < 0) must fire for it
    qpos = state.data.qpos
    flipped = jnp.array([0.0, 1.0, 0.0, 0.0])  # 180deg about x
    qpos = qpos.at[0, 3:7].set(flipped).at[0, 2].set(0.4)
    state = state.replace(data=state.data.replace(qpos=qpos))
    state = step(state, act)
    done = np.asarray(state.done)
    assert done[0] == 1.0 and done[1] == 0.0
    # the following step auto-resets env 0 only
    state = step(state, act)
    steps = np.asarray(state.info["steps"])
    assert steps[0] == 1.0  # restarted
    assert steps[1] == 5.0  # kept counting


def test_env_sharding_over_mesh(jenv):
    """Env batch shards over the 8 virtual CPU devices and steps correctly."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n_dev = jax.device_count()
    assert n_dev == 8, f"conftest should provide 8 cpu devices, got {n_dev}"
    mesh = Mesh(np.array(jax.devices()), ("env",))
    sh_env = NamedSharding(mesh, P("env"))

    env = TrainEnv(jenv, num_envs=16, episode_length=100)
    state = jax.jit(env.reset, out_shardings=sh_env)(jax.random.PRNGKey(2))
    # leaves are actually sharded along the env axis
    assert state.data.qpos.sharding.is_equivalent_to(sh_env, state.data.qpos.ndim)
    step = jax.jit(env.step)
    out = step(state, jnp.zeros((16, jenv.action_size)))
    assert np.isfinite(np.asarray(out.reward)).all()
    # sharding is preserved through the step
    assert out.data.qpos.sharding.spec == sh_env.spec
