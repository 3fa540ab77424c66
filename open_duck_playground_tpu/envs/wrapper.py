"""Training env wrapper stack (parity with mujoco_playground's
`wrap_for_brax_training`, reference common/runner.py:117).

Combines, in the reference's order:
- vmap over the env batch, optionally with a per-env randomized model
  (DomainRandomizationVmapWrapper semantics: the batched model fields from
  `randomize.domain_randomize` are vmapped with the returned in_axes)
- episode bookkeeping (step count, `truncation` flag at episode_length)
- auto-reset to the episode's FIRST state on done (Brax semantics: envs
  restart from their cached initial state, not a fresh randomized reset).

Functional design: `TrainEnv.reset(rng)` / `.step(state, action)` are pure
and jit/shard-compatible; the batch axis is axis 0 of every State leaf.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from open_duck_playground_tpu.envs.types import State


class TrainEnv:
    def __init__(
        self,
        env,
        num_envs: int,
        episode_length: int,
        action_repeat: int = 1,
        randomization_fn: Optional[Callable] = None,
        randomization_rng: Optional[jax.Array] = None,
    ):
        self._env = env
        self.num_envs = num_envs
        self.episode_length = episode_length
        self.action_repeat = action_repeat

        if randomization_fn is not None:
            rng = (
                randomization_rng
                if randomization_rng is not None
                else jax.random.PRNGKey(0)
            )
            keys = jax.random.split(rng, num_envs)
            self._model_v, in_axes = randomization_fn(env.model, keys)
            self._reset_fn = jax.vmap(env.reset_with_model, in_axes=(in_axes, 0))
            self._step_fn = jax.vmap(env.step_with_model, in_axes=(in_axes, 0, 0))
        else:
            self._model_v = None
            self._reset_fn = jax.vmap(lambda r: env.reset(r))
            self._step_fn = jax.vmap(lambda s, a: env.step(s, a))

    @property
    def env(self):
        return self._env

    @property
    def action_size(self) -> int:
        return self._env.action_size

    @property
    def observation_size(self):
        return self._env.observation_size

    def reset(self, rng: jax.Array) -> State:
        keys = jax.random.split(rng, self.num_envs)
        if self._model_v is not None:
            state = self._reset_fn(self._model_v, keys)
        else:
            state = self._reset_fn(keys)
        info = dict(state.info)
        info["steps"] = jnp.zeros(self.num_envs)
        info["truncation"] = jnp.zeros(self.num_envs)
        # auto-reset caches (Brax AutoResetWrapper semantics)
        info["first_data"] = state.data
        info["first_obs"] = state.obs
        state = state.replace(info=info)
        # strip weak types so reset and step emit identical avals: otherwise
        # the first step() call after reset jit-compiles one variant and the
        # second call compiles ANOTHER (weak-typed leaves became strong),
        # costing a full extra multi-minute TPU compile per process
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.result_type(x)), state
        )

    def _raw_step(self, state: State, action: jax.Array) -> State:
        if self._model_v is not None:
            return self._step_fn(self._model_v, state, action)
        return self._step_fn(state, action)

    def step(self, state: State, action: jax.Array) -> State:
        # --- auto-reset: restart finished envs from their first state ---
        done_prev = state.done
        data = jax.tree_util.tree_map(
            lambda first, cur: _where_done(done_prev, first, cur),
            state.info["first_data"],
            state.data,
        )
        obs = jax.tree_util.tree_map(
            lambda first, cur: _where_done(done_prev, first, cur),
            state.info["first_obs"],
            state.obs,
        )
        info = dict(state.info)
        info["steps"] = jnp.where(done_prev > 0, 0.0, info["steps"])
        state = state.replace(data=data, obs=obs, info=info)

        # --- episode wrapper: action_repeat + truncation bookkeeping ---
        first_data, first_obs = state.info["first_data"], state.info["first_obs"]
        steps_prev = state.info["steps"]
        inner = state.replace(
            info={k: v for k, v in state.info.items()
                  if k not in ("steps", "truncation", "first_data", "first_obs")}
        )
        for _ in range(self.action_repeat):
            inner = self._raw_step(inner, action)

        steps = steps_prev + self.action_repeat
        at_limit = steps >= self.episode_length
        env_done = inner.done
        done = jnp.where(at_limit, jnp.ones_like(env_done), env_done)
        truncation = jnp.where(at_limit, 1.0 - env_done, jnp.zeros_like(env_done))

        info = dict(inner.info)
        info["steps"] = steps
        info["truncation"] = truncation
        info["first_data"] = first_data
        info["first_obs"] = first_obs
        out = inner.replace(done=done, info=info)
        # strong-typed leaves, matching reset() (see comment there)
        return jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.result_type(x)), out
        )


def _where_done(done, first, cur):
    if first.ndim == 0:
        return jnp.where(done > 0, first, cur)
    shape = (done.shape[0],) + (1,) * (first.ndim - 1)
    return jnp.where(done.reshape(shape) > 0, first, cur)


def wrap_for_training(
    env,
    num_envs: int,
    episode_length: int,
    action_repeat: int = 1,
    randomization_fn=None,
    randomization_rng=None,
) -> TrainEnv:
    return TrainEnv(
        env,
        num_envs=num_envs,
        episode_length=episode_length,
        action_repeat=action_repeat,
        randomization_fn=randomization_fn,
        randomization_rng=randomization_rng,
    )
