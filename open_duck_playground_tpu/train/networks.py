"""Policy/value networks, tanh-squashed Normal policy, running obs stats.

Semantics match the Brax PPO network stack the reference trains with
(reference common/runner.py:94-100): lecun-uniform MLPs with swish
activation, a 2*act_size policy head interpreted as (loc, pre-softplus
scale) of a tanh-squashed Normal (min_std 0.001), running mean/std obs
normalization over every obs key, asymmetric actor ("state") / critic
("privileged_state") observations, deterministic action tanh(loc) --
verified against the reference's ONNX export math (export_onnx.py:71-102).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Params = Any
_MIN_STD = 0.001


# ---------------------------------------------------------------------------
# MLP
# ---------------------------------------------------------------------------


def _lecun_uniform(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    scale = jnp.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -scale, scale)


def init_mlp(key: jax.Array, sizes: Sequence[int]) -> Dict[str, Dict[str, jax.Array]]:
    """Returns {'hidden_0': {'kernel', 'bias'}, ...} (brax param naming)."""
    params = {}
    for i in range(len(sizes) - 1):
        key, sub = jax.random.split(key)
        params[f"hidden_{i}"] = {
            "kernel": _lecun_uniform(sub, (sizes[i], sizes[i + 1])),
            "bias": jnp.zeros(sizes[i + 1]),
        }
    return params


def apply_mlp(params, x: jax.Array, activate_final: bool = False) -> jax.Array:
    n = len(params)
    for i in range(n):
        p = params[f"hidden_{i}"]
        x = x @ p["kernel"] + p["bias"]
        if i < n - 1 or activate_final:
            x = x * jax.nn.sigmoid(x)  # swish
    return x


# ---------------------------------------------------------------------------
# Tanh-squashed Normal action distribution (brax NormalTanhDistribution)
# ---------------------------------------------------------------------------


def dist_create(logits: jax.Array) -> Tuple[jax.Array, jax.Array]:
    loc, scale = jnp.split(logits, 2, axis=-1)
    scale = jax.nn.softplus(scale) + _MIN_STD
    return loc, scale


def dist_sample_no_postprocess(loc, scale, key) -> jax.Array:
    return loc + scale * jax.random.normal(key, loc.shape)


def dist_postprocess(raw: jax.Array) -> jax.Array:
    return jnp.tanh(raw)


def dist_log_prob(loc, scale, raw_sample) -> jax.Array:
    """log prob of the tanh-squashed sample, parameterized by the raw sample."""
    log_unnormalized = -0.5 * jnp.square((raw_sample - loc) / scale)
    log_normalization = 0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(scale)
    log_prob = log_unnormalized - log_normalization
    # tanh forward log-det: log |d tanh(x)/dx| = 2 (log2 - x - softplus(-2x))
    log_det = 2.0 * (jnp.log(2.0) - raw_sample - jax.nn.softplus(-2.0 * raw_sample))
    return jnp.sum(log_prob - log_det, axis=-1)


def dist_entropy(loc, scale, key) -> jax.Array:
    """Normal entropy plus a single-sample tanh log-det correction (brax)."""
    entropy = 0.5 + 0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(scale)
    raw = dist_sample_no_postprocess(loc, scale, key)
    log_det = 2.0 * (jnp.log(2.0) - raw - jax.nn.softplus(-2.0 * raw))
    return jnp.sum(entropy + log_det, axis=-1)


# ---------------------------------------------------------------------------
# Running statistics (Welford over batches, brax running_statistics semantics)
# ---------------------------------------------------------------------------


@struct.dataclass
class RunningStatisticsState:
    count: jax.Array
    mean: Dict[str, jax.Array]
    summed_variance: Dict[str, jax.Array]
    std: Dict[str, jax.Array]


def rs_init(obs_sizes: Dict[str, int]) -> RunningStatisticsState:
    zeros = {k: jnp.zeros(v) for k, v in obs_sizes.items()}
    ones = {k: jnp.ones(v) for k, v in obs_sizes.items()}
    return RunningStatisticsState(
        count=jnp.zeros(()), mean=zeros, summed_variance=zeros, std=ones
    )


def rs_update(state: RunningStatisticsState, batch: Dict[str, jax.Array], *, std_min_value=1e-6, std_max_value=1e6) -> RunningStatisticsState:
    """Welford update over all leading batch dims of each obs key."""
    first = next(iter(batch.values()))
    batch_size = 1
    for d in first.shape[:-1]:
        batch_size *= d
    count = state.count + batch_size

    def update_one(mean, summed_var, data):
        diff_to_old = data - mean
        mean_new = mean + jnp.sum(diff_to_old, axis=tuple(range(data.ndim - 1))) / count
        diff_to_new = data - mean_new
        summed_var_new = summed_var + jnp.sum(
            diff_to_old * diff_to_new, axis=tuple(range(data.ndim - 1))
        )
        summed_var_new = jnp.maximum(summed_var_new, 0.0)
        std_new = jnp.sqrt(summed_var_new / count)
        std_new = jnp.clip(std_new, std_min_value, std_max_value)
        return mean_new, summed_var_new, std_new

    means, svars, stds = {}, {}, {}
    for k in batch:
        means[k], svars[k], stds[k] = update_one(
            state.mean[k], state.summed_variance[k], batch[k]
        )
    return RunningStatisticsState(count=count, mean=means, summed_variance=svars, std=stds)


def rs_normalize(state: RunningStatisticsState, obs: Dict[str, jax.Array]):
    return {k: (v - state.mean[k]) / state.std[k] for k, v in obs.items()}


# ---------------------------------------------------------------------------
# PPO networks bundle
# ---------------------------------------------------------------------------


@struct.dataclass
class PPOParams:
    policy: Dict[str, Any]
    value: Dict[str, Any]


class PPONetworks:
    """Static network config + pure apply functions."""

    def __init__(
        self,
        obs_sizes: Dict[str, int],
        action_size: int,
        policy_hidden_layer_sizes: Sequence[int] = (512, 256, 128),
        value_hidden_layer_sizes: Sequence[int] = (512, 256, 128),
        policy_obs_key: str = "state",
        value_obs_key: str = "privileged_state",
    ):
        self.obs_sizes = dict(obs_sizes)
        self.action_size = action_size
        self.policy_sizes = [obs_sizes[policy_obs_key], *policy_hidden_layer_sizes, 2 * action_size]
        self.value_sizes = [obs_sizes[value_obs_key], *value_hidden_layer_sizes, 1]
        self.policy_obs_key = policy_obs_key
        self.value_obs_key = value_obs_key

    def init(self, key: jax.Array) -> PPOParams:
        kp, kv = jax.random.split(key)
        return PPOParams(
            policy={"params": init_mlp(kp, self.policy_sizes)},
            value={"params": init_mlp(kv, self.value_sizes)},
        )

    def policy_logits(self, params: PPOParams, normalizer, obs) -> jax.Array:
        x = (obs[self.policy_obs_key] - normalizer.mean[self.policy_obs_key]) / (
            normalizer.std[self.policy_obs_key]
        )
        return apply_mlp(params.policy["params"], x)

    def value(self, params: PPOParams, normalizer, obs) -> jax.Array:
        x = (obs[self.value_obs_key] - normalizer.mean[self.value_obs_key]) / (
            normalizer.std[self.value_obs_key]
        )
        return apply_mlp(params.value["params"], x)[..., 0]

    def make_policy_fn(self, deterministic: bool = False):
        """Returns policy(full_params=(normalizer, PPOParams), obs, rng) ->
        (action, extras). Mirrors brax make_policy."""

        def policy(full_params, obs, rng):
            normalizer, params = full_params
            logits = self.policy_logits(params, normalizer, obs)
            loc, scale = dist_create(logits)
            if deterministic:
                return jnp.tanh(loc), {}
            raw = dist_sample_no_postprocess(loc, scale, rng)
            log_prob = dist_log_prob(loc, scale, raw)
            return jnp.tanh(raw), {"raw_action": raw, "log_prob": log_prob}

        return policy
