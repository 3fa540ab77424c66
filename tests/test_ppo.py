"""PPO component tests: GAE, distribution math, running stats, wrappers."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_duck_playground_tpu.train import networks as nets
from open_duck_playground_tpu.train.ppo import compute_gae


def test_gae_matches_reference_recursion():
    """Cross-check the scan against a plain python GAE recursion."""
    T, B = 7, 3
    rng = np.random.RandomState(0)
    rewards = rng.randn(T, B).astype(np.float32)
    values = rng.randn(T, B).astype(np.float32)
    bootstrap = rng.randn(B).astype(np.float32)
    termination = (rng.rand(T, B) < 0.2).astype(np.float32)
    truncation = (rng.rand(T, B) < 0.1).astype(np.float32) * (1 - termination)
    lam, gamma = 0.95, 0.97

    vs, adv = compute_gae(
        jnp.asarray(truncation), jnp.asarray(termination), jnp.asarray(rewards),
        jnp.asarray(values), jnp.asarray(bootstrap), lambda_=lam, discount=gamma,
    )

    # reference recursion
    tmask = 1 - truncation
    values_tp1 = np.concatenate([values[1:], bootstrap[None]], 0)
    deltas = (rewards + gamma * (1 - termination) * values_tp1 - values) * tmask
    acc = np.zeros(B, np.float32)
    vs_minus = np.zeros_like(values)
    for t in reversed(range(T)):
        acc = deltas[t] + gamma * (1 - termination[t]) * tmask[t] * lam * acc
        vs_minus[t] = acc
    vs_np = vs_minus + values
    vs_tp1 = np.concatenate([vs_np[1:], bootstrap[None]], 0)
    adv_np = (rewards + gamma * (1 - termination) * vs_tp1 - values) * tmask

    np.testing.assert_allclose(np.asarray(vs), vs_np, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(adv), adv_np, rtol=1e-5, atol=1e-5)


def test_dist_log_prob_matches_numeric():
    """log_prob of tanh-Normal: check against change-of-variables numerically."""
    key = jax.random.PRNGKey(0)
    loc = jnp.array([0.3, -1.0])
    scale = jnp.array([0.5, 1.2])
    raw = jnp.array([0.1, -0.7])
    lp = nets.dist_log_prob(loc, scale, raw)
    # manual: normal logpdf - log|dtanh/dx|
    normal_lp = -0.5 * ((raw - loc) / scale) ** 2 - jnp.log(scale) - 0.5 * jnp.log(2 * jnp.pi)
    jac = jnp.log(1 - jnp.tanh(raw) ** 2 + 1e-12)
    expected = jnp.sum(normal_lp - jac)
    np.testing.assert_allclose(float(lp), float(expected), rtol=1e-4)


def test_dist_deterministic_in_range():
    logits = jax.random.normal(jax.random.PRNGKey(1), (10, 28)) * 3
    loc, scale = nets.dist_create(logits)
    act = nets.dist_postprocess(loc)
    assert (jnp.abs(act) <= 1.0).all()
    assert (scale > 0).all()


def test_running_statistics_matches_numpy():
    obs_sizes = {"state": 5}
    state = nets.rs_init(obs_sizes)
    rng = np.random.RandomState(2)
    all_data = []
    for _ in range(4):
        batch = rng.randn(16, 5).astype(np.float32) * 3 + 1.5
        all_data.append(batch)
        state = nets.rs_update(state, {"state": jnp.asarray(batch)})
    data = np.concatenate(all_data, 0)
    np.testing.assert_allclose(np.asarray(state.mean["state"]), data.mean(0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(state.std["state"]), data.std(0), atol=1e-3)


def test_mlp_matches_reference_math():
    """Swish MLP forward agrees with a straightforward numpy evaluation."""
    params = nets.init_mlp(jax.random.PRNGKey(3), [4, 8, 6])
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(4), (2, 4)))
    out = np.asarray(nets.apply_mlp(params, jnp.asarray(x)))
    h = x @ np.asarray(params["hidden_0"]["kernel"]) + np.asarray(params["hidden_0"]["bias"])
    h = h * (1 / (1 + np.exp(-h)))
    y = h @ np.asarray(params["hidden_1"]["kernel"]) + np.asarray(params["hidden_1"]["bias"])
    np.testing.assert_allclose(out, y, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(
    os.environ.get("RUN_SLOW", "0") != "1",
    reason="end-to-end PPO smoke is minutes of XLA compile; set RUN_SLOW=1",
)
def test_ppo_end_to_end_smoke():
    from open_duck_playground_tpu.envs import randomize
    from open_duck_playground_tpu.envs.joystick import Joystick
    from open_duck_playground_tpu.train import ppo

    env = Joystick(task="flat_terrain")
    eval_env = Joystick(task="flat_terrain")
    _, params, metrics = ppo.train(
        env, eval_env,
        num_timesteps=800, episode_length=20, num_envs=8, num_eval_envs=2,
        unroll_length=5, num_minibatches=2, batch_size=4, num_updates_per_batch=1,
        num_evals=2, randomization_fn=randomize.domain_randomize,
    )
    normalizer, _ = params
    assert float(normalizer.count) > 0
    assert "eval/episode_reward" in metrics or "training/sps" in metrics
