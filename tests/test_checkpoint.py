"""Checkpoint save/restore round trip (reference common/runner.py:68-76 and
--restore_checkpoint_path, open_duck_mini_v2/runner.py:47-52)."""

import jax
import jax.numpy as jnp
import numpy as np

from open_duck_playground_tpu.train import checkpoint as ckpt
from open_duck_playground_tpu.train import networks as nets


def _full_params(seed=0):
    obs_sizes = {"state": 101, "privileged_state": 212}
    network = nets.PPONetworks(
        obs_sizes, 14,
        policy_hidden_layer_sizes=(32, 16),
        value_hidden_layer_sizes=(32, 16),
        policy_obs_key="state", value_obs_key="privileged_state",
    )
    params = network.init(jax.random.PRNGKey(seed))
    normalizer = nets.rs_init(obs_sizes)
    return network, (normalizer, params)


def test_checkpoint_roundtrip(tmp_path):
    _, full = _full_params(seed=0)
    path = str(tmp_path / "ckpt_0")
    ckpt.save(path, full)
    _, other = _full_params(seed=1)  # different values, same structure
    restored = ckpt.load(path, other)
    ref_leaves = jax.tree_util.tree_leaves(full)
    res_leaves = jax.tree_util.tree_leaves(restored)
    assert len(ref_leaves) == len(res_leaves)
    for a, b in zip(ref_leaves, res_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert jnp.asarray(a).dtype == jnp.asarray(b).dtype


def test_checkpoint_restored_policy_acts_identically(tmp_path):
    network, full = _full_params(seed=2)
    path = str(tmp_path / "ckpt_1")
    ckpt.save(path, full)
    _, other = _full_params(seed=3)
    restored = ckpt.load(path, other)
    policy = network.make_policy_fn(deterministic=True)
    obs = {
        "state": jnp.linspace(-1, 1, 101),
        "privileged_state": jnp.zeros(212),
    }
    a1, _ = policy(full, obs, jax.random.PRNGKey(0))
    a2, _ = policy(restored, obs, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
