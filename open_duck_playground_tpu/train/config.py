"""PPO hyperparameter presets.

`brax_ppo_config("BerkeleyHumanoidJoystickFlatTerrain")` is the recipe the
reference trains with (reference common/runner.py:87-89, hardcoded). The
exact upstream values live in mujoco_playground's locomotion_params; this
is our reconstruction of that preset (documented in SURVEY.md as such:
only network sizes/obs keys and the tanh(loc) head are externally verified
via the reference's ONNX export). Every field is CLI-overridable.
"""

from __future__ import annotations

from ml_collections import config_dict


def brax_ppo_config(env_name: str = "BerkeleyHumanoidJoystickFlatTerrain") -> config_dict.ConfigDict:
    cfg = config_dict.create(
        num_timesteps=150_000_000,
        num_evals=15,
        reward_scaling=1.0,
        episode_length=1000,
        normalize_observations=True,
        action_repeat=1,
        unroll_length=20,
        num_minibatches=32,
        num_updates_per_batch=4,
        discounting=0.97,
        learning_rate=3e-4,
        entropy_cost=5e-3,
        num_envs=8192,
        batch_size=256,
        max_grad_norm=1.0,
        clipping_epsilon=0.2,
        gae_lambda=0.95,
        normalize_advantage=True,
        num_eval_envs=128,
        deterministic_eval=False,
        network_factory=config_dict.create(
            policy_hidden_layer_sizes=(512, 256, 128),
            value_hidden_layer_sizes=(512, 256, 128),
            policy_obs_key="state",
            value_obs_key="privileged_state",
        ),
    )
    return cfg
