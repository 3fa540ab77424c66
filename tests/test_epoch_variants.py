"""One epoch program per run: the carry-canonicalization regression gate.

Round 5 found every cold-cache training run paying TWO compiles of the
giant whole-epoch program (~7 min each on the TPU path): the first from
aval weak-typing / uncommitted-sharding drift between the reset-produced
carry and the epoch outputs, the second from sharding-FLAVOR mismatch on
one device (NamedSharding inputs vs SingleDeviceSharding jit outputs are
distinct executable-cache signatures). ppo.train now canonicalizes the
carry (strong-type + identity-jit round-trip) before the loop; this test
pins the invariant on both a 1-device and a 2-device mesh.

Runs the ToyEnv at tiny shapes with host_loop=False (the scan-epoch mode
where the giant program exists).
"""

import numpy as np
import pytest

from open_duck_playground_tpu.train import ppo

from test_resume import ToyEnv


@pytest.mark.parametrize("n_dev", [1, 2])
def test_single_epoch_program_variant(n_dev):
    import jax
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("env",))
    ppo.train(
        ToyEnv(), eval_env=ToyEnv(), mesh=mesh,
        num_timesteps=2048, episode_length=16, num_envs=8, num_eval_envs=4,
        unroll_length=4, num_minibatches=2, batch_size=4,
        num_updates_per_batch=1, num_evals=5, seed=7,
        network_factory={
            "policy_hidden_layer_sizes": (16,),
            "value_hidden_layer_sizes": (16,),
            "policy_obs_key": "state",
            "value_obs_key": "privileged_state",
        },
        host_loop=False,
    )
    assert ppo.LAST_EPOCH_PROGRAM_VARIANTS == 1
