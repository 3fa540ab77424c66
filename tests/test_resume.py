"""Curve-preserving resume (VERDICT r3 #4).

The reference stack checkpoints policy params only (reference
common/runner.py:68-76), so a killed run restarts its optimizer, env batch
and RNG streams — the resumed curve diverges. Our full-state checkpoints
(train/checkpoint.py save_full) capture TrainingState + env batch + host
RNG keys per epoch, so kill + --auto_resume replays the uninterrupted run
bit-for-bit. Proven here on a tiny deterministic env (the duck env's PPO
path is identical; it is just minutes of XLA compile, so the in-suite proof
uses a toy with the same State/TrainEnv contract).
"""

import jax
import jax.numpy as jnp
import numpy as np

from open_duck_playground_tpu.envs.types import State
from open_duck_playground_tpu.train import checkpoint as ckpt
from open_duck_playground_tpu.train import ppo


class ToyEnv:
    """Deterministic point-mass: action nudges a 3-d position; reward is
    -|pos|; done when |pos| escapes. Exercises the full State contract."""

    action_size = 3
    observation_size = {"state": (6,), "privileged_state": (8,)}

    def reset(self, rng):
        pos = jax.random.uniform(rng, (3,), minval=-0.5, maxval=0.5)
        info = {"rng": rng, "t": jnp.zeros((), jnp.float32)}
        return State(
            data=pos,
            obs=self._obs(pos, info),
            reward=jnp.zeros(()),
            done=jnp.zeros(()),
            metrics={"dist": jnp.linalg.norm(pos)},
            info=info,
        )

    def step(self, state, action):
        pos = state.data * 0.95 + 0.1 * jnp.tanh(action)
        info = dict(state.info)
        info["t"] = info["t"] + 1.0
        reward = -jnp.linalg.norm(pos)
        done = (jnp.linalg.norm(pos) > 5.0).astype(jnp.float32)
        return state.replace(
            data=pos, obs=self._obs(pos, info), reward=reward, done=done,
            metrics={"dist": jnp.linalg.norm(pos)},
        )

    def _obs(self, pos, info):
        s = jnp.concatenate([pos, pos * 0.5])
        p = jnp.concatenate([s, jnp.array([info["t"], 1.0])])
        return {"state": s, "privileged_state": p}


def _train(tmpdir=None, stop_after=None, auto_resume=False, num_evals=5,
           save_every=1):
    evals = []

    def progress(step, metrics):
        if "eval/episode_reward" in metrics:
            evals.append((step, metrics["eval/episode_reward"]))

    _, params, _ = ppo.train(
        ToyEnv(), eval_env=ToyEnv(),
        num_timesteps=2048, episode_length=16, num_envs=8, num_eval_envs=4,
        unroll_length=4, num_minibatches=2, batch_size=4,
        num_updates_per_batch=1, num_evals=num_evals, seed=7,
        network_factory={
            "policy_hidden_layer_sizes": (16,),
            "value_hidden_layer_sizes": (16,),
            "policy_obs_key": "state",
            "value_obs_key": "privileged_state",
        },
        progress_fn=progress,
        save_full_state_dir=tmpdir,
        auto_resume=auto_resume,
        stop_after_epochs=stop_after,
        save_full_state_every=save_every,
        host_loop=True,
    )
    return evals, params


def test_kill_and_resume_bit_reproduces_curve(tmp_path):
    d = str(tmp_path / "run")
    # A: uninterrupted
    evals_a, params_a = _train()
    assert len(evals_a) == 5  # eval at 0 + 4 epochs
    # B: same recipe, "killed" after 2 epochs (full state on disk)
    evals_b, _ = _train(tmpdir=d, stop_after=2)
    assert len(evals_b) == 3
    assert ckpt.latest_full(d) is not None
    # C: auto-resume completes the recipe
    evals_c, params_c = _train(tmpdir=d, auto_resume=True)
    assert len(evals_c) == 2  # epochs 3 and 4 only

    merged = evals_b + evals_c
    assert [s for s, _ in merged] == [s for s, _ in evals_a]
    np.testing.assert_array_equal(
        np.asarray([r for _, r in merged], np.float64),
        np.asarray([r for _, r in evals_a], np.float64),
    )
    for a, c in zip(jax.tree_util.tree_leaves(params_a),
                    jax.tree_util.tree_leaves(params_c)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_save_cadence_every_n_epochs(tmp_path):
    # every=2 over epochs 0..3 saves on epochs 1 and 3 (the final epoch is
    # also always-saved; here it coincides with the cadence)
    d = str(tmp_path / "cad")
    _train(tmpdir=d, save_every=2)
    assert [e for e, _ in ckpt.list_full(d)] == [1, 3]
    # cadence never fires before a stop_after_epochs kill, but the crash-sim
    # exit must still leave the stopped epoch's state on disk for resume
    d2 = str(tmp_path / "cad_stop")
    _train(tmpdir=d2, save_every=5, stop_after=2)
    assert [e for e, _ in ckpt.list_full(d2)] == [1]


def test_full_state_rotation(tmp_path):
    d = str(tmp_path / "rot")
    state = {"x": jnp.arange(4.0)}
    for epoch in range(5):
        ckpt.save_full(d, epoch, state, keep=2)
    entries = ckpt.list_full(d)
    assert [e for e, _ in entries] == [3, 4]
    assert ckpt.latest_full(d)[0] == 4
    restored = ckpt.load_full(ckpt.latest_full(d)[1], {"x": jnp.zeros(4)})
    np.testing.assert_array_equal(np.asarray(restored["x"]), np.arange(4.0))
