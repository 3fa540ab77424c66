"""Gait-clock conditioning (round-4 recipe extension).

The reference drives the imitation clock one reference-motion step per ctrl
step (reference joystick.py:405-412) and exposes a frequency factor only as
a deploy-time teleop control (mujoco_infer.py:105-154). Our env can train
the factor in: per-episode randomization and/or a command-conditioned law,
carried to deploy through ONNX metadata. These tests pin:

  - default config reproduces the reference's integer clock bit-exactly;
  - the command law phase_frequency_from_command;
  - randomized / conditioned clocks actually advance at the scaled rate;
  - ONNX metadata round-trips through our writer + reader.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_duck_playground_tpu.envs import joystick


@pytest.fixture(scope="module")
def flat_env():
    return joystick.Joystick(task="flat_terrain")


def _roll(env, rng, n_steps, action=None):
    state = jax.jit(env.reset)(rng)
    step = jax.jit(env.step)
    act = jnp.zeros(env.action_size) if action is None else action
    clocks, phases = [], []
    for _ in range(n_steps):
        state = step(state, act)
        clocks.append(float(state.info["imitation_i"]))
        phases.append(np.asarray(state.info["imitation_phase"]))
    return state, np.asarray(clocks), np.asarray(phases)


def test_default_clock_matches_integer_counter(flat_env):
    """factor 1.0 -> imitation_i visits exactly 1.0, 2.0, ... mod period."""
    period = flat_env.PRM.nb_steps_in_period
    _, clocks, phases = _roll(flat_env, jax.random.PRNGKey(0), 2 * period + 3)
    expected = np.asarray([(i + 1) % period for i in range(2 * period + 3)],
                          np.float32)
    np.testing.assert_array_equal(clocks, expected)
    exp_phase = expected / period * 2 * np.pi
    np.testing.assert_allclose(phases[:, 0], np.cos(exp_phase), atol=1e-6)
    np.testing.assert_allclose(phases[:, 1], np.sin(exp_phase), atol=1e-6)


def test_command_law():
    f = joystick.phase_frequency_from_command
    assert float(f(0.12, 0.0, 1.4)) == 1.0  # disabled
    assert float(f(0.05, 0.094, 1.4)) == 1.0  # below ref -> clamped to 1
    np.testing.assert_allclose(float(f(0.12, 0.094, 1.4)), 0.12 / 0.094,
                               rtol=1e-6)
    assert float(f(0.3, 0.094, 1.4)) == pytest.approx(1.4)  # capped
    np.testing.assert_allclose(float(f(-0.12, 0.094, 1.4)), 0.12 / 0.094,
                               rtol=1e-6)  # symmetric in |vx|


def test_conditioned_clock_advances_at_scaled_rate():
    env = joystick.Joystick(
        task="flat_terrain",
        config_overrides={"phase_frequency_vx_ref": 0.094,
                          "phase_frequency_max": 1.4},
    )
    state = jax.jit(env.reset)(jax.random.PRNGKey(1))
    # pin the command so the expected rate is known
    cmd = state.info["command"].at[0].set(0.12)
    state.info["command"] = cmd
    step = jax.jit(env.step)
    rate = min(max(0.12 / 0.094, 1.0), 1.4)
    c_prev = float(state.info["imitation_i"])
    period = env.PRM.nb_steps_in_period
    for _ in range(5):
        state = step(state, jnp.zeros(env.action_size))
        # command resampling only fires after step 500, so cmd is stable
        c = float(state.info["imitation_i"])
        np.testing.assert_allclose((c - c_prev) % period, rate, rtol=1e-5)
        c_prev = c


def test_randomized_episode_frequency():
    env = joystick.Joystick(
        task="flat_terrain",
        config_overrides={"phase_frequency_range": [0.8, 1.3]},
    )
    reset = jax.jit(env.reset)
    freqs = [float(reset(jax.random.PRNGKey(s)).info["imitation_freq"])
             for s in range(8)]
    assert all(0.8 <= f <= 1.3 for f in freqs)
    assert np.std(freqs) > 0.01  # actually randomized
    # the clock advances at the episode's factor
    state = reset(jax.random.PRNGKey(3))
    f = float(state.info["imitation_freq"])
    state = jax.jit(env.step)(state, jnp.zeros(env.action_size))
    np.testing.assert_allclose(float(state.info["imitation_i"]), f, rtol=1e-6)


def test_onnx_metadata_roundtrip(tmp_path):
    from open_duck_playground_tpu.export import onnx_model as om

    g = om.graph(
        "t",
        nodes=[om.node("Tanh", ["obs"], ["continuous_actions"], "n")],
        inputs=[om.value_info("obs", (1, 4))],
        outputs=[om.value_info("continuous_actions", (1, 4))],
        initializers=[],
    )
    data = om.model(g, metadata={"phase_frequency_vx_ref": "0.094",
                                 "phase_frequency_max": "1.4"})
    p = tmp_path / "m.onnx"
    p.write_bytes(data)
    parsed = om.load_model(str(p))
    assert parsed.metadata == {"phase_frequency_vx_ref": "0.094",
                               "phase_frequency_max": "1.4"}
    # absent metadata parses to an empty dict
    p2 = tmp_path / "m2.onnx"
    p2.write_bytes(om.model(g))
    assert om.load_model(str(p2)).metadata == {}
