"""Deploy-side tests: numpy twins vs JAX, C++ runtime vs numpy interpreter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_duck_playground_tpu.deploy import custom_rewards_numpy as crn
from open_duck_playground_tpu.deploy import rewards_numpy as rn
from open_duck_playground_tpu.deploy.poly_reference_motion_numpy import (
    PolyReferenceMotion as NpPRM,
)
from open_duck_playground_tpu.envs import imitation
from open_duck_playground_tpu.envs import rewards as rj
from open_duck_playground_tpu.envs.reference_motion import PolyReferenceMotion as JaxPRM
from open_duck_playground_tpu.models.open_duck_mini_v2 import constants


def test_rewards_numpy_twin_matches_jax():
    rng = np.random.RandomState(0)
    cmd = rng.randn(7).astype(np.float32)
    vel = rng.randn(3).astype(np.float32)
    qpos = rng.randn(14).astype(np.float32)
    qvel = rng.randn(14).astype(np.float32)
    default = rng.randn(14).astype(np.float32)
    pairs = [
        (rn.reward_tracking_lin_vel(cmd, vel, 0.01),
         rj.reward_tracking_lin_vel(jnp.asarray(cmd), jnp.asarray(vel), 0.01)),
        (rn.reward_tracking_ang_vel(cmd, vel, 0.01),
         rj.reward_tracking_ang_vel(jnp.asarray(cmd), jnp.asarray(vel), 0.01)),
        (rn.cost_torques(qpos), rj.cost_torques(jnp.asarray(qpos))),
        (rn.cost_action_rate(qpos, qvel),
         rj.cost_action_rate(jnp.asarray(qpos), jnp.asarray(qvel))),
        (rn.cost_stand_still(cmd * 0.001, qpos, qvel, default),
         rj.cost_stand_still(jnp.asarray(cmd) * 0.001, jnp.asarray(qpos),
                             jnp.asarray(qvel), jnp.asarray(default))),
        (rn.cost_head_pos(qpos, qvel, cmd),
         rj.cost_head_pos(jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(cmd))),
        (rn.cost_orientation(vel), rj.cost_orientation(jnp.asarray(vel))),
    ]
    for np_val, jax_val in pairs:
        np.testing.assert_allclose(np.asarray(np_val), np.asarray(jax_val), rtol=1e-5, atol=1e-6)


def test_imitation_numpy_twin_matches_jax():
    rng = np.random.RandomState(1)
    base_qpos = rng.randn(7).astype(np.float32)
    base_qvel = rng.randn(6).astype(np.float32)
    joints_qpos = rng.randn(14).astype(np.float32)
    joints_qvel = rng.randn(14).astype(np.float32)
    contacts = np.array([1.0, 0.0], np.float32)
    ref = rng.randn(40).astype(np.float32)
    cmd = np.array([0.1, 0, 0, 0, 0, 0, 0], np.float32)
    a = crn.reward_imitation(base_qpos, base_qvel, joints_qpos, joints_qvel,
                             contacts, ref, cmd, True)
    b = imitation.reward_imitation(
        jnp.asarray(base_qpos), jnp.asarray(base_qvel), jnp.asarray(joints_qpos),
        jnp.asarray(joints_qvel), jnp.asarray(contacts), jnp.asarray(ref),
        jnp.asarray(cmd), True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_reference_motion_numpy_twin_matches_jax():
    path = constants.reference_motion_path()
    jprm = JaxPRM(path)
    nprm = NpPRM(path)
    assert jprm.nb_steps_in_period == nprm.nb_steps_in_period == 27
    for cmd in [(0.0, 0.0, 0.0), (0.1, -0.05, 0.3), (-0.2, 0.15, -1.5)]:
        for i in [0, 7, 26]:
            a = np.asarray(jprm.get_reference_motion(*[jnp.asarray(c) for c in cmd], i))
            b = nprm.get_reference_motion(*cmd, i)
            # f32 Horner on degree-15 polynomials loses ~0.5% near t -> 1
            # (the JAX training path is f32 in the reference too).
            np.testing.assert_allclose(a, b, rtol=1e-2, atol=5e-3)


def test_cpp_policy_runtime_matches_numpy(tmp_path):
    pytest.importorskip("ctypes")
    from open_duck_playground_tpu.deploy.policy_runtime import CppOnnxPolicy, build
    from open_duck_playground_tpu.export.export import export_onnx
    from open_duck_playground_tpu.export.onnx_infer import NumpyOnnxSession
    from open_duck_playground_tpu.train import networks as nets

    try:
        build()
    except Exception as e:
        pytest.skip(f"C++ toolchain unavailable: {e}")

    obs_size, act_size = 101, 14
    obs_sizes = {"state": obs_size, "privileged_state": 212}
    network = nets.PPONetworks(obs_sizes, act_size)
    params = network.init(jax.random.PRNGKey(0))
    normalizer = nets.rs_init(obs_sizes)
    path = str(tmp_path / "p.onnx")
    export_onnx((normalizer, params), act_size, None, obs_size, output_path=path)

    cpp = CppOnnxPolicy(path)
    assert cpp.obs_size == obs_size and cpp.act_size == act_size
    session = NumpyOnnxSession(path)
    rng = np.random.RandomState(2)
    for _ in range(3):
        obs = rng.randn(obs_size).astype(np.float32)
        a = cpp.infer(obs)
        b = session.run(None, {"obs": obs.reshape(1, -1)})[0][0]
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
