"""ONNX export round-trip: JAX policy == exported graph via numpy interpreter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_duck_playground_tpu.export.export import export_onnx
from open_duck_playground_tpu.export.onnx_infer import NumpyOnnxSession, OnnxInfer
from open_duck_playground_tpu.train import networks as nets


def _make_params(obs_size=101, act_size=14, seed=0):
    obs_sizes = {"state": obs_size, "privileged_state": 212}
    network = nets.PPONetworks(obs_sizes, act_size)
    params = network.init(jax.random.PRNGKey(seed))
    normalizer = nets.rs_init(obs_sizes)
    # non-trivial normalizer stats
    key = jax.random.PRNGKey(seed + 1)
    batch = {
        "state": 2.0 + 3.0 * jax.random.normal(key, (64, obs_size)),
        "privileged_state": jnp.zeros((64, 212)),
    }
    normalizer = nets.rs_update(normalizer, batch)
    return network, (normalizer, params)


def test_onnx_roundtrip(tmp_path):
    obs_size, act_size = 101, 14
    network, full_params = _make_params(obs_size, act_size)
    path = str(tmp_path / "policy.onnx")
    export_onnx(full_params, act_size, None, obs_size, output_path=path)

    policy = network.make_policy_fn(deterministic=True)
    session = NumpyOnnxSession(path)

    rng = np.random.RandomState(0)
    for _ in range(5):
        obs = rng.randn(1, obs_size).astype(np.float32)
        jax_action = np.asarray(
            policy(full_params, {"state": jnp.asarray(obs[0]),
                                 "privileged_state": jnp.zeros(212)}, None)[0]
        )
        onnx_action = session.run(None, {"obs": obs})[0][0]
        np.testing.assert_allclose(onnx_action, jax_action, rtol=1e-4, atol=1e-5)


def test_onnx_infer_wrapper(tmp_path):
    obs_size, act_size = 46, 14
    network, full_params = _make_params(obs_size, act_size)
    path = str(tmp_path / "policy.onnx")
    export_onnx(full_params, act_size, None, obs_size, output_path=path)
    oi = OnnxInfer(path, awd=True)
    out = oi.infer(np.zeros(obs_size, np.float32))
    assert out.shape == (act_size,)
    assert np.isfinite(out).all()
    assert (np.abs(out) <= 1.0).all()  # tanh head


def test_model_proto_structure(tmp_path):
    """Exported file parses and exposes the reference graph contract."""
    _, full_params = _make_params(101, 14)
    path = str(tmp_path / "policy.onnx")
    export_onnx(full_params, 14, None, 101, output_path=path)
    from open_duck_playground_tpu.export.onnx_model import load_model

    m = load_model(path)
    assert m.inputs == ["obs"]
    assert m.outputs == ["continuous_actions"]
    ops = [n.op_type for n in m.nodes]
    assert ops.count("MatMul") == 4  # 3 hidden + 1 head
    assert ops.count("Sigmoid") == 3  # swish on hidden layers
    assert ops[-1] == "Tanh"


def test_onnx_checker_validates_and_rejects(tmp_path):
    """The independent wire-level checker accepts a fresh export and
    rejects targeted corruptions (wrong opset, broken SSA, bad shapes)."""
    import numpy as np

    from open_duck_playground_tpu.export import onnx_model as om
    from open_duck_playground_tpu.export.onnx_checker import (
        OnnxCheckError, check_model)

    def build(opset=11, hide_init=False, bad_matmul=False, out_name="continuous_actions"):
        w = np.ones((4, 3), np.float32) if not bad_matmul else np.ones((5, 3), np.float32)
        nodes = [
            om.node("MatMul", ["obs", "w"], ["mm"], "mm"),
            om.node("Tanh", ["mm"], [out_name], "head"),
        ]
        inits = [] if hide_init else [om.tensor("w", w)]
        g = om.graph(
            "g", nodes=nodes,
            inputs=[om.value_info("obs", (1, 4))],
            outputs=[om.value_info(out_name, (1, 3))],
            initializers=inits,
        )
        return om.model(g, opset=opset)

    info = check_model(build())
    assert info["obs_size"] == 4 and info["act_size"] == 3

    with pytest.raises(OnnxCheckError, match="opset"):
        check_model(build(opset=13))
    with pytest.raises(OnnxCheckError, match="SSA"):
        check_model(build(hide_init=True))
    with pytest.raises(OnnxCheckError, match="incompatible"):
        check_model(build(bad_matmul=True))
    with pytest.raises(OnnxCheckError, match="output"):
        check_model(build(out_name="wrong_name"))


def test_onnx_checker_on_real_export(tmp_path):
    """Every real export passes the structural spec check."""
    from open_duck_playground_tpu.export.export import export_onnx
    from open_duck_playground_tpu.export.onnx_checker import check_model
    from open_duck_playground_tpu.train import networks as nets

    obs_sizes = {"state": 12, "privileged_state": 20}
    network = nets.PPONetworks(obs_sizes, 5,
                               policy_hidden_layer_sizes=(8, 8))
    params = network.init(jax.random.PRNGKey(0))
    normalizer = nets.rs_init(obs_sizes)
    path = str(tmp_path / "m.onnx")
    export_onnx((normalizer, params), 5, output_path=path)
    info = check_model(path)
    assert info["obs_size"] == 12 and info["act_size"] == 5
