"""Pad-and-mask of the fused kernel's env batch (VERDICT r2 #10).

Batches that don't divide the BLOCK quantum (e.g. the brax-default 128
eval envs vs the 1024-env kernel block) must route through the fused
kernel via last-env padding, NOT silently fall back to the ~45-min-compile
XLA pipeline.

Default suite: the padding helper's values/shapes (cheap), plus the
dispatch-level guard living in test_multidevice.py's lowering test (a
24-env batch on a 2-device mesh lowers to a padded 32-env manual
computation that reaches the lane kernel). RUN_SLOW: bit-exact kernel
execution — the padded dispatch runs the same kernel on the same values
as a manually padded full block, so outputs must agree bit-for-bit on
the real envs (eager interpret mode, ~tens of minutes on this 1-core
CPU).
"""

import importlib
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

RUN_SLOW = pytest.mark.skipif(
    os.environ.get("RUN_SLOW", "0") != "1",
    reason="eager interpret-mode kernel evals; set RUN_SLOW=1",
)


def test_pad_env_axis_repeats_last_env():
    from open_duck_playground_tpu.ops import pallas_step as ps

    x = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    tree = {"a": x, "b": jnp.arange(3, dtype=jnp.float32)}
    out = ps._pad_env_axis(tree, 3, 8)
    assert out["a"].shape == (8, 4) and out["b"].shape == (8,)
    np.testing.assert_array_equal(np.asarray(out["a"][:3]), np.asarray(x))
    for i in range(3, 8):  # pad rows are copies of the LAST env
        np.testing.assert_array_equal(np.asarray(out["a"][i]), np.asarray(x[2]))
        assert float(out["b"][i]) == 2.0
    # no-op when already on the quantum
    same = ps._pad_env_axis(tree, 3, 3)
    assert same["a"] is x


@pytest.fixture()
def ps_small(flat_model):
    os.environ["DUCK_PALLAS_INTERPRET"] = "1"
    os.environ["DUCK_PALLAS_SUB"] = "2"
    os.environ["DUCK_PALLAS_LANE"] = "8"
    from open_duck_playground_tpu.ops import pallas_step

    importlib.reload(pallas_step)
    yield pallas_step
    os.environ.pop("DUCK_PALLAS_INTERPRET", None)
    os.environ.pop("DUCK_PALLAS_SUB", None)
    os.environ.pop("DUCK_PALLAS_LANE", None)
    importlib.reload(pallas_step)


def _batch(m, B):
    from open_duck_playground_tpu.ops import forward as fwd

    kf = m.keyframe("home")
    rng = np.random.RandomState(0)
    qpos = np.tile(np.asarray(kf.qpos, np.float32), (B, 1))
    qpos[:, 7:] += rng.uniform(-0.02, 0.02, (B, m.nq - 7)).astype(np.float32)
    qvel = rng.uniform(-0.01, 0.01, (B, m.nv)).astype(np.float32)
    ctrl = np.tile(np.asarray(kf.ctrl, np.float32), (B, 1))
    d0 = fwd.make_data(m)
    d = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (B,) + jnp.shape(x)), d0)
    return d.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
                     ctrl=jnp.asarray(ctrl)), jnp.asarray(ctrl)


@RUN_SLOW
def test_offblock_batch_pads_onto_fused_kernel(flat_model, ps_small):
    ps = ps_small
    m = flat_model
    B, BLOCK = 11, ps.BLOCK  # 11 envs -> padded to one 16-env block
    assert B % BLOCK != 0
    d, ctrl = _batch(m, B)

    # dispatch through the custom_vmap rule exactly as the env stack does
    step = ps.make_fused_step_n(1, concrete_model=m)
    out = jax.vmap(step, in_axes=(None, 0, 0))(m, d, ctrl)

    # ground truth: the same kernel on a manually last-env-padded block
    d16 = ps._pad_env_axis(d, B, BLOCK)
    ctrl16 = ps._pad_env_axis(ctrl, B, BLOCK)
    ref = ps.fused_step_n_batched(m, d16, ctrl16, 1)

    for name in ("qpos", "qvel", "sensordata", "actuator_force"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out, name)),
            np.asarray(getattr(ref, name))[:B], err_msg=name)
    np.testing.assert_array_equal(
        np.asarray(out.contact.dist), np.asarray(ref.contact.dist)[:B])


@RUN_SLOW
def test_offblock_init_pads_onto_fused_kernel(flat_model, ps_small):
    ps = ps_small
    m = flat_model
    B = 11
    d, ctrl = _batch(m, B)

    init = ps.make_fused_init(concrete_model=m)
    out = jax.vmap(init, in_axes=(None, 0, 0, 0))(m, d.qpos, d.qvel, ctrl)

    d16 = ps._pad_env_axis(d, B, ps.BLOCK)
    ctrl16 = ps._pad_env_axis(ctrl, B, ps.BLOCK)
    ref = ps.fused_step_n_batched(m, d16, ctrl16, 1)

    # init keeps the INPUT qpos/qvel and reports derived fields
    np.testing.assert_array_equal(np.asarray(out.qpos), np.asarray(d.qpos))
    np.testing.assert_array_equal(np.asarray(out.qvel), np.asarray(d.qvel))
    for name in ("sensordata", "actuator_force"):
        np.testing.assert_array_equal(
            np.asarray(getattr(out, name)),
            np.asarray(getattr(ref, name))[:B], err_msg=name)
