"""Domain-randomization unit tests: quirk path vs name-based path.

Covers both behaviors of envs/randomize.py (reference
common/randomize.py parity): the default path preserves the reference's
hardcoded FLOOR_GEOM_ID=0 / TORSO_BODY_ID=1 quirks (geom 0 is a visual
robot mesh, body 1 is massless), while `use_names=True` targets the real
floor geom and trunk body by name.
"""

import jax
import numpy as np
import pytest

from open_duck_playground_tpu.envs import randomize


N = 4


@pytest.fixture(scope="module")
def batched(flat_model):
    rng = jax.random.split(jax.random.PRNGKey(0), N)
    quirk, in_axes = randomize.domain_randomize(flat_model, rng)
    named, _ = randomize.domain_randomize(flat_model, rng, use_names=True)
    return flat_model, quirk, named, in_axes


def test_in_axes_marks_exactly_the_randomized_fields(batched):
    model, quirk, _, in_axes = batched
    batched_fields = {
        f for f in type(model).__dataclass_fields__
        if getattr(in_axes, f, None) == 0
        and hasattr(getattr(model, f), "shape")  # skip static int metadata
    }
    assert batched_fields == {
        "geom_friction", "body_ipos", "dof_frictionloss", "dof_armature",
        "body_mass", "qpos0", "actuator_gainprm", "actuator_biasprm",
    }
    for f in batched_fields:
        assert getattr(quirk, f).shape == (N,) + getattr(model, f).shape


def test_quirk_path_matches_reference_no_ops(batched):
    model, quirk, _, _ = batched
    floor = model.geom("floor")
    trunk = model.body("trunk_assembly")
    assert floor != randomize.FLOOR_GEOM_ID  # the quirk is real in this scene
    assert trunk != randomize.TORSO_BODY_ID

    gf = np.asarray(quirk.geom_friction)
    # geom 0 (visual mesh) got the "floor" friction draw; real floor untouched
    assert len(set(np.round(gf[:, 0, 0], 6))) == N
    np.testing.assert_array_equal(
        gf[:, floor], np.broadcast_to(model.geom_friction[floor], (N, 3))
    )
    # body 1 is massless: *U(0.9,1.1) scaling is a no-op, only +-0.1 kg adds
    assert float(model.body_mass[randomize.TORSO_BODY_ID]) == 0.0
    dm = np.asarray(quirk.body_mass)[:, randomize.TORSO_BODY_ID]
    assert np.all(np.abs(dm) <= 0.1) and len(set(np.round(dm, 6))) == N
    # the com jitter landed on body 1, not the trunk
    assert np.abs(np.asarray(quirk.body_ipos)[:, trunk]
                  - np.asarray(model.body_ipos)[trunk]).max() == 0.0


def test_named_path_randomizes_the_real_floor_and_trunk(batched):
    model, _, named, _ = batched
    floor = model.geom("floor")
    trunk = model.body("trunk_assembly")

    gf = np.asarray(named.geom_friction)[:, floor, 0]
    assert len(set(np.round(gf, 6))) == N
    assert np.all((gf >= 0.5) & (gf <= 1.0))
    # trunk com jittered within +-5 cm, distinct per env
    dpos = np.asarray(named.body_ipos)[:, trunk] - np.asarray(model.body_ipos)[trunk]
    assert np.all(np.abs(dpos) <= 0.05) and np.abs(dpos).max() > 0.0
    # trunk has real mass, so the multiplicative scale now matters
    m0 = float(model.body_mass[trunk])
    assert m0 > 0.0
    dm = np.asarray(named.body_mass)[:, trunk]
    assert np.all((dm >= 0.9 * m0 - 0.1) & (dm <= 1.1 * m0 + 0.1))


def test_shared_draws_between_paths(batched):
    """Fields untouched by the quirk difference use identical RNG streams."""
    _, quirk, named, _ = batched
    for f in ("dof_frictionloss", "dof_armature", "qpos0",
              "actuator_gainprm", "actuator_biasprm"):
        np.testing.assert_array_equal(
            np.asarray(getattr(quirk, f)), np.asarray(getattr(named, f))
        )
