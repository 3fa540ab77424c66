"""Domain randomization as a declarative perturbation recipe.

Behavioral parity target: reference ``common/randomize.py`` (the 8
randomized model fields, their exact distributions, and the RNG split
order — one ``jax.random.split`` per recipe entry, in sequence — are the
contract consumed by the training wrapper's randomization vmap).

Architecture (this framework's idiom, not the reference's): the
randomization is a *table*, ``_RECIPE`` — ordered ``(description,
sampler)`` entries where each sampler maps ``(key, model, ctx) -> {field:
new_array}``. A single generic fold threads the per-env key through the
table and a single ``jax.vmap`` batches it; adding a new randomized
quantity means appending one table row, nothing else. The table order IS
the RNG stream, so reordering entries changes sampled physics — tests in
``tests/test_randomize.py`` pin the current stream.

Reference quirks preserved deliberately (see SURVEY.md quirks):
- ``FLOOR_GEOM_ID`` is hardcoded to 0, which in the compiled duck scenes
  is a *visual* robot mesh (the real floor geom is last) — so the "floor
  friction" randomization is a no-op exactly as upstream;
- ``TORSO_BODY_ID=1`` is the massless "base" body, so the *U(0.9,1.1)
  mass scaling has no effect there and only the ±0.1 kg additive term
  matters.
Pass ``use_names=True`` for the fixed, name-based targeting.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from open_duck_playground_tpu.ops.types import Model

FLOOR_GEOM_ID = 0
TORSO_BODY_ID = 1

# Every field any recipe entry may touch; also the in_axes=0 set handed
# to the training wrapper's model-vmap.
RANDOMIZED_FIELDS = (
    "geom_friction",
    "body_ipos",
    "dof_frictionloss",
    "dof_armature",
    "body_mass",
    "qpos0",
    "actuator_gainprm",
    "actuator_biasprm",
)


class _Ctx(NamedTuple):
    """Static (trace-constant) addressing resolved once, pre-vmap."""

    floor_geom: int
    torso_body: int
    dof_addr: jax.Array    # leading dof address per actuated joint
    qpos_addr: jax.Array   # qpos address per actuated joint


def _make_ctx(model: Model, use_names: bool) -> _Ctx:
    if use_names:
        floor = model.geom("floor")
        torso = model.body("trunk_assembly")
    else:
        floor, torso = FLOOR_GEOM_ID, TORSO_BODY_ID
    # Actuated joints are discovered via frictionloss, exactly like the
    # reference (backlash dofs and the free joint carry frictionloss 0).
    first_dof = np.asarray(model.jnt_dofadr)
    has_fl = np.asarray(model.dof_hasfrictionloss, dtype=bool)[first_dof]
    return _Ctx(
        floor_geom=int(floor),
        torso_body=int(torso),
        dof_addr=jnp.asarray(first_dof[has_fl], jnp.int32),
        qpos_addr=jnp.asarray(np.asarray(model.jnt_qposadr)[has_fl], jnp.int32),
    )


Sampler = Callable[[jax.Array, Model, _Ctx], Dict[str, jax.Array]]


def _floor_friction(key, m, ctx):
    draw = jax.random.uniform(key, minval=0.5, maxval=1.0)
    return {"geom_friction": m.geom_friction.at[ctx.floor_geom, 0].set(draw)}


def _joint_frictionloss(key, m, ctx):
    scale = jax.random.uniform(key, (ctx.dof_addr.size,), minval=0.9, maxval=1.1)
    return {
        "dof_frictionloss": m.dof_frictionloss.at[ctx.dof_addr].set(
            m.dof_frictionloss[ctx.dof_addr] * scale
        )
    }


def _joint_armature(key, m, ctx):
    scale = jax.random.uniform(key, (ctx.dof_addr.size,), minval=1.0, maxval=1.05)
    return {
        "dof_armature": m.dof_armature.at[ctx.dof_addr].set(
            m.dof_armature[ctx.dof_addr] * scale
        )
    }


def _torso_com_jitter(key, m, ctx):
    offset = jax.random.uniform(key, (3,), minval=-0.05, maxval=0.05)
    return {
        "body_ipos": m.body_ipos.at[ctx.torso_body].set(
            m.body_ipos[ctx.torso_body] + offset
        )
    }


def _link_mass_scale(key, m, ctx):
    scale = jax.random.uniform(key, (m.nbody,), minval=0.9, maxval=1.1)
    return {"body_mass": m.body_mass * scale}


def _torso_mass_offset(key, m, ctx):
    # Reads the already-scaled masses: recipe entries compose in order.
    delta = jax.random.uniform(key, minval=-0.1, maxval=0.1)
    return {
        "body_mass": m.body_mass.at[ctx.torso_body].set(
            m.body_mass[ctx.torso_body] + delta
        )
    }


def _home_pose_jitter(key, m, ctx):
    jitter = jax.random.uniform(key, (ctx.qpos_addr.size,), minval=-0.03, maxval=0.03)
    return {
        "qpos0": m.qpos0.at[ctx.qpos_addr].set(m.qpos0[ctx.qpos_addr] + jitter)
    }


def _servo_kp_scale(key, m, ctx):
    # One draw drives gain AND bias so the position servo stays consistent.
    scale = jax.random.uniform(key, (m.nu,), minval=0.9, maxval=1.1)
    kp = m.actuator_gainprm[:, 0] * scale
    return {
        "actuator_gainprm": m.actuator_gainprm.at[:, 0].set(kp),
        "actuator_biasprm": m.actuator_biasprm.at[:, 1].set(-kp),
    }


# The randomization, as data. Order = the reference's RNG split order
# (common/randomize.py:42-95); do not reorder without updating the
# stream-pinning tests.
_RECIPE: tuple[tuple[str, Sampler], ...] = (
    ("floor friction U(0.5,1.0)", _floor_friction),
    ("joint frictionloss xU(0.9,1.1)", _joint_frictionloss),
    ("joint armature xU(1.0,1.05)", _joint_armature),
    ("torso CoM jitter +-5cm", _torso_com_jitter),
    ("link masses xU(0.9,1.1)", _link_mass_scale),
    ("torso mass +U(-0.1,0.1)kg", _torso_mass_offset),
    ("home pose jitter +-0.03rad", _home_pose_jitter),
    ("servo kp xU(0.9,1.1)", _servo_kp_scale),
)


def domain_randomize(model: Model, rng: jax.Array, use_names: bool = False):
    """Sample one physics variant per env.

    Args:
      model: the compiled scene model.
      rng: ``(num_envs, 2)`` PRNG keys, one per env.
      use_names: target the real floor/trunk instead of the reference's
        hardcoded (and off-target) ids.

    Returns:
      ``(batched_model, in_axes)`` — the model with every field in
      ``RANDOMIZED_FIELDS`` gaining a leading env axis, plus the matching
      vmap in_axes pytree (the ``wrap_for_brax_training`` contract).
    """
    ctx = _make_ctx(model, use_names)

    def sample_env(key: jax.Array) -> Dict[str, jax.Array]:
        view = model
        for _, sampler in _RECIPE:
            key, sub = jax.random.split(key)
            view = view.tree_replace(sampler(sub, view, ctx))
        return {f: getattr(view, f) for f in RANDOMIZED_FIELDS}

    updates = jax.vmap(sample_env)(rng)

    in_axes = jax.tree_util.tree_map(lambda _: None, model)
    in_axes = in_axes.tree_replace({f: 0 for f in RANDOMIZED_FIELDS})
    return model.tree_replace(updates), in_axes
