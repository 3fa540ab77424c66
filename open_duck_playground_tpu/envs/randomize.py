"""Domain randomization (behavioral parity with reference common/randomize.py).

Returns a batched Model plus a vmap in_axes pytree, consumed by the
training wrapper (reference wrap_for_brax_training + randomization_fn).

Reference quirks preserved deliberately (see SURVEY.md quirks):
- FLOOR_GEOM_ID is hardcoded to 0, which in the compiled duck scenes is a
  *visual* robot mesh (the real floor geom is last) -- so the "floor
  friction" randomization is a no-op exactly as upstream;
- TORSO_BODY_ID=1 is the massless "base" body, so the *U(0.9,1.1) mass
  scaling has no effect there and only the +-0.1 kg additive term matters.
Set `use_names=True` for the fixed, name-based behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from open_duck_playground_tpu.ops.types import Model

FLOOR_GEOM_ID = 0
TORSO_BODY_ID = 1


def domain_randomize(model: Model, rng: jax.Array, use_names: bool = False):
    if use_names:
        floor_geom_id = model.geom("floor")
        torso_body_id = model.body("trunk_assembly")
    else:
        floor_geom_id = FLOOR_GEOM_ID
        torso_body_id = TORSO_BODY_ID

    # actuated dofs are the ones with frictionloss (backlash dofs have 0)
    dof_id = [i for i, fr in enumerate(model.dof_hasfrictionloss) if bool(fr)]
    jnt_id = [int(model.dof_jntid[i]) for i in dof_id]
    dof_addr = jnp.asarray(
        [int(a) for a in model.jnt_dofadr if int(a) in dof_id], jnp.int32
    )
    joint_addr = jnp.asarray(
        [int(model.jnt_qposadr[j]) for j in jnt_id], jnp.int32
    )

    @jax.vmap
    def rand_dynamics(rng):
        # floor friction U(0.5, 1.0)
        rng, key = jax.random.split(rng)
        geom_friction = model.geom_friction.at[floor_geom_id, 0].set(
            jax.random.uniform(key, minval=0.5, maxval=1.0)
        )

        # static friction scale *U(0.9, 1.1)
        rng, key = jax.random.split(rng)
        frictionloss = model.dof_frictionloss[dof_addr] * jax.random.uniform(
            key, shape=(model.nu,), minval=0.9, maxval=1.1
        )
        dof_frictionloss = model.dof_frictionloss.at[dof_addr].set(frictionloss)

        # armature scale *U(1.0, 1.05)
        rng, key = jax.random.split(rng)
        armature = model.dof_armature[dof_addr] * jax.random.uniform(
            key, shape=(model.nu,), minval=1.0, maxval=1.05
        )
        dof_armature = model.dof_armature.at[dof_addr].set(armature)

        # torso com jitter +-5 cm
        rng, key = jax.random.split(rng)
        dpos = jax.random.uniform(key, (3,), minval=-0.05, maxval=0.05)
        body_ipos = model.body_ipos.at[torso_body_id].set(
            model.body_ipos[torso_body_id] + dpos
        )

        # all link masses *U(0.9, 1.1)
        rng, key = jax.random.split(rng)
        dmass = jax.random.uniform(key, shape=(model.nbody,), minval=0.9, maxval=1.1)
        body_mass = model.body_mass.at[:].set(model.body_mass * dmass)

        # torso mass +U(-0.1, 0.1) kg
        rng, key = jax.random.split(rng)
        dm = jax.random.uniform(key, minval=-0.1, maxval=0.1)
        body_mass = body_mass.at[torso_body_id].set(body_mass[torso_body_id] + dm)

        # home-pose jitter +-0.03 rad on qpos0
        rng, key = jax.random.split(rng)
        qpos0 = model.qpos0.at[joint_addr].set(
            model.qpos0[joint_addr]
            + jax.random.uniform(key, shape=(model.nu,), minval=-0.03, maxval=0.03)
        )

        # servo kp scale *U(0.9, 1.1) (gain and bias stay consistent)
        rng, key = jax.random.split(rng)
        factor = jax.random.uniform(key, shape=(model.nu,), minval=0.9, maxval=1.1)
        kp = model.actuator_gainprm[:, 0]
        actuator_gainprm = model.actuator_gainprm.at[:, 0].set(kp * factor)
        actuator_biasprm = model.actuator_biasprm.at[:, 1].set(-kp * factor)

        return (
            geom_friction,
            body_ipos,
            dof_frictionloss,
            dof_armature,
            body_mass,
            qpos0,
            actuator_gainprm,
            actuator_biasprm,
        )

    (
        friction,
        body_ipos,
        frictionloss,
        armature,
        body_mass,
        qpos0,
        actuator_gainprm,
        actuator_biasprm,
    ) = rand_dynamics(rng)

    in_axes = jax.tree_util.tree_map(lambda x: None, model)
    in_axes = in_axes.tree_replace(
        {
            "geom_friction": 0,
            "body_ipos": 0,
            "dof_frictionloss": 0,
            "dof_armature": 0,
            "body_mass": 0,
            "qpos0": 0,
            "actuator_gainprm": 0,
            "actuator_biasprm": 0,
        }
    )

    model = model.tree_replace(
        {
            "geom_friction": friction,
            "body_ipos": body_ipos,
            "dof_frictionloss": frictionloss,
            "dof_armature": armature,
            "body_mass": body_mass,
            "qpos0": qpos0,
            "actuator_gainprm": actuator_gainprm,
            "actuator_biasprm": actuator_biasprm,
        }
    )

    return model, in_axes
