"""Functional env base for the Open Duck Mini v2.

API parity with the reference's `OpenDuckMiniV2Env(mjx_env.MjxEnv)`
(reference base.py:41-291): joint-topology discovery by name (actuators vs
backlash vs floating base), qpos/qvel accessor tables, named sensor getters,
config-driven sim/ctrl timing.

TPU-first difference: the env object holds only static metadata; all
dynamics flow through pure functions of (Model, Data). `step_with_model`
exposes the model argument explicitly so the domain-randomization wrapper
can vmap a batched model through it (reference randomize.py:119-146).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from ml_collections import config_dict

from open_duck_playground_tpu.envs.types import Observation, State
from open_duck_playground_tpu.mjcf import compile_mjcf
from open_duck_playground_tpu.models.open_duck_mini_v2 import constants
from open_duck_playground_tpu.ops import forward as fwd
from open_duck_playground_tpu.ops.types import Data, JointType, Model


def geoms_colliding(model: Model, data: Data, geom1: int, geom2: int) -> jax.Array:
    """True if the static pair (geom1, geom2) has any penetrating contact."""
    p = model.find_pair(geom1, geom2)
    return (data.contact.dist[p * 4 : (p + 1) * 4] < 0).any()


class OpenDuckMiniV2Env:
    """Base class: model compilation + joint topology + sensors."""

    def __init__(
        self,
        xml_path: str,
        config: config_dict.ConfigDict,
        config_overrides: Optional[Dict[str, Union[str, int, list]]] = None,
    ) -> None:
        self._config = config.lock()
        if config_overrides:
            self._config.update_from_flattened_dict(config_overrides)

        self._model = compile_mjcf(xml_path, timestep=self._config.sim_dt)
        self._xml_path = xml_path
        self._physics_step_fn = None
        self._physics_init_fn = None
        m = self._model

        jnt_names = m.names.list("joint")
        self.floating_base_name = [
            jnt_names[j] for j in range(m.njnt) if int(m.jnt_type[j]) == JointType.FREE
        ][0]
        self.actuator_names = m.names.list("actuator")
        self.joint_names = jnt_names
        self.backlash_joint_names = [
            j
            for j in jnt_names
            if j not in self.actuator_names and j not in self.floating_base_name
        ]
        self.actuator_joint_ids = [m.joint(n) for n in self.actuator_names]
        self.backlash_joint_ids = [m.joint(n) for n in self.backlash_joint_names]

        jq = m.jnt_qposadr.np
        jv = m.jnt_dofadr.np
        self._actuator_qpos_addr = np.asarray(
            [jq[i] for i in self.actuator_joint_ids], np.int32
        )
        self._actuator_qvel_addr = np.asarray(
            [jv[i] for i in self.actuator_joint_ids], np.int32
        )
        self._backlash_qpos_addr = np.asarray(
            [jq[i] for i in self.backlash_joint_ids], np.int32
        )

        free_j = [j for j in range(m.njnt) if int(m.jnt_type[j]) == JointType.FREE][0]
        self._floating_base_qpos_addr = int(jq[free_j])
        self._floating_base_qvel_addr = int(jv[free_j])

        # actuator indices with no backlash twin (head joints): zeros get
        # inserted there when folding backlash into joint angles
        # (reference base.py:121-125).
        self.backlash_idx_to_add = [
            i
            for i, name in enumerate(self.actuator_names)
            if name + "_backlash" not in self.backlash_joint_names
        ]

        self._sensor_slices = {}
        for name, sid in m.names.sensor.items():
            adr, dim = int(m.sensor_adr[sid]), int(m.sensor_dim[sid])
            self._sensor_slices[name] = (adr, dim)

    # --- timing -----------------------------------------------------------
    @property
    def dt(self) -> float:
        return self._config.ctrl_dt

    @property
    def sim_dt(self) -> float:
        return self._config.sim_dt

    @property
    def n_substeps(self) -> int:
        return int(round(self._config.ctrl_dt / self._config.sim_dt))

    # --- physics dispatch ---------------------------------------------------
    def physics_step(self, model: Model, data: Data, ctrl: jax.Array) -> Data:
        """n_substeps of physics with ctrl held fixed.

        Dispatches to the fused Pallas kernel (ops/pallas_step.py) on TPU
        backends for every duck scene type (heightfield pairs use the
        kernel's one-hot MXU gather); on CPU the XLA pipeline. The fused
        path is a custom_vmap: unbatched calls always take the XLA path.
        On >1 device the kernel shard_maps over the env mesh registered by
        ppo.train (parallel/mesh.py). Override with DUCK_FUSED_STEP=0/1
        (default auto).
        """
        if self._physics_step_fn is None:
            if self._use_fused():
                from open_duck_playground_tpu.ops import pallas_step as _ps

                self._physics_step_fn = _ps.make_fused_step_n(
                    self.n_substeps, concrete_model=self._model
                )
            else:
                n = self.n_substeps
                self._physics_step_fn = lambda m, d, c: fwd.step_n(m, d, c, n)
        return self._physics_step_fn(model, data, ctrl)

    def _use_fused(self) -> bool:
        import os as _os

        mode = _os.environ.get("DUCK_FUSED_STEP", "auto")
        if mode in ("0", "1"):
            return mode == "1"
        from open_duck_playground_tpu.ops import pallas_step as _ps

        return (
            jax.default_backend() == "tpu"
            and _ps.supports_model(self._model)
        )

    def physics_init(
        self, model: Model, qpos: jax.Array, qvel: jax.Array, ctrl: jax.Array
    ) -> Data:
        """mjx_env.init semantics: set state, fill derived fields, no
        integration. Fused-kernel variant on the same terms as physics_step
        (the XLA forward's TPU compile is ~45 min for backlash scenes)."""
        if self._physics_init_fn is None:
            if self._use_fused():
                from open_duck_playground_tpu.ops import pallas_step as _ps

                self._physics_init_fn = _ps.make_fused_init(
                    concrete_model=self._model
                )
            else:
                self._physics_init_fn = fwd.init
        return self._physics_init_fn(model, qpos, qvel, ctrl)

    # --- model ------------------------------------------------------------
    @property
    def model(self) -> Model:
        return self._model

    # mjx-parity aliases
    @property
    def mjx_model(self) -> Model:
        return self._model

    @property
    def mj_model(self) -> Model:
        return self._model

    @property
    def xml_path(self) -> str:
        return self._xml_path

    @property
    def action_size(self) -> int:
        return self._model.nu

    @property
    def observation_size(self):
        state_shapes = jax.eval_shape(self.reset, jax.ShapeDtypeStruct((2,), jnp.uint32))
        return {k: v.shape for k, v in state_shapes.obs.items()}

    # --- qpos/qvel accessors (reference base.py:166-231) -------------------
    def get_floating_base_qpos(self, qpos: jax.Array) -> jax.Array:
        a = self._floating_base_qpos_addr
        return qpos[a : a + 7]

    def get_floating_base_qvel(self, qvel: jax.Array) -> jax.Array:
        a = self._floating_base_qvel_addr
        return qvel[a : a + 6]

    def set_floating_base_qpos(self, new_qpos: jax.Array, qpos: jax.Array) -> jax.Array:
        a = self._floating_base_qpos_addr
        return qpos.at[a : a + 7].set(new_qpos)

    def set_floating_base_qvel(self, new_qvel: jax.Array, qvel: jax.Array) -> jax.Array:
        a = self._floating_base_qvel_addr
        return qvel.at[a : a + 6].set(new_qvel)

    def get_actuator_joints_qpos(self, qpos: jax.Array) -> jax.Array:
        return qpos[self._actuator_qpos_addr]

    def set_actuator_joints_qpos(self, new_qpos: jax.Array, qpos: jax.Array) -> jax.Array:
        return qpos.at[self._actuator_qpos_addr].set(new_qpos)

    def get_actuator_joints_qvel(self, qvel: jax.Array) -> jax.Array:
        return qvel[self._actuator_qvel_addr]

    def set_actuator_joints_qvel(self, new_qvel: jax.Array, qvel: jax.Array) -> jax.Array:
        return qvel.at[self._actuator_qvel_addr].set(new_qvel)

    def get_actuator_backlash_qpos(self, qpos: jax.Array) -> jax.Array:
        if len(self._backlash_qpos_addr) == 0:
            return jnp.zeros((0,), qpos.dtype)
        return qpos[self._backlash_qpos_addr]

    # --- sensors (reference base.py:233-273) --------------------------------
    def get_sensor_data(self, data: Data, name: str) -> jax.Array:
        adr, dim = self._sensor_slices[name]
        return data.sensordata[adr : adr + dim]

    def get_gravity(self, data: Data) -> jax.Array:
        return self.get_sensor_data(data, constants.GRAVITY_SENSOR)

    def get_global_linvel(self, data: Data) -> jax.Array:
        return self.get_sensor_data(data, constants.GLOBAL_LINVEL_SENSOR)

    def get_global_angvel(self, data: Data) -> jax.Array:
        return self.get_sensor_data(data, constants.GLOBAL_ANGVEL_SENSOR)

    def get_local_linvel(self, data: Data) -> jax.Array:
        return self.get_sensor_data(data, constants.LOCAL_LINVEL_SENSOR)

    def get_accelerometer(self, data: Data) -> jax.Array:
        return self.get_sensor_data(data, constants.ACCELEROMETER_SENSOR)

    def get_gyro(self, data: Data) -> jax.Array:
        return self.get_sensor_data(data, constants.GYRO_SENSOR)

    def get_feet_pos(self, data: Data) -> jax.Array:
        return jnp.vstack(
            [self.get_sensor_data(data, n) for n in constants.FEET_POS_SENSOR]
        )

    # --- to be overridden ---------------------------------------------------
    def reset(self, rng: jax.Array) -> State:
        return self.reset_with_model(self._model, rng)

    def step(self, state: State, action: jax.Array) -> State:
        return self.step_with_model(self._model, state, action)

    def reset_with_model(self, model: Model, rng: jax.Array) -> State:
        raise NotImplementedError

    def step_with_model(self, model: Model, state: State, action: jax.Array) -> State:
        raise NotImplementedError
