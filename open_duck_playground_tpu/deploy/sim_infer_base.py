"""Sim-to-sim inference base: CPU stepping of our physics + numpy obs API.

Parity with reference mujoco_infer_base.py (MJInferBase): joint-topology
and sensor accessors over the simulation state, the `home` keyframe init,
sim_dt 0.002 with decimation 10, and foot-contact queries -- except the
engine underneath is this framework's own physics running on jax-CPU
instead of the MuJoCo C library.
"""

from __future__ import annotations

import numpy as np

from open_duck_playground_tpu.mjcf import compile_mjcf
from open_duck_playground_tpu.models.open_duck_mini_v2 import constants
from open_duck_playground_tpu.ops import forward as fwd
from open_duck_playground_tpu.ops.types import JointType


class SimInferBase:
    def __init__(self, model_path: str):
        import jax
        import jax.numpy as jnp

        self.sim_dt = 0.002
        self.decimation = 10

        self.model = compile_mjcf(model_path, timestep=self.sim_dt)
        m = self.model

        jnt_names = m.names.list("joint")
        self.joint_names = jnt_names
        self.actuator_names = m.names.list("actuator")
        free = [j for j in range(m.njnt) if int(m.jnt_type[j]) == JointType.FREE][0]
        self.floating_base_name = jnt_names[free]
        self.backlash_joint_names = [
            n for n in jnt_names
            if n not in self.actuator_names and n not in self.floating_base_name
        ]
        jq, jv = m.jnt_qposadr.np, m.jnt_dofadr.np
        act_ids = [m.joint(n) for n in self.actuator_names]
        self._act_qpos_addr = np.asarray([jq[i] for i in act_ids])
        self._act_qvel_addr = np.asarray([jv[i] for i in act_ids])
        self.num_dofs = m.nu

        kf = m.keyframe("home")
        self.default_actuator = np.asarray(kf.ctrl, np.float64)
        self.motor_targets = self.default_actuator.copy()
        self.prev_motor_targets = self.default_actuator.copy()

        self._sensor = {
            name: (int(m.sensor_adr[sid]), int(m.sensor_dim[sid]))
            for name, sid in m.names.sensor.items()
        }
        self._feet_pairs = [
            m.find_pair(m.geom(g), m.geom("floor")) for g in constants.FEET_GEOMS
        ]

        self._step_n = jax.jit(
            lambda d, ctrl: fwd.step_n(self.model, d, ctrl, self.decimation)
        )
        self.data = fwd.init(
            m,
            jnp.asarray(kf.qpos, jnp.float32),
            jnp.zeros(m.nv),
            jnp.asarray(kf.ctrl, jnp.float32),
        )

    # --- stepping ---------------------------------------------------------
    def step_control(self, motor_targets: np.ndarray) -> None:
        """Advance one control period (decimation physics substeps)."""
        import jax.numpy as jnp

        self.data = self._step_n(self.data, jnp.asarray(motor_targets, jnp.float32))

    # --- state accessors ----------------------------------------------------
    @property
    def qpos(self) -> np.ndarray:
        return np.asarray(self.data.qpos)

    @property
    def qvel(self) -> np.ndarray:
        return np.asarray(self.data.qvel)

    def get_actuator_joints_qpos(self, qpos) -> np.ndarray:
        return np.asarray(qpos)[self._act_qpos_addr]

    def get_actuator_joints_qvel(self, qvel) -> np.ndarray:
        return np.asarray(qvel)[self._act_qvel_addr]

    def get_sensor(self, data, name: str) -> np.ndarray:
        adr, dim = self._sensor[name]
        return np.asarray(data.sensordata)[adr : adr + dim]

    def get_gyro(self, data) -> np.ndarray:
        return self.get_sensor(data, constants.GYRO_SENSOR)

    def get_accelerometer(self, data) -> np.ndarray:
        return np.array(self.get_sensor(data, constants.ACCELEROMETER_SENSOR))

    def get_gravity(self, data) -> np.ndarray:
        return self.get_sensor(data, constants.GRAVITY_SENSOR)

    def get_linvel(self, data) -> np.ndarray:
        return self.get_sensor(data, constants.LOCAL_LINVEL_SENSOR)

    def get_feet_contacts(self, data) -> np.ndarray:
        dist = np.asarray(data.contact.dist)
        return np.array(
            [(dist[p * 4 : p * 4 + 4] < 0).any() for p in self._feet_pairs],
            dtype=np.float64,
        )
