"""Model and Data pytrees for the TPU-native physics pipeline.

``Model`` mirrors the *information content* of an MJX model for the MJCF
subset we support (reference consumes `mjx.put_model`, base.py:61), but the
layout is our own: traced physics parameters are jnp arrays (so domain
randomization can batch them with vmap, reference randomize.py:119-146),
while structural metadata is hashable static aux data that drives Python
loop unrolling at trace time.

``Data`` is the per-step dynamic state carried through `lax.scan`.
"""

from __future__ import annotations

import enum
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from open_duck_playground_tpu.utils.static import StaticArray


class JointType(enum.IntEnum):
    FREE = 0
    BALL = 1
    SLIDE = 2
    HINGE = 3


class GeomType(enum.IntEnum):
    PLANE = 0
    HFIELD = 1
    SPHERE = 2
    CAPSULE = 3
    BOX = 6
    MESH = 7


class SensorType(enum.IntEnum):
    GYRO = 0
    VELOCIMETER = 1
    ACCELEROMETER = 2
    FRAMEXAXIS = 3
    FRAMEZAXIS = 4
    FRAMELINVEL = 5
    FRAMEANGVEL = 6
    FRAMEPOS = 7
    FRAMEQUAT = 8


class PairType(enum.IntEnum):
    PLANE_HULL = 0
    HFIELD_HULL = 1
    HULL_HULL = 2


static = lambda: struct.field(pytree_node=False, default=None)  # noqa: E731


@struct.dataclass
class Option:
    gravity: jax.Array  # (3,)
    timestep: float = static()
    iterations: int = static()
    ls_iterations: int = static()
    impratio: float = static()


@struct.dataclass
class Model:
    # ----- option -----
    opt: Option

    # ----- sizes (static) -----
    nq: int = static()
    nv: int = static()
    nu: int = static()
    nbody: int = static()
    njnt: int = static()
    ngeom: int = static()
    nsite: int = static()
    nsensordata: int = static()
    npair: int = static()
    ncon: int = static()  # npair * max points per pair (4)

    # ----- bodies -----
    body_parentid: StaticArray = static()
    body_rootid: StaticArray = static()
    body_jntadr: StaticArray = static()
    body_jntnum: StaticArray = static()
    body_dofadr: StaticArray = static()
    body_dofnum: StaticArray = static()
    body_pos: jax.Array = None  # (nbody, 3)
    body_quat: jax.Array = None  # (nbody, 4)
    body_ipos: jax.Array = None  # (nbody, 3)
    body_iquat: jax.Array = None  # (nbody, 4)
    body_mass: jax.Array = None  # (nbody,)
    body_inertia: jax.Array = None  # (nbody, 3) principal moments
    body_invweight0: jax.Array = None  # (nbody, 2) [trans, rot]
    body_subtreemass: jax.Array = None  # (nbody,)

    # ----- joints -----
    jnt_type: StaticArray = static()
    jnt_qposadr: StaticArray = static()
    jnt_dofadr: StaticArray = static()
    jnt_bodyid: StaticArray = static()
    jnt_limited: StaticArray = static()
    jnt_pos: jax.Array = None  # (njnt, 3)
    jnt_axis: jax.Array = None  # (njnt, 3)
    jnt_range: jax.Array = None  # (njnt, 2)
    jnt_solref: jax.Array = None  # (njnt, 2)
    jnt_solimp: jax.Array = None  # (njnt, 5)
    jnt_margin: jax.Array = None  # (njnt,)

    # ----- dofs -----
    dof_bodyid: StaticArray = static()
    dof_jntid: StaticArray = static()
    dof_parentid: StaticArray = static()  # -1 for root dofs
    dof_hasfrictionloss: StaticArray = static()
    dof_armature: jax.Array = None  # (nv,)
    dof_damping: jax.Array = None  # (nv,)
    dof_frictionloss: jax.Array = None  # (nv,)
    dof_invweight0: jax.Array = None  # (nv,)
    dof_solref: jax.Array = None  # (nv, 2) for friction rows
    dof_solimp: jax.Array = None  # (nv, 5)

    # ----- geoms -----
    geom_type: StaticArray = static()
    geom_bodyid: StaticArray = static()
    geom_dataid: StaticArray = static()  # hull index for MESH, hfield index
    geom_contype: StaticArray = static()
    geom_conaffinity: StaticArray = static()
    geom_condim: StaticArray = static()
    geom_priority: StaticArray = static()
    geom_pos: jax.Array = None  # (ngeom, 3)
    geom_quat: jax.Array = None  # (ngeom, 4)
    geom_size: jax.Array = None  # (ngeom, 3)
    geom_friction: jax.Array = None  # (ngeom, 3)
    geom_solref: jax.Array = None  # (ngeom, 2)
    geom_solimp: jax.Array = None  # (ngeom, 5)
    geom_margin: jax.Array = None  # (ngeom,)
    geom_gap: jax.Array = None  # (ngeom,)

    # ----- sites -----
    site_bodyid: StaticArray = static()
    site_pos: jax.Array = None  # (nsite, 3)
    site_quat: jax.Array = None  # (nsite, 4)

    # ----- collision hulls (padded) -----
    hull_vert: jax.Array = None  # (nhull, HV, 3) geom-frame hull vertices
    hull_nvert: StaticArray = static()  # (nhull,) actual counts (pad repeats v0)
    hull_face_n: jax.Array = None  # (nhull, HF, 3) face normals (geom frame)
    hull_face_d: jax.Array = None  # (nhull, HF) face plane offsets
    hull_nface: StaticArray = static()  # (nhull,)

    # ----- heightfield -----
    hfield_data: Optional[jax.Array] = None  # (nrow, ncol) normalized [0,1]
    hfield_size: Optional[jax.Array] = None  # (4,) rx, ry, z_top, z_base
    hfield_nrow: int = static()
    hfield_ncol: int = static()

    # ----- actuators (position servos over joints) -----
    actuator_trnid: StaticArray = static()  # joint id per actuator
    actuator_gainprm: jax.Array = None  # (nu, 3) [kp, 0, 0]
    actuator_biasprm: jax.Array = None  # (nu, 3) [0, -kp, -kv]
    actuator_ctrlrange: jax.Array = None  # (nu, 2)
    actuator_forcerange: jax.Array = None  # (nu, 2)
    actuator_gear: jax.Array = None  # (nu,)

    # ----- sensors -----
    sensor_type: StaticArray = static()
    sensor_objid: StaticArray = static()  # site id
    sensor_adr: StaticArray = static()
    sensor_dim: StaticArray = static()

    # ----- static contact pairs -----
    pair_geom1: StaticArray = static()
    pair_geom2: StaticArray = static()
    pair_type: StaticArray = static()  # PairType
    pair_condim: StaticArray = static()

    # ----- reference configuration -----
    qpos0: jax.Array = None  # (nq,)

    # ----- names / keyframes (static metadata) -----
    names: Any = static()  # _Names (hashable)
    keyframes: Any = static()  # _Keyframes (hashable)

    # ------------------------------------------------------------------
    def tree_replace(self, updates: Dict[str, Any]) -> "Model":
        """Replace traced fields by name (mirrors mjx.Model.tree_replace)."""
        return self.replace(**updates)

    # --- name lookups (mirror mujoco name2id utilities) ---
    def body(self, name: str) -> int:
        return self.names.body[name]

    def joint(self, name: str) -> int:
        return self.names.joint[name]

    def geom(self, name: str) -> int:
        return self.names.geom[name]

    def site(self, name: str) -> int:
        return self.names.site[name]

    def actuator(self, name: str) -> int:
        return self.names.actuator[name]

    def sensor(self, name: str) -> int:
        return self.names.sensor[name]

    def keyframe(self, name: str):
        return self.keyframes[name]

    def find_pair(self, g1: int, g2: int) -> int:
        """Static contact-pair index for a geom pair (order-insensitive)."""
        for i in range(self.npair):
            a, b = int(self.pair_geom1[i]), int(self.pair_geom2[i])
            if (a, b) == (g1, g2) or (a, b) == (g2, g1):
                return i
        raise ValueError(f"no contact pair for geoms ({g1}, {g2})")


class _HashableDict(dict):
    def __hash__(self):
        return hash(tuple(sorted(self.keys())))


class Names:
    """Hashable name->id registry for all object classes."""

    def __init__(self, **kwargs: Dict[str, int]):
        self._d = {k: dict(v) for k, v in kwargs.items()}
        self._lists = {k: _ids_to_list(v) for k, v in self._d.items()}
        self._hash = hash(tuple((k, tuple(sorted(v.items()))) for k, v in sorted(self._d.items())))

    def __getattr__(self, k):
        try:
            return self._d[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def id2name(self, kind: str, i: int) -> str:
        return self._lists[kind][i]

    def list(self, kind: str) -> List[str]:
        return list(self._lists[kind])

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        return isinstance(other, Names) and self._d == other._d


def _ids_to_list(d: Dict[str, int]) -> List[str]:
    out = [""] * (max(d.values()) + 1 if d else 0)
    for k, v in d.items():
        out[v] = k
    return out


class Keyframes:
    """Hashable keyframe store: name -> (qpos, ctrl) numpy arrays."""

    def __init__(self, frames: Dict[str, Tuple]):
        self._frames = {
            k: (StaticArray(q), StaticArray(c)) for k, (q, c) in frames.items()
        }
        self._hash = hash(tuple(sorted((k, q, c) for k, (q, c) in self._frames.items())))

    def __getitem__(self, name: str):
        return _Keyframe(*self._frames[name])

    def __contains__(self, name):
        return name in self._frames

    def __hash__(self):
        return self._hash

    def __eq__(self, other):
        return isinstance(other, Keyframes) and self._frames == other._frames


class _Keyframe:
    def __init__(self, qpos: StaticArray, ctrl: StaticArray):
        self.qpos = qpos.np
        self.ctrl = ctrl.np


@struct.dataclass
class Contact:
    """Static-shape contact set: ncon = npair * 4 candidate points."""

    dist: jax.Array  # (ncon,) penetration depth (negative = penetrating)
    pos: jax.Array  # (ncon, 3) world midpoint
    frame: jax.Array  # (ncon, 3, 3) rows: normal, tangent1, tangent2
    friction: jax.Array  # (ncon, 3) combined friction
    solref: jax.Array  # (ncon, 2)
    solimp: jax.Array  # (ncon, 5)
    geom1: jax.Array  # (ncon,) int32 (static mapping, kept for parity APIs)
    geom2: jax.Array  # (ncon,)
    efc_valid: jax.Array  # (ncon,) bool: candidate exists (may still be dist>0)


@struct.dataclass
class Data:
    """Dynamic simulation state (one env; batch via vmap)."""

    # generalized state
    qpos: jax.Array  # (nq,)
    qvel: jax.Array  # (nv,)
    ctrl: jax.Array  # (nu,)
    qacc: jax.Array  # (nv,)
    qacc_warmstart: jax.Array  # (nv,) previous solve's qacc (Newton start)
    time: jax.Array  # ()

    # forward-kinematics products (from the most recent forward())
    xpos: jax.Array  # (nbody, 3)
    xquat: jax.Array  # (nbody, 4)
    xmat: jax.Array  # (nbody, 3, 3)
    xipos: jax.Array  # (nbody, 3)
    site_xpos: jax.Array  # (nsite, 3)
    site_xmat: jax.Array  # (nsite, 3, 3)
    subtree_com: jax.Array  # (nbody, 3)

    # dynamics products
    actuator_force: jax.Array  # (nu,)
    qfrc_actuator: jax.Array  # (nv,)
    qfrc_smooth: jax.Array  # (nv,)
    qfrc_constraint: jax.Array  # (nv,)
    cvel: jax.Array  # (nbody, 6) body spatial velocity @ root-com origin

    # sensors
    sensordata: jax.Array  # (nsensordata,)

    # contacts
    contact: Contact

    def replace_qpos(self, qpos: jax.Array) -> "Data":
        return self.replace(qpos=qpos)
