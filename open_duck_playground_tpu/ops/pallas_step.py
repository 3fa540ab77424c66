"""Fused Pallas TPU kernel: the whole n-substep physics step in one launch.

Wraps ops/lane_physics.LanePhysics in a `pl.pallas_call`: environments are
vector lanes — each program instance holds a (8, 128) tile per scalar
quantity (1024 envs) entirely in VMEM and runs all 10 substeps of a control
step with zero intermediate HBM traffic. The XLA pipeline (ops/forward.py)
compiles the same math into thousands of small HBM-bound kernels; this
kernel replaces them with one straight-line VPU program.

Integration: `make_fused_step_n(model, n_substeps)` returns a drop-in for
`fwd.step_n` wrapped in `jax.custom_batching.custom_vmap` — unbatched calls
(driver compile checks, single-env debugging) fall back to the XLA path,
while the vmapped call inside the training wrapper dispatches to the fused
kernel. All duck scene types are handled, including heightfields (the
hfield table rides into VMEM and gathers via the one-hot MXU path).

Multi-chip: a pallas_call has no GSPMD partitioning rule, so when an env
mesh is registered (parallel/mesh.py set_env_mesh — done by ppo.train on
>1 device) the call is wrapped in shard_map over that mesh: each chip runs
its own local 1024-env blocks and no cross-chip gathers are emitted.

Fidelity: validated against ops/forward.py by tests/test_lane.py (solver
inputs to ~1e-4; full substeps on settled states; standing trajectories) —
see the branch-sensitivity note there about iterations=1 Newton parity.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from open_duck_playground_tpu.ops import forward as fwd
from open_duck_playground_tpu.ops.lane_physics import DR_FIELDS, LanePhysics
from open_duck_playground_tpu.ops.types import Data, Model, PairType

# (8, 128) = one f32 VPU register per tile; overridable only for
# interpret-mode tests (real TPUs require the (8, 128) tiling).
SUB = int(os.environ.get("DUCK_PALLAS_SUB", "8"))
LANE = int(os.environ.get("DUCK_PALLAS_LANE", "128"))
BLOCK = SUB * LANE  # envs per program instance

# DR field shapes (per env), in fixed kernel-input order
_DR_SHAPES = {
    "geom_friction": ("ngeom", 3),
    "body_ipos": ("nbody", 3),
    "dof_frictionloss": ("nv",),
    "dof_armature": ("nv",),
    "body_mass": ("nbody",),
    "qpos0": ("nq",),
    "actuator_gainprm": ("nu", 3),
    "actuator_biasprm": ("nu", 3),
}


def _field_rows(m: Model, field: str) -> int:
    dims = _DR_SHAPES[field]
    n = 1
    for d in dims:
        n *= getattr(m, d) if isinstance(d, str) else d
    return n


def supports_model(m: Model) -> bool:
    """All duck scene types: plane, hull-hull, and heightfield pairs (the
    hfield table rides into VMEM and gathers via the one-hot MXU path)."""
    return True


def _to_lane_layout(x: jax.Array) -> jax.Array:
    """(B, n) -> (n, NB, SUB, LANE) with env index = nb*BLOCK + s*LANE + l."""
    B, n = x.shape
    return x.T.reshape(n, B // BLOCK, SUB, LANE)


def _from_lane_layout(x: jax.Array) -> jax.Array:
    """(n, NB, SUB, LANE) -> (B, n)."""
    n = x.shape[0]
    return x.reshape(n, -1).T


def _nest_dr(lane: LanePhysics, field: str, ref):
    """Rebuild the nested [i][j] tile structure of a flattened DR field ref."""
    dims = _DR_SHAPES[field]
    if len(dims) == 1:
        n = _field_rows(lane.m, field)
        return [ref[i, 0] for i in range(n)]
    n0 = getattr(lane.m, dims[0])
    n1 = dims[1]
    return [[ref[i * n1 + j, 0] for j in range(n1)] for i in range(n0)]


@functools.lru_cache(maxsize=8)
def _build_kernel(lane_key, n_substeps: int, with_dr: bool):
    """Build the pallas kernel for a LanePhysics instance (cached)."""
    lane = _LANE_REGISTRY[lane_key]
    m = lane.m

    n_out = {
        "qpos": m.nq,
        "qvel": m.nv,
        "qacc_warmstart": m.nv,
        "sensordata": m.nsensordata,
        "actuator_force": m.nu,
        "contact_dist": m.ncon,
        "site_xpos": m.nsite * 3,
        "site_xmat": m.nsite * 9,
    }

    # heightfield scenes: the (nrow, ncol) table rides in as one extra VMEM
    # input (pallas kernels cannot capture array constants) and the in-kernel
    # gather uses the one-hot MXU path
    has_hf = lane.c.hfield_data is not None and any(
        int(t) == PairType.HFIELD_HULL for t in m.pair_type
    )

    def kernel(*refs):
        qpos_ref, qvel_ref, warm_ref, ctrl_ref = refs[0], refs[1], refs[2], refs[3]
        pos = 4
        if with_dr:
            dr_refs = refs[pos : pos + len(DR_FIELDS)]
            pos += len(DR_FIELDS)
            dr = {
                f: _nest_dr(lane, f, r) for f, r in zip(DR_FIELDS, dr_refs)
            }
        else:
            dr = None
        if has_hf:
            hf = refs[pos][:]
            pos += 1
            gather = "onehot"
        else:
            hf = None
            gather = "direct"
        out_refs = refs[pos:]

        qpos = [qpos_ref[i, 0] for i in range(m.nq)]
        qvel = [qvel_ref[i, 0] for i in range(m.nv)]
        warm = [warm_ref[i, 0] for i in range(m.nv)]
        ctrl = [ctrl_ref[i, 0] for i in range(m.nu)]

        # n-1 derived-free substeps under fori_loop (one trace), then the
        # final substep with derived outputs (mjx_env.step semantics)
        if n_substeps > 1:
            def body(_, carry):
                qp, qv, w = carry
                qp, qv, w, _ = lane.substep(qp, qv, ctrl, dr,
                                            want_derived=False,
                                            hf=hf, gather=gather, warm=w)
                return (qp, qv, w)

            qpos, qvel, warm = jax.lax.fori_loop(
                0, n_substeps - 1, body, (qpos, qvel, warm)
            )
        qpos, qvel, warm, derived = lane.substep(qpos, qvel, ctrl, dr,
                                                 want_derived=True,
                                                 hf=hf, gather=gather,
                                                 warm=warm)

        outs = {
            "qpos": qpos,
            "qvel": qvel,
            "qacc_warmstart": warm,
            "sensordata": derived["sensordata"],
            "actuator_force": derived["actuator_force"],
            "contact_dist": derived["contact_dist"],
            "site_xpos": derived["site_xpos"],
            "site_xmat": derived["site_xmat"],
        }
        for ref, name in zip(out_refs, n_out):
            rows = outs[name]
            for i in range(n_out[name]):
                ref[i, 0] = jnp.broadcast_to(rows[i], (SUB, LANE)).astype(
                    jnp.float32
                )

    def call(qpos_b, qvel_b, warm_b, ctrl_b,
             dr_flat: Optional[Dict[str, jax.Array]]):
        B = qpos_b.shape[0]
        assert B % BLOCK == 0, (B, BLOCK)
        nb = B // BLOCK

        def spec(rows):
            return pl.BlockSpec(
                (rows, 1, SUB, LANE),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            )

        inputs = [
            _to_lane_layout(qpos_b),
            _to_lane_layout(qvel_b),
            _to_lane_layout(warm_b),
            _to_lane_layout(ctrl_b),
        ]
        in_specs = [spec(m.nq), spec(m.nv), spec(m.nv), spec(m.nu)]
        if with_dr:
            for f in DR_FIELDS:
                x = dr_flat[f]
                inputs.append(_to_lane_layout(x))
                in_specs.append(spec(x.shape[1]))
        if has_hf:
            nrow, ncol = lane.c.hfield_data.shape
            # TRANSPOSED for the in-kernel gather's standard-form matmul
            # (see lane.hf_bilinear_gather mode "onehot")
            inputs.append(jnp.asarray(lane.c.hfield_data, jnp.float32).T)
            in_specs.append(
                pl.BlockSpec(
                    (ncol, nrow), lambda i: (0, 0), memory_space=pltpu.VMEM
                )
            )

        out_shapes = [
            jax.ShapeDtypeStruct((n, nb, SUB, LANE), jnp.float32)
            for n in n_out.values()
        ]
        out_specs = [spec(n) for n in n_out.values()]

        outs = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=bool(int(os.environ.get("DUCK_PALLAS_INTERPRET", "0"))),
        )(*inputs)
        return {k: _from_lane_layout(v) for k, v in zip(n_out, outs)}

    def call_sharded(qpos_b, qvel_b, warm_b, ctrl_b, dr_flat, mesh):
        """shard_map the kernel over the env mesh: each device runs its
        local B/n_dev envs (must divide BLOCK). Closed-over constants
        (hfield table) replicate automatically."""
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec

        spec = PartitionSpec(mesh.axis_names[0])
        if dr_flat is None:
            fn = shard_map(
                lambda qp, qv, w, c: call(qp, qv, w, c, None),
                mesh=mesh, in_specs=(spec, spec, spec, spec),
                out_specs=spec, check_rep=False,
            )
            return fn(qpos_b, qvel_b, warm_b, ctrl_b)
        fn = shard_map(
            call, mesh=mesh,
            in_specs=(spec, spec, spec, spec,
                      {k: spec for k in dr_flat}),
            out_specs=spec, check_rep=False,
        )
        return fn(qpos_b, qvel_b, warm_b, ctrl_b, dr_flat)

    call.sharded = call_sharded
    return call


def _active_mesh():
    """Env mesh to shard_map over, or None for the single-device path."""
    from open_duck_playground_tpu.parallel import mesh as mesh_mod

    mesh = mesh_mod.get_env_mesh()
    if mesh is None or mesh.devices.size <= 1:
        return None
    return mesh


def _mesh_size() -> int:
    mesh = _active_mesh()
    return 1 if mesh is None else int(mesh.devices.size)


# LRU-bounded: on the no-concrete_model path _unbatch_model creates a
# fresh Model per trace, so an unbounded id-keyed registry would leak a
# full model copy per retrace. Keys are GENERATION numbers, not id(m):
# after an eviction CPython can reuse the freed model's id for a new
# Model, and an id-based key would then hit _build_kernel's lru_cache
# with a stale kernel. While registered, lane.m keeps the model alive so
# its id cannot be reused; _LANE_BY_ID entries die with their registry
# entry. Capacity matches _build_kernel's lru_cache(maxsize=8).
_LANE_REGISTRY_CAP = 8
_LANE_REGISTRY: "Dict[int, LanePhysics]" = {}
_LANE_BY_ID: "Dict[int, int]" = {}  # id(model) -> generation key
_LANE_NEXT_GEN = [0]


def get_lane(m: Model) -> int:
    """Register a LanePhysics for a model; returns its generation key.

    Envs pass their long-lived concrete model (see make_fused_step_n's
    concrete_model contract), so in practice one entry per env; transient
    models from retraces rotate through the LRU bound.
    """
    mid = id(m)
    key = _LANE_BY_ID.get(mid)
    if key is not None:
        _LANE_REGISTRY[key] = _LANE_REGISTRY.pop(key)  # refresh LRU slot
        return key
    while len(_LANE_REGISTRY) >= _LANE_REGISTRY_CAP:
        evicted = next(iter(_LANE_REGISTRY))
        ev_lane = _LANE_REGISTRY.pop(evicted)
        _LANE_BY_ID.pop(id(ev_lane.m), None)
    key = _LANE_NEXT_GEN[0]
    _LANE_NEXT_GEN[0] += 1
    _LANE_REGISTRY[key] = LanePhysics(m)
    _LANE_BY_ID[mid] = key
    return key


def fused_step_n_batched(
    m: Model,
    d: Data,
    ctrl: jax.Array,
    n_substeps: int,
    dr_flat: Optional[Dict[str, jax.Array]] = None,
) -> Data:
    """Batched fused step: d leaves have a leading env axis of size B.

    Returns a Data whose env-consumed fields (qpos, qvel, sensordata,
    actuator_force, site_xpos, site_xmat, contact.dist) are updated; other
    derived fields keep their previous (stale) values — nothing in the env
    stack reads them after a step (envs/base.py accessors).
    """
    key = get_lane(m)
    call = _build_kernel(key, n_substeps, dr_flat is not None)
    mesh = _active_mesh()
    if mesh is not None:
        out = call.sharded(d.qpos, d.qvel, d.qacc_warmstart, ctrl, dr_flat,
                           mesh)
    else:
        out = call(d.qpos, d.qvel, d.qacc_warmstart, ctrl, dr_flat)
    B = d.qpos.shape[0]
    nsite = m.nsite
    contact = d.contact.replace(dist=out["contact_dist"])
    return d.replace(
        qpos=out["qpos"],
        qvel=out["qvel"],
        qacc_warmstart=out["qacc_warmstart"],
        ctrl=jnp.broadcast_to(ctrl, d.ctrl.shape),
        sensordata=out["sensordata"],
        actuator_force=out["actuator_force"],
        site_xpos=out["site_xpos"].reshape(B, nsite, 3),
        site_xmat=out["site_xmat"].reshape(B, nsite, 3, 3),
        contact=contact,
        time=d.time + n_substeps * m.opt.timestep,
    )


def flatten_dr_fields(m_batched: Model) -> Dict[str, jax.Array]:
    """Extract the DR-batched model fields as flat (B, rows) arrays."""
    out = {}
    for f in DR_FIELDS:
        v = getattr(m_batched, f)
        out[f] = v.reshape(v.shape[0], -1)
    return out


def _block_quantum() -> int:
    """Env-batch granularity of the fused path: whole BLOCKs per device."""
    return BLOCK * _mesh_size()


def _pad_env_axis(tree, axis_size: int, target: int):
    """Pad every leaf's leading env axis from axis_size to target by
    repeating the last env (a valid physics state — zero-padding would
    inject degenerate quaternions into the kernel)."""
    if target == axis_size:
        return tree
    return jax.tree_util.tree_map(
        lambda x: jnp.concatenate(
            [x, jnp.broadcast_to(x[-1:], (target - axis_size,) + x.shape[1:])],
            axis=0,
        ),
        tree,
    )


def make_fused_step_n(n_substeps: int, concrete_model: Optional[Model] = None):
    """Drop-in for `lambda m, d, ctrl: fwd.step_n(m, d, ctrl, n)`:

    unbatched -> XLA pipeline; vmapped -> fused pallas kernel. Batches
    that don't divide the BLOCK x n_devices quantum are padded with copies
    of the last env and sliced back after the kernel (VERDICT r2 #10 —
    e.g. the brax-default 128 eval envs no longer silently fall back to
    the ~45-min-compile XLA pipeline).

    `concrete_model` is the env's un-traced Model: the lane pipeline bakes
    every structural field in as python constants at kernel-build time, so
    it must never see tracers. Under jit even a concrete DR-batched model's
    `field[0]` slice is a tracer, hence the explicit side channel (the DR
    tiles carry the real per-env values; structural fields are identical
    across envs). Without it, the fused path only works outside jit.
    """

    @jax.custom_batching.custom_vmap
    def step_n(m: Model, d: Data, ctrl: jax.Array) -> Data:
        return fwd.step_n(m, d, ctrl, n_substeps)

    @step_n.def_vmap
    def _rule(axis_size, in_batched, m, d, ctrl):
        m_b, d_b, ctrl_b = in_batched
        # which model leaves are batched?
        batched_fields = set()
        for name in DR_FIELDS:
            flag = getattr(m_b, name, None)
            if flag:
                batched_fields.add(name)
        other_batched = [
            f for f in _NON_DR_MODEL_FIELDS if getattr(m_b, f, None)
        ]

        m_plain = (
            concrete_model
            if concrete_model is not None
            else _unbatch_model(m, batched_fields)
        )
        ok = (
            not other_batched
            # partial DR batching falls back instead of asserting
            and batched_fields in (set(), set(DR_FIELDS))
            and not _has_tracers(m_plain)
            and supports_model(m_plain)
            and jax.tree_util.tree_all(
                jax.tree_util.tree_map(lambda x: bool(x), d_b)
            )
            and bool(ctrl_b)
        )
        if not ok:
            # generic fallback: plain vmap of the XLA path, with per-leaf
            # in_axes derived from the actual batching flags (an unbatched
            # d/ctrl leaf must map to in_axes=None, not 0)
            out = jax.vmap(
                lambda mm, dd, cc: fwd.step_n(mm, dd, cc, n_substeps),
                in_axes=(_model_axes(m_b), _flag_axes(d_b), _flag_axes(ctrl_b)),
                axis_size=axis_size,
            )(m, d, ctrl)
            return out, jax.tree_util.tree_map(lambda _: True, out)

        dr_flat = flatten_dr_fields(m) if batched_fields else None
        quantum = _block_quantum()
        target = -(-axis_size // quantum) * quantum
        d_in = _pad_env_axis(d, axis_size, target)
        ctrl_in = _pad_env_axis(ctrl, axis_size, target)
        dr_in = _pad_env_axis(dr_flat, axis_size, target)
        out = fused_step_n_batched(m_plain, d_in, ctrl_in, n_substeps, dr_in)
        if target != axis_size:
            out = jax.tree_util.tree_map(lambda x: x[:axis_size], out)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return step_n


def make_fused_init(concrete_model: Optional[Model] = None):
    """Drop-in for `lambda m, qpos, qvel, ctrl: fwd.init(m, qpos, qvel, ctrl)`:

    fills the derived fields (sensors, contacts, actuator force, site
    kinematics) of the GIVEN state without integrating — mjx_env.init
    semantics for env reset. Vmapped on a supported model it reuses the
    1-substep fused kernel and discards the integration (the kernel's
    derived outputs describe the pre-integration state, exactly forward());
    the XLA forward pipeline's TPU compile is ~45 min for the backlash
    scenes, the fused kernel ~90 s. See make_fused_step_n for the
    concrete_model contract.
    """

    @jax.custom_batching.custom_vmap
    def init_fn(m: Model, qpos, qvel, ctrl) -> Data:
        return fwd.init(m, qpos, qvel, ctrl)

    @init_fn.def_vmap
    def _rule(axis_size, in_batched, m, qpos, qvel, ctrl):
        m_b, qpos_b, qvel_b, ctrl_b = in_batched
        batched_fields = set()
        for name in DR_FIELDS:
            if getattr(m_b, name, None):
                batched_fields.add(name)
        other_batched = [
            f for f in _NON_DR_MODEL_FIELDS if getattr(m_b, f, None)
        ]
        m_plain = (
            concrete_model
            if concrete_model is not None
            else _unbatch_model(m, batched_fields)
        )
        ok = (
            not other_batched
            and batched_fields in (set(), set(DR_FIELDS))
            and not _has_tracers(m_plain)
            and supports_model(m_plain)
            and bool(qpos_b) and bool(qvel_b) and bool(ctrl_b)
        )
        if not ok:
            out = jax.vmap(
                lambda mm, qp, qv, cc: fwd.init(mm, qp, qv, cc),
                in_axes=(_model_axes(m_b), _flag_axes(qpos_b),
                         _flag_axes(qvel_b), _flag_axes(ctrl_b)),
                axis_size=axis_size,
            )(m, qpos, qvel, ctrl)
            return out, jax.tree_util.tree_map(lambda _: True, out)

        dr_flat = flatten_dr_fields(m) if batched_fields else None
        quantum = _block_quantum()
        target = -(-axis_size // quantum) * quantum
        qpos_in = _pad_env_axis(qpos, axis_size, target)
        qvel_in = _pad_env_axis(qvel, axis_size, target)
        ctrl_in = _pad_env_axis(ctrl, axis_size, target)
        dr_in = _pad_env_axis(dr_flat, axis_size, target)
        d0 = fwd.make_data(m_plain, qpos.dtype)
        d = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (target,) + jnp.shape(x)), d0
        )
        d = d.replace(qpos=qpos_in, qvel=qvel_in, ctrl=ctrl_in)
        out = fused_step_n_batched(m_plain, d, ctrl_in, 1, dr_in)
        if target != axis_size:
            out = jax.tree_util.tree_map(lambda x: x[:axis_size], out)
        # forward() semantics: derived fields of the INPUT state; undo the
        # kernel's semi-implicit Euler integration and time advance
        out = out.replace(qpos=qpos, qvel=qvel,
                          time=jnp.broadcast_to(d0.time, (axis_size,)))
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return init_fn


_NON_DR_MODEL_FIELDS = (
    "body_pos", "body_quat", "body_iquat", "body_inertia",
    "body_invweight0", "jnt_pos", "jnt_axis", "jnt_range",
    "dof_damping", "dof_invweight0", "geom_pos", "geom_quat",
    "site_pos", "site_quat", "actuator_ctrlrange",
    "actuator_forcerange", "actuator_gear", "hull_vert",
)


def _has_tracers(m: Model) -> bool:
    return any(
        isinstance(leaf, jax.core.Tracer) for leaf in jax.tree_util.tree_leaves(m)
    )


def _unbatch_model(m: Model, batched_fields) -> Model:
    """Replace batched DR fields with their env-0 slice (constants for the
    non-DR parts of the kernel; the DR tiles carry the real per-env values)."""
    if not batched_fields:
        return m
    return m.tree_replace({f: getattr(m, f)[0] for f in batched_fields})


def _model_axes(m_b: Model):
    return jax.tree_util.tree_map(lambda flag: 0 if flag else None, m_b)


def _flag_axes(flags):
    """in_axes pytree from custom_vmap in_batched flags (True -> 0)."""
    return jax.tree_util.tree_map(lambda flag: 0 if flag else None, flags)
