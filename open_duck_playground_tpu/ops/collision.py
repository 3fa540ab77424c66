"""Narrowphase collision: convex hull vs plane / heightfield / convex hull.

Static-shape contact generation for jit/vmap lockstep stepping: each
precompiled geom pair always yields 4 candidate contact points; candidates
that do not exist get a large positive distance (inactive in the solver).

The plane-convex manifold selection follows the approach MJX uses (deepest
point, then spread for maximal area) so behavior tracks the reference's
`mjx` contacts (reference relies on `geoms_colliding`, joystick.py:424-429).
Heightfield-convex is our own design: per-vertex height lookup on the
triangulated grid (MuJoCo splits each cell into two triangles), which is
accurate for the small duck feet relative to the 256x256 terrain grid.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

BIG: float = 1e10


def _manifold_points(
    poly: jax.Array, mask: jax.Array, normal: jax.Array,
    support: jax.Array | None = None,
) -> jax.Array:
    """Choose 4 points on `poly` (V, 3) with ~max area among masked points.

    When `support` (penetration depth per vertex) is given, the first point
    is the DEEPEST masked vertex — MuJoCo's plane-convex collider always
    contacts the deepest vertex first (observed empirically on mujoco 3.10:
    con[0] is the support vertex in every probe), and at Newton
    iterations=1 whether the deepest point carries a contact decides
    closed-loop stability.
    """
    dist_mask = jnp.where(mask, 0.0, -1e6)
    if support is not None:
        # deepest vertex overall: also the closest vertex when separated,
        # so candidate 0 doubles as the min-distance query point
        a_idx = jnp.argmax(support)
    else:
        a_idx = jnp.argmax(dist_mask)
    a = poly[a_idx]
    b_idx = jnp.argmax(((a - poly) ** 2).sum(-1) + dist_mask)
    b = poly[b_idx]
    ab = jnp.cross(normal, a - b)
    ap = a - poly
    c_idx = jnp.argmax(jnp.abs(ap @ ab) + dist_mask)
    c = poly[c_idx]
    ac = jnp.cross(normal, a - c)
    bc = jnp.cross(normal, b - c)
    bp = b - poly
    d_idx = jnp.argmax(jnp.abs(bp @ bc) + jnp.abs(ap @ ac) + dist_mask)
    return jnp.stack([a_idx, b_idx, c_idx, d_idx])


def _dedup(idx: jax.Array) -> jax.Array:
    """valid[k] = idx[k] not seen among idx[:k] (suppress duplicate rows)."""
    valid = [jnp.asarray(True)]
    for k in range(1, idx.shape[0]):
        seen = jnp.asarray(False)
        for j in range(k):
            seen = seen | (idx[k] == idx[j])
        valid.append(~seen)
    return jnp.stack(valid)


def _make_tangents(n: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Orthonormal tangent basis for normal n (mju_makeFrame-style)."""
    ref = jnp.where(jnp.abs(n[1]) < 0.9, jnp.array([0.0, 1.0, 0.0], n.dtype),
                    jnp.array([0.0, 0.0, 1.0], n.dtype))
    t1 = jnp.cross(ref, n)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
    t2 = jnp.cross(n, t1)
    return t1, t2


def plane_hull(
    plane_pos: jax.Array,
    plane_mat: jax.Array,
    hull_pos: jax.Array,
    hull_mat: jax.Array,
    verts: jax.Array,  # (V, 3) geom-frame hull vertices
):
    """Plane vs convex hull.

    Returns dist (4,), pos (4, 3), frame (3, 3) [rows normal,t1,t2],
    valid (4,). Normal points from the plane into the hull (up).
    """
    n = plane_mat[:, 2]
    w = hull_pos + verts @ hull_mat.T  # (V, 3) world
    support = (plane_pos - w) @ n  # depth below plane (positive = penetrating)
    # Candidate band: within 1mm of the deepest vertex (MJX plane_convex
    # semantics). Selecting among ALL penetrating vertices spreads the
    # manifold to shallow corners of a curved sole, which under-reports
    # depth at the support point and destabilizes the warmstarted
    # iterations=1 Newton solve (energy injection). MuJoCo 3.10 likewise
    # clusters its plane-mesh contacts tightly around the deepest vertex.
    mask = support > jnp.maximum(0.0, support.max() - 1e-3)
    idx = _manifold_points(w, mask, n, support)
    valid = _dedup(idx) & mask[idx]
    # first candidate always reports the true min distance (for queries)
    valid = valid.at[0].set(True)
    dist = -support[idx]
    pos = w[idx] - 0.5 * dist[:, None] * n[None, :]
    t1, t2 = _make_tangents(n)
    frame = jnp.stack([n, t1, t2])
    dist = jnp.where(valid, dist, BIG)
    return dist, pos, frame, valid


def hfield_height_normal(
    hdata: jax.Array,  # (nrow, ncol) in [0, 1]
    hsize: jax.Array,  # (4,) rx, ry, z_top, z_base
    xy: jax.Array,  # (..., 2) in hfield frame
):
    """Piecewise-linear surface height and normal at local xy.

    MuJoCo triangulates each grid cell into two triangles; row index maps to
    y, column index to x, data row 0 at -ry.
    """
    nrow, ncol = hdata.shape
    rx, ry, ztop = hsize[0], hsize[1], hsize[2]
    gx = (xy[..., 0] + rx) / (2 * rx) * (ncol - 1)
    gy = (xy[..., 1] + ry) / (2 * ry) * (nrow - 1)
    gx = jnp.clip(gx, 0.0, ncol - 1.001)
    gy = jnp.clip(gy, 0.0, nrow - 1.001)
    ix = jnp.floor(gx).astype(jnp.int32)
    iy = jnp.floor(gy).astype(jnp.int32)
    fx = gx - ix
    fy = gy - iy
    z00 = hdata[iy, ix] * ztop
    z10 = hdata[iy, ix + 1] * ztop
    z01 = hdata[iy + 1, ix] * ztop
    z11 = hdata[iy + 1, ix + 1] * ztop
    dx = 2 * rx / (ncol - 1)
    dy = 2 * ry / (nrow - 1)
    lower = fx + fy < 1.0
    # lower triangle (00, 10, 01): z = z00 + fx (z10-z00) + fy (z01-z00)
    z_lo = z00 + fx * (z10 - z00) + fy * (z01 - z00)
    gx_lo = (z10 - z00) / dx
    gy_lo = (z01 - z00) / dy
    # upper triangle (11, 10, 01): z = z11 + (1-fx)(z01-z11) + (1-fy)(z10-z11)
    z_hi = z11 + (1 - fx) * (z01 - z11) + (1 - fy) * (z10 - z11)
    gx_hi = (z11 - z01) / dx
    gy_hi = (z11 - z10) / dy
    z = jnp.where(lower, z_lo, z_hi)
    gxs = jnp.where(lower, gx_lo, gx_hi)
    gys = jnp.where(lower, gy_lo, gy_hi)
    nvec = jnp.stack([-gxs, -gys, jnp.ones_like(gxs)], axis=-1)
    nvec = nvec / jnp.linalg.norm(nvec, axis=-1, keepdims=True)
    return z, nvec


def hfield_hull(
    hf_pos: jax.Array,
    hf_mat: jax.Array,
    hdata: jax.Array,
    hsize: jax.Array,
    hull_pos: jax.Array,
    hull_mat: jax.Array,
    verts: jax.Array,
):
    """Heightfield vs convex hull: per-vertex surface test, 4-point manifold."""
    w = hull_pos + verts @ hull_mat.T  # world
    local = (w - hf_pos) @ hf_mat  # hfield frame
    z_surf, n_local = hfield_height_normal(hdata, hsize, local[..., :2])
    # signed distance along the surface normal (approx: vertical gap projected)
    gap = (local[..., 2] - z_surf) * n_local[..., 2]
    support = -gap
    # candidate band near the deepest vertex (see plane_hull)
    mask = support > jnp.maximum(0.0, support.max() - 1e-3)
    idx = _manifold_points(w, mask, hf_mat[:, 2], support)
    valid = _dedup(idx) & mask[idx]
    valid = valid.at[0].set(True)
    dist = -support[idx]
    n_world = n_local[idx] @ hf_mat.T
    # single shared frame from deepest point's normal (static shape)
    n0 = n_world[0] / jnp.maximum(jnp.linalg.norm(n_world[0]), 1e-12)
    t1, t2 = _make_tangents(n0)
    frame = jnp.stack([n0, t1, t2])
    pos = w[idx] - 0.5 * dist[:, None] * n0[None, :]
    dist = jnp.where(valid, dist, BIG)
    return dist, pos, frame, valid


def hull_hull(
    pos1: jax.Array,
    mat1: jax.Array,
    verts1: jax.Array,
    face_n1: jax.Array,  # (F1, 3) geom-frame face normals
    face_d1: jax.Array,  # (F1,) plane offsets: n.x + d <= 0 inside
    pos2: jax.Array,
    mat2: jax.Array,
    verts2: jax.Array,
    face_n2: jax.Array,
    face_d2: jax.Array,
):
    """Convex-convex via face-normal SAT (approximate: no edge-edge axes).

    Adequate for the rarely-touching duck feet (reference includes this pair
    implicitly via contype/conaffinity on the foot geoms). Returns the same
    static 4-candidate layout as the other colliders.
    """
    w1 = pos1 + verts1 @ mat1.T
    w2 = pos2 + verts2 @ mat2.T
    n1w = face_n1 @ mat1.T  # world face normals of hull 1
    n2w = face_n2 @ mat2.T

    def sat_depth(axes):
        # separation along each axis: max over axes of (min2 - max1) etc.
        p1 = w1 @ axes.T  # (V1, A)
        p2 = w2 @ axes.T
        # overlap along +axis (1 -> 2 direction)
        sep = jnp.minimum(p2.max(0) - p1.min(0), p1.max(0) - p2.min(0))
        pen = p1.max(0) - p2.min(0)  # penetration if axis points 1 -> 2
        return sep, pen

    axes = jnp.concatenate([n1w, n2w], axis=0)
    p1 = w1 @ axes.T
    p2 = w2 @ axes.T
    # depth along axis a (pointing from 1 into 2): overlap = max1 - min2
    depth_f = p1.max(0) - p2.min(0)
    depth_b = p2.max(0) - p1.min(0)
    depth = jnp.minimum(depth_f, depth_b)
    best = jnp.argmin(depth)
    d = depth[best]
    axis = axes[best]
    axis = jnp.where(depth_f[best] <= depth_b[best], axis, -axis)  # 1 -> 2
    # contact points: vertices of hull2 deepest along -axis
    support2 = -(w2 @ axis)  # larger = deeper into hull 1
    thresh = support2.max() - 1e-4
    mask = (support2 >= thresh) & (d > 0)
    idx = _manifold_points(w2, mask, axis)
    valid = _dedup(idx) & mask[idx]
    valid = valid.at[0].set(True)
    dist = jnp.where(valid & (d > 0), -d, BIG)
    t1, t2 = _make_tangents(axis)
    frame = jnp.stack([axis, t1, t2])
    pos = w2[idx] + 0.5 * d * axis[None, :]
    return dist, pos, frame, valid
