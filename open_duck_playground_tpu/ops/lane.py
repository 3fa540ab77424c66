"""Lane-layout math helpers for the fused Pallas physics kernel.

Inside the fused kernel (ops/pallas_step.py) every per-env scalar is an
(8, 128) f32 tile: one VPU register holding 1024 environments ("lanes").
Geometric objects are plain python lists of such tiles:

    vec3  = [x, y, z]
    quat  = [w, x, y, z]
    mat3  = [m00, m01, m02, m10, ..., m22]        (row major)
    vec6  = [wx, wy, wz, vx, vy, vz]              (spatial motion/force)
    sym6  = 21 entries, lower triangle row major:
            [(0,0),(1,0),(1,1),(2,0),(2,1),(2,2),(3,0)...(5,5)]

Every function below is pure elementwise math over tiles, so the whole
pipeline compiles to straight-line VPU code with no gathers, transposes, or
cross-lane traffic. Constants may be python floats (broadcast for free).

The same functions also run under plain XLA/numpy (tiles are just arrays),
which is how the golden tests validate them against ops/math3d.
"""

from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# vec3
# ---------------------------------------------------------------------------


def v3_add(a, b):
    return [a[0] + b[0], a[1] + b[1], a[2] + b[2]]


def v3_sub(a, b):
    return [a[0] - b[0], a[1] - b[1], a[2] - b[2]]


def v3_scale(a, s):
    return [a[0] * s, a[1] * s, a[2] * s]


def v3_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def v3_cross(a, b):
    return [
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ]


# ---------------------------------------------------------------------------
# quaternion (w, x, y, z); conventions of ops/math3d.py
# ---------------------------------------------------------------------------


def q_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return [
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ]


def q_rot(q, v):
    """Rotate vec3 v by quaternion q (local -> world)."""
    qw = q[0]
    qv = q[1:4]
    uv = v3_cross(qv, v)
    t = v3_add(v3_scale(uv, qw), v3_cross(qv, uv))
    return v3_add(v, v3_scale(t, 2.0))


def q_rot_inv(q, v):
    return q_rot([q[0], -q[1], -q[2], -q[3]], v)


def q_normalize(q):
    n2 = q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3]
    inv = jnp.float32(1.0) / jnp.sqrt(n2)
    return [q[0] * inv, q[1] * inv, q[2] * inv, q[3] * inv]


def q_to_mat(q):
    """Quaternion -> mat3 (row major, columns = local axes in world)."""
    w, x, y, z = q
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    return [
        1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
        2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
        2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
    ]


def axis_angle_q(axis_const, angle):
    """Constant unit axis (python floats) + per-lane angle -> quat."""
    s = jnp.sin(angle * 0.5)
    c = jnp.cos(angle * 0.5)
    return [c, axis_const[0] * s, axis_const[1] * s, axis_const[2] * s]


def q_integrate(q, w_local, dt):
    """mju_quatIntegrate: q <- normalize(q * exp(w_local dt / 2))."""
    n2 = v3_dot(w_local, w_local)
    angle = jnp.sqrt(n2)
    safe = jnp.where(angle > 1e-12, angle, 1.0)
    half = angle * (dt * 0.5)
    s = jnp.sin(half) / safe
    dq = [jnp.cos(half), w_local[0] * s, w_local[1] * s, w_local[2] * s]
    return q_normalize(q_mul(q, dq))


# ---------------------------------------------------------------------------
# mat3 (row-major list of 9)
# ---------------------------------------------------------------------------


def m3_vec(m, v):
    """Matrix * vector."""
    return [
        m[0] * v[0] + m[1] * v[1] + m[2] * v[2],
        m[3] * v[0] + m[4] * v[1] + m[5] * v[2],
        m[6] * v[0] + m[7] * v[1] + m[8] * v[2],
    ]


def m3_t_vec(m, v):
    """Matrix^T * vector."""
    return [
        m[0] * v[0] + m[3] * v[1] + m[6] * v[2],
        m[1] * v[0] + m[4] * v[1] + m[7] * v[2],
        m[2] * v[0] + m[5] * v[1] + m[8] * v[2],
    ]


def m3_col(m, j):
    return [m[j], m[3 + j], m[6 + j]]


def m3_row(m, i):
    return [m[3 * i], m[3 * i + 1], m[3 * i + 2]]


# ---------------------------------------------------------------------------
# spatial 6-vectors (angular[3], linear[3])
# ---------------------------------------------------------------------------


def v6_add(a, b):
    return [a[i] + b[i] for i in range(6)]


def v6_scale(a, s):
    return [a[i] * s for i in range(6)]


def v6_dot(a, b):
    return sum(a[i] * b[i] for i in range(6))


def motion_cross(vel, m):
    """(w1,v1) x (w2,v2) = (w1 x w2, w1 x v2 + v1 x w2)."""
    w1, v1 = vel[:3], vel[3:]
    w2, v2 = m[:3], m[3:]
    return v3_cross(w1, w2) + v3_add(v3_cross(w1, v2), v3_cross(v1, w2))


def force_cross(vel, f):
    """(w,v) x* (n,f) = (w x n + v x f, w x f)."""
    w, v = vel[:3], vel[3:]
    n, fo = f[:3], f[3:]
    return v3_add(v3_cross(w, n), v3_cross(v, fo)) + v3_cross(w, fo)


# ---------------------------------------------------------------------------
# sym6: symmetric 6x6 as 21 lower-triangle entries (row major)
# ---------------------------------------------------------------------------

_SYM6_IDX = {}
for _i in range(6):
    for _j in range(_i + 1):
        _SYM6_IDX[(_i, _j)] = len(_SYM6_IDX)


def sym6_get(s, i, j):
    return s[_SYM6_IDX[(i, j)]] if i >= j else s[_SYM6_IDX[(j, i)]]


def sym6_add(a, b):
    return [a[k] + b[k] for k in range(21)]


def sym6_vec(s, v):
    """Symmetric 6x6 times 6-vector."""
    return [
        sum(sym6_get(s, i, j) * v[j] for j in range(6))
        for i in range(6)
    ]


def spatial_inertia_sym(mass, inertia_world_m3, c):
    """sym6 spatial inertia about origin O (see math3d.spatial_inertia).

    mass: tile (or float); inertia_world_m3: mat3 (list of 9, symmetric);
    c: vec3 from O to body com (world).

    [[I_c - m [c]x[c]x ,  m [c]x ],
     [    -m [c]x      ,  m 1_3  ]]
    Note the 6x6 is symmetric: (m [c]x)^T = -m [c]x = bottom-left.
    """
    cx, cy, cz = c
    # -[c]x[c]x = diag(cy^2+cz^2, cx^2+cz^2, cx^2+cy^2) - off diag terms
    xx = mass * (cy * cy + cz * cz)
    yy = mass * (cx * cx + cz * cz)
    zz = mass * (cx * cx + cy * cy)
    xy = -mass * (cx * cy)
    xz = -mass * (cx * cz)
    yz = -mass * (cy * cz)
    I = inertia_world_m3
    out = [None] * 21
    # top-left block (rows 0..2)
    out[_SYM6_IDX[(0, 0)]] = I[0] + xx
    out[_SYM6_IDX[(1, 0)]] = I[3] + xy
    out[_SYM6_IDX[(1, 1)]] = I[4] + yy
    out[_SYM6_IDX[(2, 0)]] = I[6] + xz
    out[_SYM6_IDX[(2, 1)]] = I[7] + yz
    out[_SYM6_IDX[(2, 2)]] = I[8] + zz
    # bottom-left block (rows 3..5, cols 0..2): m [c]x^T = -m [c]x
    # [c]x = [[0,-cz,cy],[cz,0,-cx],[-cy,cx,0]]; block(i,j) = (m [c]x)^T_{ij}
    # = m [c]x_{ji}
    zero = mass * 0.0
    mcx = mass * cx
    mcy = mass * cy
    mcz = mass * cz
    out[_SYM6_IDX[(3, 0)]] = zero
    out[_SYM6_IDX[(3, 1)]] = mcz
    out[_SYM6_IDX[(3, 2)]] = -mcy
    out[_SYM6_IDX[(4, 0)]] = -mcz
    out[_SYM6_IDX[(4, 1)]] = zero
    out[_SYM6_IDX[(4, 2)]] = mcx
    out[_SYM6_IDX[(5, 0)]] = mcy
    out[_SYM6_IDX[(5, 1)]] = -mcx
    out[_SYM6_IDX[(5, 2)]] = zero
    # bottom-right block: m I_3
    out[_SYM6_IDX[(3, 3)]] = mass * 1.0
    out[_SYM6_IDX[(4, 3)]] = zero
    out[_SYM6_IDX[(4, 4)]] = mass * 1.0
    out[_SYM6_IDX[(5, 3)]] = zero
    out[_SYM6_IDX[(5, 4)]] = zero
    out[_SYM6_IDX[(5, 5)]] = mass * 1.0
    return out


def rotate_inertia(diag_inertia, ximat):
    """R diag(I) R^T as mat3 (list of 9) from principal moments + rotation."""
    ix, iy, iz = diag_inertia
    R = ximat
    out = []
    for r in range(3):
        for c in range(3):
            out.append(
                R[3 * r + 0] * ix * R[3 * c + 0]
                + R[3 * r + 1] * iy * R[3 * c + 1]
                + R[3 * r + 2] * iz * R[3 * c + 2]
            )
    return out


# ---------------------------------------------------------------------------
# heightfield table gather
# ---------------------------------------------------------------------------
def hf_bilinear_gather(H, iy, ix, mode="direct"):
    """The 4 cell-corner heights H[iy,ix], H[iy,ix+1], H[iy+1,ix], H[iy+1,ix+1].

    mode "direct": H is the (nrow, ncol) table, gathered with advanced
    indexing — fine under XLA/CPU eager, unsupported by Mosaic.

    mode "onehot": H is the TRANSPOSED table (ncol, nrow) — gather-as-matmul
    for the TPU kernel. Mosaic cannot relayout a (SUB, LANE) index tile into
    the (N, 1) selector column the naive formulation wants ("unsupported
    shape cast"), so everything stays in native tile layout: per sublane row
    r, a one-hot row mask (nrow, LANE) is built by comparing a broadcast
    iota against iy[r:r+1, :]; the masks concatenate along lanes into
    (nrow, SUB*LANE) and ONE standard-form matmul per row offset
    HT @ M -> (ncol, SUB*LANE) lands the selected hfield rows on the MXU.
    Column selection is then an elementwise mask + sublane-axis reduction.
    1-D tiles (the eager lane twin) take the same path as a single row.
    """
    if mode == "direct":
        return H[iy, ix], H[iy, ix + 1], H[iy + 1, ix], H[iy + 1, ix + 1]

    if iy.ndim == 1:  # eager twin: (B,) tiles, no Mosaic layout constraints
        z = _hf_onehot_2d(H, iy[None, :], ix[None, :])
        return tuple(zc[0] for zc in z)
    return _hf_onehot_2d(H, iy, ix)


def hf_window_corners(H, iys, ixs, K, mode="direct"):
    """Bilinear corners for V vertices sharing a small spatial window.

    iys/ixs: length-V lists of integer lane tiles (same shape). Returns a
    length-V list of (z00, z10, z01, z11) tuples.

    mode "direct": per-vertex advanced indexing (eager CPU / XLA).

    mode "onehot": H is the TRANSPOSED table (ncol, nrow). All V vertices
    of a foot hull span at most a few hfield cells, so instead of 2 full
    one-hot matmuls PER VERTEX (hf_bilinear_gather — 2V*(ncol*nrow)
    MACs/lane), gather the K shared rows [base_iy, base_iy+K-1] with ONE
    matmul of width K*SUB*LANE, extract the K x K window per lane with
    K^2 column mask-reductions, and resolve every vertex's 4 corners from
    the window with cheap elementwise selects. For the duck foot (V=17,
    K=4) this is ~8.5x fewer MXU MACs and ~4x fewer VPU reductions per
    pair. The caller picks K >= ceil(hull_diag/cell) + 2 so the clamped
    window always covers every vertex's (iy, iy+1, ix, ix+1).
    """
    if mode == "direct":
        return [
            (H[iy, ix], H[iy, ix + 1], H[iy + 1, ix], H[iy + 1, ix + 1])
            for iy, ix in zip(iys, ixs)
        ]

    if iys[0].ndim == 1:  # eager twin: (B,) tiles
        out = _hf_window_2d(H, [iy[None, :] for iy in iys],
                            [ix[None, :] for ix in ixs], K)
        return [tuple(c[0] for c in corners) for corners in out]
    return _hf_window_2d(H, iys, ixs, K)


def _hf_window_2d(HT, iys, ixs, K):
    import jax

    ncol, nrow = HT.shape
    sub, lane_n = iys[0].shape
    base_iy = iys[0]
    base_ix = ixs[0]
    for v in range(1, len(iys)):
        base_iy = jnp.minimum(base_iy, iys[v])
        base_ix = jnp.minimum(base_ix, ixs[v])
    base_iy = jnp.clip(base_iy, 0, nrow - K)
    base_ix = jnp.clip(base_ix, 0, ncol - K)

    rows = jax.lax.broadcasted_iota(jnp.int32, (nrow, lane_n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ncol, lane_n), 0)
    # one wide standard-form matmul gathers all K window rows at once
    mparts = []  # k-major, sublane-minor (matches the slicing below)
    for k in range(K):
        for r in range(sub):
            mparts.append((rows == base_iy[r : r + 1, :] + k).astype(HT.dtype))
    M = jnp.concatenate(mparts, axis=1) if len(mparts) > 1 else mparts[0]
    B = jnp.dot(HT, M, preferred_element_type=jnp.float32)  # (ncol, K*S*L)

    # K x K window per lane: column mask-reductions
    patch = [[None] * K for _ in range(K)]  # [ky][kx] -> (sub, lane)
    for k in range(K):
        rparts = [[] for _ in range(K)]
        for r in range(sub):
            sl = slice((k * sub + r) * lane_n, (k * sub + r + 1) * lane_n)
            Bkr = B[:, sl]
            for j in range(K):
                cm = (cols == base_ix[r : r + 1, :] + j).astype(HT.dtype)
                rparts[j].append(jnp.sum(Bkr * cm, axis=0, keepdims=True))
        for j in range(K):
            patch[k][j] = (jnp.concatenate(rparts[j], axis=0)
                           if sub > 1 else rparts[j][0])

    # per-vertex corners from the window (clamp is a no-op when K covers
    # the hull span; it bounds the error to one cell in pathological poses)
    out = []
    for iy, ix in zip(iys, ixs):
        ky = jnp.clip(iy - base_iy, 0, K - 2)
        kx = jnp.clip(ix - base_ix, 0, K - 2)
        z00 = z10 = z01 = z11 = None
        for k in range(K):
            wy0 = (ky == k).astype(HT.dtype)
            wy1 = (ky + 1 == k).astype(HT.dtype)
            row0 = row1 = None
            for j in range(K):
                wx0 = (kx == j).astype(HT.dtype)
                wx1 = (kx + 1 == j).astype(HT.dtype)
                p = patch[k][j]
                row0 = p * wx0 if row0 is None else row0 + p * wx0
                row1 = p * wx1 if row1 is None else row1 + p * wx1
            z00 = row0 * wy0 if z00 is None else z00 + row0 * wy0
            z10 = row1 * wy0 if z10 is None else z10 + row1 * wy0
            z01 = row0 * wy1 if z01 is None else z01 + row0 * wy1
            z11 = row1 * wy1 if z11 is None else z11 + row1 * wy1
        out.append((z00, z10, z01, z11))
    return out


def _hf_onehot_2d(HT, iy, ix):
    import jax

    ncol, nrow = HT.shape
    sub, lane_n = iy.shape
    rows = jax.lax.broadcasted_iota(jnp.int32, (nrow, lane_n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (ncol, lane_n), 0)
    m0p, m1p, c0p, c1p = [], [], [], []
    for r in range(sub):
        iy_r = iy[r : r + 1, :]  # (1, LANE): broadcasts against the iotas
        ix_r = ix[r : r + 1, :]
        m0p.append((rows == iy_r).astype(HT.dtype))
        m1p.append((rows == iy_r + 1).astype(HT.dtype))
        c0p.append((cols == ix_r).astype(HT.dtype))
        c1p.append((cols == ix_r + 1).astype(HT.dtype))
    M0 = jnp.concatenate(m0p, axis=1) if sub > 1 else m0p[0]
    M1 = jnp.concatenate(m1p, axis=1) if sub > 1 else m1p[0]
    B0 = jnp.dot(HT, M0, preferred_element_type=jnp.float32)  # (ncol, S*L)
    B1 = jnp.dot(HT, M1, preferred_element_type=jnp.float32)
    z00, z10, z01, z11 = [], [], [], []
    for r in range(sub):
        sl = slice(r * lane_n, (r + 1) * lane_n)
        z00.append(jnp.sum(B0[:, sl] * c0p[r], axis=0, keepdims=True))
        z10.append(jnp.sum(B0[:, sl] * c1p[r], axis=0, keepdims=True))
        z01.append(jnp.sum(B1[:, sl] * c0p[r], axis=0, keepdims=True))
        z11.append(jnp.sum(B1[:, sl] * c1p[r], axis=0, keepdims=True))
    cat = (lambda xs: jnp.concatenate(xs, axis=0)) if sub > 1 else (
        lambda xs: xs[0])
    return cat(z00), cat(z10), cat(z01), cat(z11)
