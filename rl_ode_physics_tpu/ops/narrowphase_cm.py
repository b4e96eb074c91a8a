"""Component-major narrowphase: the typed-bucket pipeline with M in lanes.

Round-3 profiling (docs/BENCHMARKS.md, substep cost decomposition) put 67%
of the substep in lane-padded "machinery" — ~60 small ops whose minor
dimension is 3 or 11, which the TPU tiles to 128 lanes (a 11.6-42x padding
bandwidth tax under the world-vmap). The collide math itself is only 14%.

This module is the round-4 fix: the SAME typed-bucket narrowphase
(``ops/narrowphase.py:narrowphase_typed`` — reference behavior anchor:
``dCollide``, ``/root/reference/src/main.c:678``) with every per-pair
quantity kept component-major end to end:

* pair features ride as ``(11, P)`` — P (pairs) in lanes — gathered by the
  transposed one-hot dots ``(11, N)·(N, P)``;
* pair kernels are pure component-plane math: a 3-vector is a tuple of
  three ``(P,)`` arrays, so NO intermediate ever has a 3-minor (under the
  world vmap everything is ``(W, P)`` — full lanes);
* manifolds are emitted slot-major directly into the ``(10, M)``
  component-major payload ``ops/compaction.py:compact_rows_t`` already
  consumes — zero transposes between collide and compaction.

Numerics: identical formulas to ``ops/narrowphase.py`` (same branch-free
structure, same ODE constants); results agree to f32 roundoff — summation
order inside dot/norm reductions differs, so equality is allclose, not
bitwise (tests/test_narrowphase_cm.py). Contact ROW ORDER within a bucket
is slot-major here vs pair-major in the row-major path — the typed-bucket
path is the JACOBI throughput path where row order is not load-bearing
(order-independent parallel updates; the conformance path is the classic
``narrowphase``).

Not covered (``supports_cm`` returns False → ``narrowphase_typed`` falls
back to the row-major implementation): ``exact_box_clip`` (the
Sutherland-Hodgman scan is a sequential per-vertex loop — conformance
only) and manifold sizes that need a general deepest-k sort (the
throughput K=4 uses the deterministic fold-merge; K=8 keeps all slots).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import BodyType, WorldState

_EPS = 1e-9


# ---------------------------------------------------------------------------
# Component-plane helpers: a "vec" is a tuple (x, y, z) of same-shape arrays
# ---------------------------------------------------------------------------

def vadd(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def vsub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def vneg(a):
    return (-a[0], -a[1], -a[2])


def vscale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def vmul(a, b):
    """Elementwise (Hadamard) product of two vecs."""
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def vcross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def vnormsq(a):
    return vdot(a, a)


def vnorm(a):
    return jnp.sqrt(vnormsq(a))


def vwhere(c, a, b):
    return (jnp.where(c, a[0], b[0]),
            jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def quat_cols(qw, qx, qy, qz):
    """Rotation-matrix COLUMNS (world images of the body axes) from unit
    quaternion components — same matrix as ``utils.quat.to_matrix``
    (ODE ``dRfromQ``), kept as three component-plane vecs."""
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    c0 = (1.0 - 2.0 * (yy + zz), 2.0 * (xy + wz), 2.0 * (xz - wy))
    c1 = (2.0 * (xy - wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz + wx))
    c2 = (2.0 * (xz + wy), 2.0 * (yz - wx), 1.0 - 2.0 * (xx + yy))
    return c0, c1, c2


def rot_apply(cols, v):
    """R @ v (body → world): v0·c0 + v1·c1 + v2·c2."""
    c0, c1, c2 = cols
    return vadd(vadd(vscale(c0, v[0]), vscale(c1, v[1])), vscale(c2, v[2]))


def rot_apply_t(cols, v):
    """R.T @ v (world → body): (c0·v, c1·v, c2·v)."""
    c0, c1, c2 = cols
    return (vdot(c0, v), vdot(c1, v), vdot(c2, v))


# ---------------------------------------------------------------------------
# Pair kernels. Inputs: pa/pb vecs, qa/qb 4-tuples, sa/sb vecs of (P,)
# planes. Output: list of k slots, each (point vec, normal vec, depth,
# valid) — all (P,)-shaped planes. Formula-for-formula the same math as
# the row-major kernels in ops/narrowphase.py (cited per kernel).
# ---------------------------------------------------------------------------

def _up_vec(x):
    z = jnp.zeros_like(x)
    return (z, jnp.ones_like(x), z)


def cm_sphere_sphere(pa, qa, sa, pb, qb, sb):
    """ops/narrowphase.py:_sphere_sphere."""
    ra, rb = sa[0], sb[0]
    d = vsub(pb, pa)
    dist = vnorm(d)
    inv = 1.0 / jnp.maximum(dist, _EPS)
    n = vwhere(dist > _EPS, vscale(d, inv), _up_vec(dist))
    depth = ra + rb - dist
    point = vadd(pa, vscale(n, ra - 0.5 * depth))
    return [(point, n, depth, depth > 0.0)]


def _argmin3(f0, f1, f2):
    """First-minimum one-hot masks over three planes (jnp.argmin ties →
    lowest index, matched here with <=)."""
    is0 = (f0 <= f1) & (f0 <= f2)
    is1 = ~is0 & (f1 <= f2)
    is2 = ~is0 & ~is1
    return is0, is1, is2


def cm_sphere_box_core(center, radius, pb, cols_b, half):
    """ops/narrowphase.py:_sphere_box_core (point, normal a→b, depth)."""
    p_local = rot_apply_t(cols_b, vsub(center, pb))
    clamped = (jnp.clip(p_local[0], -half[0], half[0]),
               jnp.clip(p_local[1], -half[1], half[1]),
               jnp.clip(p_local[2], -half[2], half[2]))
    delta = vsub(p_local, clamped)
    dist = vnorm(delta)
    outside = dist > _EPS

    inv = 1.0 / jnp.maximum(dist, _EPS)
    n_local_out = vscale(delta, -inv)
    depth_out = radius - dist

    fd = (half[0] - jnp.abs(p_local[0]),
          half[1] - jnp.abs(p_local[1]),
          half[2] - jnp.abs(p_local[2]))
    is0, is1, is2 = _argmin3(*fd)
    f0 = jnp.asarray(is0, p_local[0].dtype)
    f1 = jnp.asarray(is1, p_local[0].dtype)
    f2 = jnp.asarray(is2, p_local[0].dtype)
    p_ax = p_local[0] * f0 + p_local[1] * f1 + p_local[2] * f2
    fd_ax = fd[0] * f0 + fd[1] * f1 + fd[2] * f2
    sign = jnp.where(p_ax >= 0.0, 1.0, -1.0)
    n_local_in = (f0 * sign, f1 * sign, f2 * sign)
    depth_in = radius + fd_ax

    n_local = vwhere(outside, n_local_out, n_local_in)
    depth = jnp.where(outside, depth_out, depth_in)
    surf_local = vwhere(outside, clamped,
                        vadd(p_local, vscale(n_local_in, fd_ax)))
    point = vadd(pb, rot_apply(cols_b, surf_local))
    n_world = rot_apply(cols_b, n_local)
    return point, n_world, depth


def cm_sphere_box(pa, qa, sa, pb, qb, sb):
    cols_b = quat_cols(*qb)
    half = vscale(sb, 0.5)
    point, n, depth = cm_sphere_box_core(pa, sa[0], pb, cols_b, half)
    return [(point, n, depth, depth > 0.0)]


def _plane_params(p, q):
    """World normal (local +Z = col2) and offset d (n·x = d)."""
    _, _, c2 = quat_cols(*q)
    return c2, vdot(c2, p)


def cm_sphere_plane(pa, qa, sa, pb, qb, sb):
    n_p, d_p = _plane_params(pb, qb)
    h = vdot(n_p, pa) - d_p
    depth = sa[0] - h
    point = vsub(pa, vscale(n_p, h))
    return [(point, vneg(n_p), depth, depth > 0.0)]


_BOX_SIGNS = [(sx, sy, sz) for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
              for sz in (-1.0, 1.0)]   # slot order matches _BOX_CORNERS


def cm_box_plane(pa, qa, sa, pb, qb, sb):
    """ops/narrowphase.py:_box_plane — 8 corner slots (fold to 4 happens
    in the packer when K=4, antipodal pairing [7, 6, 5, 4])."""
    n_p, d_p = _plane_params(pb, qb)
    cols_a = quat_cols(*qa)
    half = vscale(sa, 0.5)
    out = []
    for (sx, sy, sz) in _BOX_SIGNS:
        local = (half[0] * sx, half[1] * sy, half[2] * sz)
        corner = vadd(pa, rot_apply(cols_a, local))
        depth = d_p - vdot(corner, n_p)
        out.append((corner, vneg(n_p), depth, depth > 0.0))
    return out


def _segment_endpoints(p, q, length):
    _, _, axis = quat_cols(*q)
    h = 0.5 * length
    return vsub(p, vscale(axis, h)), vadd(p, vscale(axis, h)), axis


def _closest_on_segment(a0, a1, p):
    d = vsub(a1, a0)
    t = vdot(vsub(p, a0), d) / jnp.maximum(vdot(d, d), _EPS)
    return vadd(a0, vscale(d, jnp.clip(t, 0.0, 1.0)))


def _segment_segment(p0, p1, q0, q1):
    """ops/narrowphase.py:_segment_segment (branch-free closest points)."""
    d1 = vsub(p1, p0)
    d2 = vsub(q1, q0)
    r = vsub(p0, q0)
    a = vdot(d1, d1)
    e = vdot(d2, d2)
    f = vdot(d2, r)
    c = vdot(d1, r)
    b = vdot(d1, d2)
    denom = a * e - b * b
    s = jnp.where(denom > _EPS,
                  jnp.clip((b * f - c * e) / jnp.maximum(denom, _EPS),
                           0.0, 1.0), 0.0)
    t = (b * s + f) / jnp.maximum(e, _EPS)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_cl - c) / jnp.maximum(a, _EPS), 0.0, 1.0)
    return vadd(p0, vscale(d1, s)), vadd(q0, vscale(d2, t_cl))


def cm_sphere_capsule(pa, qa, sa, pb, qb, sb):
    b0, b1, _ = _segment_endpoints(pb, qb, sb[1])
    closest = _closest_on_segment(b0, b1, pa)
    return cm_sphere_sphere(pa, qa, sa, closest, qb, sb)


def cm_capsule_capsule(pa, qa, sa, pb, qb, sb):
    """ops/narrowphase.py:_capsule_capsule — closest point + a second
    contact for near-parallel side-by-side capsules."""
    a0, a1, ax_a = _segment_endpoints(pa, qa, sa[1])
    b0, b1, ax_b = _segment_endpoints(pb, qb, sb[1])
    ca, cb = _segment_segment(a0, a1, b0, b1)
    (slot0,) = cm_sphere_sphere(ca, qa, sa, cb, qb, sb)

    parallel = jnp.abs(vdot(ax_a, ax_b)) > 0.999
    far_a = vwhere(vnormsq(vsub(ca, a0)) > vnormsq(vsub(ca, a1)), a0, a1)
    cb2 = _closest_on_segment(b0, b1, far_a)
    ca2 = _closest_on_segment(a0, a1, cb2)
    p1, n1, d1, v1 = cm_sphere_sphere(ca2, qa, sa, cb2, qb, sb)[0]
    distinct = vnormsq(vsub(ca2, ca)) > 1e-8
    v1 = v1 & parallel & distinct
    return [slot0, (p1, n1, d1, v1)]


def cm_capsule_plane(pa, qa, sa, pb, qb, sb):
    n_p, d_p = _plane_params(pb, qb)
    a0, a1, _ = _segment_endpoints(pa, qa, sa[1])
    r = sa[0]
    out = []
    for e in (a0, a1):
        h = vdot(n_p, e) - d_p
        depth = r - h
        out.append((vsub(e, vscale(n_p, h)), vneg(n_p), depth, depth > 0.0))
    return out


def cm_capsule_box(pa, qa, sa, pb, qb, sb):
    """ops/narrowphase.py:_capsule_box — endpoint cap spheres + closest
    segment point, mid probe deduplicated by mask."""
    cols_b = quat_cols(*qb)
    half = vscale(sb, 0.5)
    r = sa[0]
    a0, a1, _ = _segment_endpoints(pa, qa, sa[1])
    mid = _closest_on_segment(a0, a1, pb)

    out = []
    for probe in (a0, a1, mid):
        point, n, depth = cm_sphere_box_core(probe, r, pb, cols_b, half)
        out.append([point, n, depth, depth > 0.0])
    dup = ((vnorm(vsub(mid, a0)) < 1e-6) | (vnorm(vsub(mid, a1)) < 1e-6))
    out[2][3] = out[2][3] & ~dup
    return [tuple(s) for s in out]


def cm_box_capsule(pa, qa, sa, pb, qb, sb):
    """BOX < CAPSULE canonical order: run capsule_box swapped, flip
    normals (ops/narrowphase.py:_flip)."""
    slots = cm_capsule_box(pb, qb, sb, pa, qa, sa)
    return [(p, vneg(n), d, v) for (p, n, d, v) in slots]


# --- box-box: SAT + branch-free reference-face candidates ------------------

def cm_box_box(pa, qa, sa, pb, qb, sb):
    """ops/narrowphase.py:_box_box (branch-free `_face_candidates` manifold;
    the exact Sutherland-Hodgman variant is conformance-only and stays on
    the row-major path). SAT over 15 axes, ODE's sequential first-max axis
    choice and 1.05 face-preference fudge (ODE dBoxBox structure)."""
    f = pa[0].dtype
    cols_a = quat_cols(*qa)
    cols_b = quat_cols(*qb)
    ha = vscale(sa, 0.5)
    hb = vscale(sb, 0.5)

    t_world = vsub(pb, pa)
    t = rot_apply_t(cols_a, t_world)            # B center in A frame
    # c[i][j] = A_i · B_j (B orientation in A frame)
    c = [[vdot(cols_a[i], cols_b[j]) for j in range(3)] for i in range(3)]
    absc = [[jnp.abs(c[i][j]) + 1e-6 for j in range(3)] for i in range(3)]

    sep_a = [jnp.abs(t[i]) - (ha[i] + absc[i][0] * hb[0]
                              + absc[i][1] * hb[1] + absc[i][2] * hb[2])
             for i in range(3)]
    t_b = [c[0][j] * t[0] + c[1][j] * t[1] + c[2][j] * t[2]
           for j in range(3)]
    sep_b = [jnp.abs(t_b[j]) - (hb[j] + absc[0][j] * ha[0]
                                + absc[1][j] * ha[1] + absc[2][j] * ha[2])
             for j in range(3)]

    # --- edge axes u = e_i × C_col_j (A frame), 9 static combos ----------
    def e_cross(i, col):
        if i == 0:
            return (jnp.zeros_like(col[0]), -col[2], col[1])
        if i == 1:
            return (col[2], jnp.zeros_like(col[0]), -col[0])
        return (-col[1], col[0], jnp.zeros_like(col[0]))

    neg_inf = jnp.asarray(-jnp.inf, f)
    fudge = 1.05

    max_all = None
    best_face_sep, best_face_code = None, None
    # edge tracking: adjusted sep (selection), raw sep (depth), unit axis,
    # one-hot masks of (i, j)
    be_adj = be_raw = None
    be_unit = None
    be_i = [None] * 3
    be_j = [None] * 3

    for j in range(3):
        col = (c[0][j], c[1][j], c[2][j])
        for i in range(3):
            u = e_cross(i, col)
            norm = vnorm(u)
            ok = norm > 1e-6
            inv = 1.0 / jnp.maximum(norm, _EPS)
            unit = vscale(u, inv)
            proj_a = (jnp.abs(unit[0]) * ha[0] + jnp.abs(unit[1]) * ha[1]
                      + jnp.abs(unit[2]) * ha[2])
            # |unit expressed in B| · hb
            proj_b = sum(
                jnp.abs(c[0][jj] * unit[0] + c[1][jj] * unit[1]
                        + c[2][jj] * unit[2]) * hb[jj]
                for jj in range(3))
            sep = jnp.abs(vdot(unit, t)) - (proj_a + proj_b)
            sep_m = jnp.where(ok, sep, neg_inf)
            max_all = sep_m if max_all is None else jnp.maximum(max_all, sep_m)
            adj = jnp.where(ok, sep * jnp.where(sep < 0, 1.0 / fudge, fudge),
                            neg_inf)
            if be_adj is None:
                be_adj, be_raw, be_unit = adj, sep, unit
                for k in range(3):
                    be_i[k] = jnp.full_like(adj, 1.0 if k == i else 0.0)
                    be_j[k] = jnp.full_like(adj, 1.0 if k == j else 0.0)
            else:
                take = adj > be_adj                  # strict >: first max
                be_adj = jnp.where(take, adj, be_adj)
                be_raw = jnp.where(take, sep, be_raw)
                be_unit = vwhere(take, unit, be_unit)
                for k in range(3):
                    be_i[k] = jnp.where(take, 1.0 if k == i else 0.0, be_i[k])
                    be_j[k] = jnp.where(take, 1.0 if k == j else 0.0, be_j[k])

    face_seps = sep_a + sep_b                        # codes 0..5
    for code, s in enumerate(face_seps):
        max_all = jnp.maximum(max_all, s)
        if code == 0:
            best_face_sep = s
            best_face_code = jnp.zeros_like(s, jnp.int32)
        else:
            take = s > best_face_sep                 # strict >: first max
            best_face_sep = jnp.where(take, s, best_face_sep)
            best_face_code = jnp.where(take, code, best_face_code)
    separated = max_all > 0.0
    use_edge = be_adj > best_face_sep

    # --------------------------- edge-edge case ---------------------------
    sign_e = jnp.where(vdot(be_unit, t) >= 0.0, 1.0, 0.0) * 2.0 - 1.0
    n_a = vscale(be_unit, sign_e)                    # A frame, a→b
    n_world_edge = rot_apply(cols_a, n_a)
    oh_ei = tuple(be_i)
    oh_ej = tuple(be_j)
    ha_ei = ha[0] * oh_ei[0] + ha[1] * oh_ei[1] + ha[2] * oh_ei[2]
    hb_ej = hb[0] * oh_ej[0] + hb[1] * oh_ej[1] + hb[2] * oh_ej[2]

    def sgn(v):
        return jnp.where(v >= 0.0, 1.0, -1.0)

    sgn_a = (sgn(n_a[0]) * (1.0 - oh_ei[0]),
             sgn(n_a[1]) * (1.0 - oh_ei[1]),
             sgn(n_a[2]) * (1.0 - oh_ei[2]))
    pa_sup = vadd(pa, rot_apply(cols_a, vmul(sgn_a, ha)))
    da = rot_apply(cols_a, oh_ei)
    a0 = vsub(pa_sup, vscale(da, ha_ei))
    a1 = vadd(pa_sup, vscale(da, ha_ei))

    # -C.T @ n_a (B frame, b→a)
    n_bf = tuple(-(c[0][j] * n_a[0] + c[1][j] * n_a[1] + c[2][j] * n_a[2])
                 for j in range(3))
    sgn_b = (sgn(n_bf[0]) * (1.0 - oh_ej[0]),
             sgn(n_bf[1]) * (1.0 - oh_ej[1]),
             sgn(n_bf[2]) * (1.0 - oh_ej[2]))
    pb_sup = vadd(pb, rot_apply(cols_b, vmul(sgn_b, hb)))
    db = rot_apply(cols_b, oh_ej)
    b0 = vsub(pb_sup, vscale(db, hb_ej))
    b1 = vadd(pb_sup, vscale(db, hb_ej))

    ca, cb = _segment_segment(a0, a1, b0, b1)
    edge_point = vscale(vadd(ca, cb), 0.5)
    edge_depth = -be_raw

    # --------------------------- face case --------------------------------
    face_is_a = best_face_code < 3
    # axis one-hots: ax_k = (code == k) | (code == k + 3)
    axf = [jnp.asarray((best_face_code == k) | (best_face_code == k + 3), f)
           for k in range(3)]

    ref_cols = tuple(vwhere(face_is_a, cols_a[k], cols_b[k])
                     for k in range(3))
    inc_cols = tuple(vwhere(face_is_a, cols_b[k], cols_a[k])
                     for k in range(3))
    p_ref = vwhere(face_is_a, pa, pb)
    p_inc = vwhere(face_is_a, pb, pa)
    h_ref = vwhere(face_is_a, ha, hb)
    h_inc = vwhere(face_is_a, hb, ha)

    def sel3(cols, m):
        return vadd(vadd(vscale(cols[0], m[0]), vscale(cols[1], m[1])),
                    vscale(cols[2], m[2]))

    n_ref_raw = sel3(ref_cols, axf)
    to_inc = vsub(p_inc, p_ref)
    sign_f = sgn(vdot(n_ref_raw, to_inc))
    n_ref = vscale(n_ref_raw, sign_f)
    n_world_face = vwhere(face_is_a, n_ref, vneg(n_ref))

    ax0 = axf[0] > 0.5
    ax2 = axf[2] > 0.5
    u0 = vwhere(ax0, ref_cols[1], ref_cols[0])       # idx0 = ax==0 ? 1 : 0
    u1 = vwhere(ax2, ref_cols[1], ref_cols[2])       # idx1 = ax==2 ? 1 : 2
    hu0 = jnp.where(ax0, h_ref[1], h_ref[0])
    hu1 = jnp.where(ax2, h_ref[1], h_ref[2])
    h_ax = h_ref[0] * axf[0] + h_ref[1] * axf[1] + h_ref[2] * axf[2]
    face_center = vadd(p_ref, vscale(n_ref, h_ax))

    # incident face: incident axis most anti-parallel to n_ref (first max
    # of |align|, matching jnp.argmax)
    align = [vdot(inc_cols[k], n_ref) for k in range(3)]
    best_al = jnp.abs(align[0])
    inc_m = [jnp.ones_like(best_al), jnp.zeros_like(best_al),
             jnp.zeros_like(best_al)]
    align_inc = align[0]
    for k in (1, 2):
        take = jnp.abs(align[k]) > best_al
        best_al = jnp.where(take, jnp.abs(align[k]), best_al)
        align_inc = jnp.where(take, align[k], align_inc)
        for kk in range(3):
            inc_m[kk] = jnp.where(take, 1.0 if kk == k else 0.0, inc_m[kk])
    inc_axis_vec = sel3(inc_cols, inc_m)
    h_inc_ax = h_inc[0] * inc_m[0] + h_inc[1] * inc_m[1] + h_inc[2] * inc_m[2]
    inc_sign = -jnp.sign(align_inc)
    inc_center = vadd(p_inc, vscale(inc_axis_vec, inc_sign * h_inc_ax))
    i0 = inc_m[0] > 0.5
    i2 = inc_m[2] > 0.5
    v0 = vscale(vwhere(i0, inc_cols[1], inc_cols[0]),
                jnp.where(i0, h_inc[1], h_inc[0]))
    v1 = vscale(vwhere(i2, inc_cols[1], inc_cols[2]),
                jnp.where(i2, h_inc[1], h_inc[2]))

    # incident quad corners, projected to reference-face plane coordinates
    quad2d = []
    for (s0, s1) in ((1.0, 1.0), (1.0, -1.0), (-1.0, -1.0), (-1.0, 1.0)):
        qc = vadd(inc_center, vadd(vscale(v0, s0), vscale(v1, s1)))
        rel = vsub(qc, face_center)
        quad2d.append((vdot(rel, u0), vdot(rel, u1)))

    # branch-free face candidates (ops/narrowphase.py:_face_candidates):
    # 4 clamped incident corners + 4 reference-rect corners (valid when
    # inside the incident quad)
    cand = []
    for (qx, qy) in quad2d:
        cand.append((jnp.clip(qx, -hu0, hu0), jnp.clip(qy, -hu1, hu1),
                     jnp.ones_like(qx, bool)))
    rect_signs = ((-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0))
    for (sx, sy) in rect_signs:
        rx, ry = sx * hu0, sy * hu1
        all_pos = None
        all_neg = None
        for e in range(4):
            x0, y0 = quad2d[e]
            x1, y1 = quad2d[(e + 1) % 4]
            cross = (x1 - x0) * (ry - y0) - (y1 - y0) * (rx - x0)
            pos_e = cross >= -1e-7
            neg_e = cross <= 1e-7
            all_pos = pos_e if all_pos is None else (all_pos & pos_e)
            all_neg = neg_e if all_neg is None else (all_neg & neg_e)
        cand.append((rx, ry, all_pos | all_neg))

    inc_n = vscale(inc_axis_vec, inc_sign)
    denom = vdot(inc_n, n_ref)
    safe_denom = jnp.where(jnp.abs(denom) > 1e-6, denom, 1.0)
    d_inc = vdot(inc_n, inc_center)

    slots = []
    for si, (cx, cy, cv) in enumerate(cand):
        base = vadd(face_center, vadd(vscale(u0, cx), vscale(u1, cy)))
        z = (d_inc - vdot(base, inc_n)) / safe_denom
        lifted = vadd(base, vscale(n_ref, z))
        depth_f = -z
        valid_f = cv & (depth_f > 0.0)
        point_f = vsub(lifted, vscale(n_ref, 0.5 * depth_f))
        if si == 0:
            point = vwhere(use_edge, edge_point, point_f)
            depth = jnp.where(use_edge, edge_depth, depth_f)
            valid = jnp.where(use_edge, edge_depth > 0.0, valid_f)
        else:
            point = point_f
            depth = jnp.where(use_edge, jnp.zeros_like(depth_f), depth_f)
            valid = jnp.where(use_edge, jnp.zeros_like(valid_f), valid_f)
        normal = vwhere(use_edge, n_world_edge, n_world_face)
        slots.append((point, normal, depth, valid & ~separated))
    return slots


# ---------------------------------------------------------------------------
# Kernel table + manifold folding
# ---------------------------------------------------------------------------

_CM_KERNELS = {
    (int(BodyType.SPHERE), int(BodyType.SPHERE)): cm_sphere_sphere,
    (int(BodyType.SPHERE), int(BodyType.BOX)): cm_sphere_box,
    (int(BodyType.SPHERE), int(BodyType.CAPSULE)): cm_sphere_capsule,
    (int(BodyType.SPHERE), int(BodyType.PLANE)): cm_sphere_plane,
    (int(BodyType.BOX), int(BodyType.BOX)): cm_box_box,
    (int(BodyType.BOX), int(BodyType.CAPSULE)): cm_box_capsule,
    (int(BodyType.BOX), int(BodyType.PLANE)): cm_box_plane,
    (int(BodyType.CAPSULE), int(BodyType.CAPSULE)): cm_capsule_capsule,
    (int(BodyType.CAPSULE), int(BodyType.PLANE)): cm_capsule_plane,
}

# 8-slot manifolds fold to 4 with these pairings (identical to the
# row-major _fold_manifold call sites)
_FOLD_PAIRING = {
    (int(BodyType.BOX), int(BodyType.BOX)): [4, 5, 6, 7],
    (int(BodyType.BOX), int(BodyType.PLANE)): [7, 6, 5, 4],
}


def _fold_slots(slots, pairing):
    """8 slots → 4 by keep-the-better merge (_fold_manifold semantics:
    prefer valid; among equal validity prefer deeper)."""
    out = []
    for lo in range(4):
        p_lo, n_lo, d_lo, v_lo = slots[lo]
        p_hi, n_hi, d_hi, v_hi = slots[pairing[lo]]
        take_hi = (v_hi & ~v_lo) | (v_hi & v_lo & (d_hi > d_lo))
        out.append((vwhere(take_hi, p_hi, p_lo),
                    vwhere(take_hi, n_hi, n_lo),
                    jnp.where(take_hi, d_hi, d_lo),
                    jnp.where(take_hi, v_hi, v_lo)))
    return out


def supports_cm(config: EngineConfig) -> bool:
    """True when every enabled typed bucket has a component-major kernel
    at its configured manifold size (else narrowphase_typed falls back to
    the row-major path)."""
    from rl_ode_physics_tpu.ops.narrowphase import _KERNEL_K, _enabled_kernels

    if config.exact_box_clip:
        return False          # sequential SH clip stays row-major
    k_glob = config.max_contacts_per_pair
    for pair in _enabled_kernels(config):
        intrinsic = _KERNEL_K[pair]
        k_b = min(intrinsic, k_glob)
        if k_b == intrinsic:
            continue
        if intrinsic == 8 and k_b == 4 and pair in _FOLD_PAIRING:
            continue
        return False          # general deepest-k needs the row-major top_k
    return True


# ---------------------------------------------------------------------------
# The component-major typed-bucket narrowphase
# ---------------------------------------------------------------------------

def _sap_pair_masks(state: WorldState, config: EngineConfig, exclude):
    """Windowed sweep-and-prune pair phase (``config.sap_window`` doc).

    The ``config.sap_broad`` bodies with the largest x-extent (arena
    floor/walls — they x-overlap everything, so no window covers them)
    are taken OUT of the sort and paired densely; every other body sorts
    by AABB x-min (broad/inactive/trimesh slots key to +inf, sort last,
    and never enter a window) and pairs only with the next W bodies in
    sorted order. The mask is (N + B, W + B):

      rows    0..N-1   sorted bodies (window rows)
      rows    N..N+B-1 broad bodies (live only in the broad-broad block)
      cols    0..W-1   window offsets: pair (sorted i, sorted i+1+w)
      cols    W..W+B-1 broad k: pair (sorted i, broad k); on broad row
                       N+l the same columns hold the l<k broad-broad block

    Everything is O(N·(W+B)) instead of O(N²) — at the reference's
    512-slot capacity with W=128, B=8 that is a ~3.8× cut of the
    pair-phase machinery (eligibility, bucket cumsums).

    Returns (feat_perm, hit, tmin, tmax, sap_overflow):
      feat_perm     (N+B,) mask row / feature column → slot id
                    (= concat(sorted perm, broad slots))
      hit/tmin/tmax (N+B, W+B) — the same tests as ``_pair_eligibility``
                    (AABB overlap, ODE category/collide OR-filter, active,
                    ≥1 movable, non-mesh, joint exclusion), one entry per
                    unordered pair
      sap_overflow  scalar int32 — x-overlapping pairs PAST the window
                    (conservative: counts pairs the other filters might
                    have dropped anyway; sorted by x-min, the x-overlaps
                    of row i are contiguous, so the count is a dense
                    (N, N) compare-sum — gather-free under the scan,
                    unlike the searchsorted it replaced)
    """
    from rl_ode_physics_tpu.ops.broadphase import compute_aabbs

    n = state.num_slots
    w_cap = int(config.sap_window)
    b_cap = int(config.sap_broad)
    aabb = compute_aabbs(state)
    lo, hi = aabb[..., 0, :], aabb[..., 1, :]
    eligible = state.active & (state.body_type != BodyType.TRIMESH)

    # broad selection: top-B x-extents among eligible bodies
    extent = jnp.where(eligible, hi[:, 0] - lo[:, 0], -jnp.inf)
    _, broad_idx = jax.lax.top_k(extent, b_cap)             # (B,) slot ids
    is_broad = jnp.zeros((n,), bool).at[broad_idx].set(True) & eligible

    sortable = eligible & ~is_broad
    keys = jnp.where(sortable, lo[:, 0], jnp.inf)
    perm = jnp.argsort(keys)                                # (N,) stable
    keys_s = keys[perm]
    feat_perm = jnp.concatenate([perm, broad_idx])          # (N+B,)

    lo_f, hi_f = lo[feat_perm], hi[feat_perm]               # (N+B, 3)
    cat_f, col_f = state.category[feat_perm], state.collide[feat_perm]
    movable_f = (state.inv_mass > 0)[feat_perm]
    t_f = state.body_type[feat_perm]
    act_f = jnp.concatenate([sortable[perm], eligible[broad_idx]])

    # ---- window block, GATHER-FREE (this is the lowering that made SAP
    # lose ~1.6x inside the chunked scan when written as an (N+B, W+B)
    # index-table gather — docs/BENCHMARKS.md): the window column j of
    # row i is the UNIFORM row shift j = i + 1 + w, so column w of every
    # banded feature table is one static slice [1+w : 1+w+N) of the sorted
    # feature matrix. W static slices + one stack per dtype stack replace
    # every 2-D gather; under lax.scan they lower to plain copies that
    # fuse into the compares. -----------------------------------------
    # float stack (N+W, 6): lo ‖ hi of the sorted rows, W dummy rows
    xf = jnp.pad(jnp.concatenate([lo_f[:n], hi_f[:n]], axis=1),
                 ((0, w_cap), (0, 0)))
    # int stack (N+W, 5): cat ‖ col ‖ type ‖ active ‖ movable (bitmasks
    # must NOT ride f32 — CollMask.ALL = 2^32-1 is not f32-exact)
    xi = jnp.pad(jnp.stack([
        cat_f[:n].astype(jnp.int32), col_f[:n].astype(jnp.int32),
        t_f[:n].astype(jnp.int32), act_f[:n].astype(jnp.int32),
        movable_f[:n].astype(jnp.int32)], axis=1), ((0, w_cap), (0, 0)))
    bf = jnp.stack([jax.lax.slice_in_dim(xf, 1 + w, 1 + w + n, axis=0)
                    for w in range(w_cap)], axis=1)          # (N, W, 6)
    bi = jnp.stack([jax.lax.slice_in_dim(xi, 1 + w, 1 + w + n, axis=0)
                    for w in range(w_cap)], axis=1)          # (N, W, 5)
    lo_jw, hi_jw = bf[..., 0:3], bf[..., 3:6]
    cat_jw, col_jw, t_jw = bi[..., 0], bi[..., 1], bi[..., 2]
    act_jw, mov_jw = bi[..., 3].astype(bool), bi[..., 4].astype(bool)

    i_n = jnp.arange(n)
    win_ok = (i_n[:, None] + 1 + jnp.arange(w_cap)[None, :]) < n  # (N, W)
    overlap_w = jnp.all((lo_f[:n, None, :] <= hi_jw)
                        & (lo_jw <= hi_f[:n, None, :]), axis=-1)
    cat_i = cat_f[:n].astype(jnp.int32)
    col_i = col_f[:n].astype(jnp.int32)
    mask_ok_w = (((cat_i[:, None] & col_jw) != 0)
                 | ((cat_jw & col_i[:, None]) != 0))
    hit_w = (overlap_w & mask_ok_w & win_ok
             & (act_f[:n, None] & act_jw)
             & (movable_f[:n, None] | mov_jw))
    t_n = t_f[:n].astype(jnp.int32)
    tmin_w = jnp.minimum(t_n[:, None], t_jw)
    tmax_w = jnp.maximum(t_n[:, None], t_jw)

    # ---- broad columns: j points at the B APPENDED features — a static
    # slice [n:), broadcast against every row ---------------------------
    i_idx = jnp.arange(n + b_cap)
    lo_b, hi_b = lo_f[n:], hi_f[n:]                          # (B, 3)
    # broad-broad block: live only on broad rows, upper-triangular l < k
    bb_ok = ((i_idx[:, None] >= n)
             & ((n + jnp.arange(b_cap))[None, :] > i_idx[:, None]))
    pair_ok_b = (i_idx[:, None] < n) | bb_ok                 # (N+B, B)
    overlap_b = jnp.all((lo_f[:, None, :] <= hi_b[None])
                        & (lo_b[None] <= hi_f[:, None, :]), axis=-1)
    mask_ok_b = (((cat_f[:, None] & col_f[None, n:]) != 0)
                 | ((cat_f[None, n:] & col_f[:, None]) != 0))
    hit_b = (overlap_b & mask_ok_b & pair_ok_b
             & (act_f[:, None] & act_f[None, n:])
             & (movable_f[:, None] | movable_f[None, n:]))
    t_i = t_f.astype(jnp.int32)
    tmin_b = jnp.minimum(t_i[:, None], t_i[None, n:])
    tmax_b = jnp.maximum(t_i[:, None], t_i[None, n:])

    if exclude is not None:
        ex_p = exclude[feat_perm][:, feat_perm]              # (N+B, N+B)
        # window exclusion band ex_p[i, i+1+w] via the pad/reshape skew
        # (row i of the reshape is row i of ex_p left-shifted by i):
        # gather-free like the feature bands above
        ex_s = ex_p[:n, :n]
        skew = jnp.concatenate(
            [ex_s.reshape(-1), jnp.zeros((n,), ex_s.dtype)]).reshape(
                n, n + 1)                                    # [i, j]=ex[i, i+j]
        hit_w = hit_w & ~skew[:, 1:1 + w_cap]
        hit_b = hit_b & ~ex_p[:, n:]

    pad_rows = ((0, b_cap), (0, 0))
    hit = jnp.concatenate(
        [jnp.pad(hit_w, pad_rows), hit_b], axis=1)           # (N+B, W+B)
    tmin = jnp.concatenate([jnp.pad(tmin_w, pad_rows), tmin_b], axis=1)
    tmax = jnp.concatenate([jnp.pad(tmax_w, pad_rows), tmax_b], axis=1)

    # loud window-miss accounting: js with x-min <= this row's x-max are
    # contiguous after the sort; anything past the window is a potentially
    # MISSED pair and must not be silent (same policy as contact caps).
    # Dense (N, N) compare-sum instead of searchsorted — same count,
    # no binary-search gathers under the scan.
    cnt = jnp.sum((keys_s[None, :] <= hi_f[:n, 0:1]), axis=1) - i_n - 1
    cnt = jnp.where(sortable[perm], cnt, 0)
    sap_overflow = jnp.sum(jnp.maximum(cnt - w_cap, 0)).astype(jnp.int32)
    return feat_perm, hit, tmin, tmax, sap_overflow


def narrowphase_typed_cm(state: WorldState, config: EngineConfig,
                         extra=None, exclude=None):
    """Component-major twin of ops/narrowphase.py:narrowphase_typed.

    Same closed-form bucket pair compaction (two broadcast compares on the
    (N, N) pair grid), same loud capacity accounting, same (10, M) payload
    into ``compact_rows_t``; differs ONLY in data layout (P in lanes
    everywhere) and in within-bucket row order (slot-major). Returns
    (Contacts, total_pairs) like the row-major function.
    """
    from rl_ode_physics_tpu.ops.compaction import compact_rows_t
    from rl_ode_physics_tpu.ops.narrowphase import (
        Contacts, _KERNEL_K, _enabled_kernels, _pair_eligibility)

    n = state.num_slots
    ccap = config.max_contacts
    k_glob = config.max_contacts_per_pair
    f = state.pos.dtype

    if n * n * k_glob >= 2 ** 24:
        raise ValueError(
            f"contact-key space {n * n * k_glob} (max_bodies={n}, "
            f"K={k_glob}) exceeds f32 exact-integer range 2^24; warm-start "
            f"keys packed through the f32 payload would silently collide. "
            f"Reduce max_bodies or max_contacts_per_pair.")

    sel_dt = jnp.dtype(config.selector_dtype)
    if sel_dt == jnp.bfloat16 and n > 256:
        raise ValueError(
            "selector_dtype='bfloat16' requires max_bodies <= 256 (body "
            "slot ids ride the selector matmuls and must be bf16-exact)")

    # component-major feature table (12, N): pos ‖ quat ‖ size ‖ type ‖
    # slot id. One tiny (N, 12) transpose per substep — everything
    # downstream of it keeps P in lanes. The slot-id row exists for the
    # SAP path, whose pair indices live in sorted space: the emission
    # reads the true slot ids back out of the feature gathers (exact in
    # bf16 selectors for the enforced n <= 256).
    cols = jnp.arange(n, dtype=jnp.int32)
    feats_t = jnp.concatenate([
        state.pos.T, state.quat.T, state.size.T,
        state.body_type.astype(f)[None, :],
        cols.astype(f)[None, :],
    ], axis=0).astype(sel_dt)                          # (12, N)

    w_sap = int(config.sap_window)
    if w_sap:
        # windowed sweep-and-prune: (N+B, W+B) pair structures in
        # sorted-row space (window rows ‖ broad rows); features permute
        # and extend to the SAME space so every downstream one-hot/dot
        # indexes it directly (config.sap_window doc)
        feat_perm, hit, tmin, tmax, sap_overflow = _sap_pair_masks(
            state, config, exclude)
        feats_t = feats_t[:, feat_perm]                # (12, N+B)
        r_rows = hit.shape[0]
        cols = jnp.arange(r_rows, dtype=jnp.int32)
    else:
        hit, tmin, tmax = _pair_eligibility(state, exclude)
        sap_overflow = jnp.zeros((), jnp.int32)
        r_rows = n

    # ---- closed-form bucket pair compaction (see the row-major twin for
    # the derivation; identical math — the column dimension is N slots in
    # the dense form, W window offsets under SAP) ------------------------
    kernels = list(_enabled_kernels(config).items())
    kernels = [(pair, _CM_KERNELS[pair]) for (pair, _) in kernels]
    caps = [config.bucket_capacity(t1, t2) for (t1, t2), _ in kernels]
    g = len(kernels)
    p_cap = max(caps)
    masks_l = [hit & (tmin == t1) & (tmax == t2) for (t1, t2), _ in kernels]
    # within-row cumsums, lane-major like the row-major path (an explicit
    # m.T + sublane cumsum materialized 0.33 ms/substep of copies @2048;
    # the in-row column search below contracts over within's ROW dim with
    # dot_general instead — the MXU loads either operand orientation free)
    within_l = [jnp.cumsum(m.astype(sel_dt), axis=1) for m in masks_l]
    rowcnt = jnp.stack([w[:, -1] for w in within_l]).astype(jnp.int32)  # (G, N)
    rowoff = jnp.cumsum(rowcnt, axis=1) - rowcnt             # exclusive
    total3 = jnp.sum(rowcnt, axis=1)                         # (G,)
    caps_a = jnp.asarray(caps, jnp.int32)

    c_loc = jnp.arange(p_cap, dtype=jnp.int32)               # (P,)
    bvalid3 = c_loc[None, :] < jnp.minimum(total3, caps_a)[:, None]
    endoff = rowoff + rowcnt                                 # (G, N)
    le3 = endoff[:, None, :] <= c_loc[None, :, None]         # (G, P, N)
    ia3 = jnp.sum(le3.astype(jnp.int32), axis=-1)            # (G, P)
    roff3 = jnp.sum(le3.astype(f) * rowcnt.astype(f)[:, None, :], axis=-1)
    r_resid3 = c_loc.astype(f)[None, :] - roff3              # in-row rank
    ia3 = jnp.minimum(ia3, r_rows - 1)

    # transposed one-hots (N, P): the feature dots are (11, N)·(N, P) and
    # the within-cumsum gather is (N, N)·(N, P) — all outputs P-in-lanes.
    # Materialized before the dots (optimization_barrier) for the same
    # reason as the row-major path: fusing the compare producer into a dot
    # operand lowers the dot to a VPU loop fusion.
    oh_a_l = [jax.lax.optimization_barrier(
        (cols[:, None] == ia3[gi][None, :]).astype(sel_dt))
        for gi in range(g)]                                   # G × (N, P)
    fa3 = [jnp.matmul(feats_t, oh_a_l[gi], preferred_element_type=f)
           for gi in range(g)]                                # G × (11, P)
    # within[ia3[p], j] as (N j, P): contract within's ROW dim (i) against
    # the (N i, P) one-hot — dot_general(((0,), (0,))), no transposes
    ib3 = [jnp.sum((jax.lax.dot_general(
                within_l[gi], oh_a_l[gi],
                (((0,), (0,)), ((), ())),
                preferred_element_type=sel_dt)
                    <= r_resid3[gi][None, :]).astype(jnp.int32), axis=0)
           for gi in range(g)]                                # G × (P,)
    ia3 = jnp.where(bvalid3, ia3, 0)
    if w_sap:
        # column index → feature index of body b: window columns walk the
        # sorted order (j = i + 1 + w, always a sorted row), broad columns
        # point at the B appended broad features
        ib3 = [jnp.where(
                   bvalid3[gi],
                   jnp.where(ib3[gi] < w_sap,
                             jnp.minimum(ia3[gi] + 1 + ib3[gi], n - 1),
                             n + (ib3[gi] - w_sap)), 0)
               for gi in range(g)]
    else:
        ib3 = [jnp.where(bvalid3[gi], jnp.minimum(ib3[gi], n - 1), 0)
               for gi in range(g)]
    oh_b_l = [jax.lax.optimization_barrier(
        (cols[:, None] == ib3[gi][None, :]).astype(sel_dt))
        for gi in range(g)]
    fb3 = [jnp.matmul(feats_t, oh_b_l[gi], preferred_element_type=f)
           for gi in range(g)]

    row_parts = [[] for _ in range(10)]   # px py pz nx ny nz depth a b slot
    valid_parts = []
    total_pairs = jnp.sum(jnp.minimum(total3, caps_a))
    pair_overflow = jnp.sum(jnp.maximum(total3 - caps_a, 0))
    for gi, ((t1, t2), kernel) in enumerate(kernels):
        cp_b = caps[gi]
        k_b = min(_KERNEL_K[(t1, t2)], k_glob)
        fa = fa3[gi][:, :cp_b]                       # (11, cp_b) lane slice
        fb = fb3[gi][:, :cp_b]
        ia = ia3[gi, :cp_b]
        ib = ib3[gi][:cp_b]
        bvalid = bvalid3[gi, :cp_b]

        pa_r = (fa[0], fa[1], fa[2])
        qa_r = (fa[3], fa[4], fa[5], fa[6])
        sa_r = (fa[7], fa[8], fa[9])
        pb_r = (fb[0], fb[1], fb[2])
        qb_r = (fb[3], fb[4], fb[5], fb[6])
        sb_r = (fb[7], fb[8], fb[9])
        if t1 != t2:
            # canonicalize: the kernel's A side is the LOWER type code
            # (collide_pair parity); fa is the lower-SLOT body, whose type
            # is per-pair dynamic. Normals flip back below so they always
            # point ia → ib.
            sw = fa[10] != jnp.asarray(float(t1), fa.dtype)
            pa_k = vwhere(sw, pb_r, pa_r)
            pb_k = vwhere(sw, pa_r, pb_r)
            qa_k = tuple(jnp.where(sw, b_, a_) for a_, b_ in zip(qa_r, qb_r))
            qb_k = tuple(jnp.where(sw, a_, b_) for a_, b_ in zip(qa_r, qb_r))
            sa_k = vwhere(sw, sb_r, sa_r)
            sb_k = vwhere(sw, sa_r, sb_r)
        else:
            sw = None
            pa_k, qa_k, sa_k = pa_r, qa_r, sa_r
            pb_k, qb_k, sb_k = pb_r, qb_r, sb_r

        slots = kernel(pa_k, qa_k, sa_k, pb_k, qb_k, sb_k)
        if sw is not None:
            slots = [(p, vwhere(sw, vneg(nrm), nrm), d, v)
                     for (p, nrm, d, v) in slots]
        if len(slots) == 8 and k_b == 4:
            slots = _fold_slots(slots, _FOLD_PAIRING[(t1, t2)])
        assert len(slots) == k_b, (t1, t2, len(slots), k_b)

        if w_sap:
            # sorted-space indices → true slot ids, read back out of the
            # permuted feature gathers' slot-id row (exact integers)
            ia_f = jnp.where(bvalid, fa[11].astype(f), 0.0)
            ib_f = jnp.where(bvalid, fb[11].astype(f), 0.0)
        else:
            ia_f = ia.astype(f)
            ib_f = ib.astype(f)
        # slot-major emission: slot s of every pair is contiguous. All
        # appends are (cp_b,) planes — the payload assembles with ONE
        # concatenate per component, no transposes anywhere.
        for s, (point, normal, depth, valid) in enumerate(slots):
            for comp in range(3):
                row_parts[comp].append(point[comp])
                row_parts[3 + comp].append(normal[comp])
            row_parts[6].append(depth)
            row_parts[7].append(ia_f)
            row_parts[8].append(ib_f)
            row_parts[9].append(jnp.full((cp_b,), float(s), f))
            valid_parts.append(valid & bvalid)

    packed_t = jnp.stack([jnp.concatenate(parts) for parts in row_parts])
    flat_valid = jnp.concatenate(valid_parts)                 # (M,)

    if extra is not None:
        # mesh rows: slot −1 → key −1 = excluded from warm-start matching
        # (see the row-major twin for why)
        e_pts, e_nrm, e_dep, e_a, e_b, e_val = extra
        e_packed_t = jnp.concatenate([
            e_pts.T, e_nrm.T, e_dep[None],
            e_a.astype(f)[None], e_b.astype(f)[None],
            jnp.full((1, e_a.shape[0]), -1.0, f),
        ], axis=0)
        packed_t = jnp.concatenate([packed_t, e_packed_t], axis=1)
        flat_valid = jnp.concatenate([flat_valid, e_val])

    c_sel = sel_dt if sel_dt != f else None
    if config.pallas_compaction:
        from rl_ode_physics_tpu.ops.compaction_pallas import (
            compact_rows_t_pallas, pallas_ok)
        if pallas_ok():
            rows_t, cvalid, count, overflow = compact_rows_t_pallas(
                flat_valid, packed_t, ccap, sel_dtype=c_sel)
        else:
            rows_t, cvalid, count, overflow = compact_rows_t(
                flat_valid, packed_t, ccap, sel_dtype=c_sel)
    else:
        rows_t, cvalid, count, overflow = compact_rows_t(
            flat_valid, packed_t, ccap, sel_dtype=c_sel)
    a_out = rows_t[7].astype(jnp.int32)
    b_out = rows_t[8].astype(jnp.int32)
    slot_out = jnp.round(rows_t[9]).astype(jnp.int32)
    key = jnp.where(cvalid & (slot_out >= 0),
                    (a_out * n + b_out) * k_glob + slot_out, -1)
    return Contacts(
        point=rows_t[0:3].T,
        normal=rows_t[3:6].T,
        depth=rows_t[6],
        a=a_out,
        b=b_out,
        valid=cvalid,
        count=count,
        overflow=overflow + pair_overflow + sap_overflow,
        key=key,
    ), total_pairs
