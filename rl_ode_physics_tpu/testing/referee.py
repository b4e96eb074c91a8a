"""Independent float64 NumPy QuickStep referee.

A second, from-spec implementation of the ODE QuickStep pipeline the TPU
engine re-derives (reference driver: ``/root/reference/src/main.c:212-214``
— ``dSpaceCollide; dWorldStep; dJointGroupEmpty`` — with the NearCallback
surface parameters of ``src/main.c:684-687``). The engine compiles
vectorized, masked, fixed-shape tensor programs; this referee is scalar
Python loops over plain float64 NumPy — a maximally different execution
path for the *same documented contract*:

* broadphase: all pairs (i < j), AABB overlap, ODE's
  ``(cat1 & col2) || (cat2 & col1)`` filter, at-least-one-movable;
* narrowphase: the primitive pair kernels (sphere/box/capsule/plane) with
  the engine's documented deterministic manifold conventions (canonical
  type ordering, ODE dBoxBox SAT with the 1.05 face-preference fudge and
  Sutherland-Hodgman reference-face clipping, fixed corner enumeration
  order) — these conventions are part of the engine spec, so both
  implementations produce identical row sets in identical order;
* contact rows: ERP/CFM-regularized, bounce-velocity restitution,
  infinite-mu friction (``src/main.c:684-687``);
* solve: projected Gauss-Seidel (SOR) sweeps in buffer row order —
  QuickStep semantics with the deterministic row order the engine
  documents (``ops/solver.py:solve_pgs``);
* integrate: semi-implicit Euler with the gyroscopic Euler term and the
  infinitesimal quaternion update.

Used by ``tests/test_conformance_referee.py`` to diff 1k-step trajectories
on the BASELINE scenes against the <=1e-5 relative-error bar (the
environment has no ODE binding to use directly — SURVEY.md §4).

Everything here is intentionally simple and slow: correctness oracle, not
a throughput path.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

_EPS = 1e-9


@dataclasses.dataclass
class RefereeConfig:
    dt: float = 1.0 / 120.0
    gravity: tuple = (0.0, -9.8, 0.0)
    solver_iterations: int = 20
    sor_omega: float = 1.3
    erp: float = 0.2
    cfm: float = 1e-5
    max_correcting_vel: float = 1e30
    bounce: float = 0.2
    bounce_vel: float = 0.1
    mu: float = math.inf
    friction: bool = True
    max_contacts_per_pair: int = 8
    # "pgs" (QuickStep SOR sweeps) or "dantzig" (direct mixed-LCP solve —
    # the unique solution of (A + cfm/h·I)λ = rhs with normal-row
    # complementarity; mirrors the engine's SolverKind.DANTZIG)
    solver: str = "pgs"
    # trimesh narrowphase mirror (ops/trimesh.py:mesh_narrowphase)
    mesh_probes: int = 3
    mesh_contacts_per_body: int = 4
    # ODE QuickStep randomizes the constraint sweep order per iteration
    # (dxQuickStepper reorders rows before each SOR pass); both the engine
    # and this referee deliberately drop that for bitwise lockstep replay
    # (SURVEY.md §2d). Setting a seed here restores it — used by
    # tests/test_conformance_referee.py to BOUND the divergence the dropped
    # randomization induces (showing it is a tolerance-level choice, not a
    # load-bearing one).
    randomize_rows: int | None = None


def state_to_numpy(state) -> dict:
    """WorldState (JAX pytree) -> dict of float64 numpy arrays."""
    def f(x):
        return np.asarray(x, np.float64)

    return dict(
        pos=f(state.pos), quat=f(state.quat),
        linvel=f(state.linvel), angvel=f(state.angvel),
        inv_mass=f(state.inv_mass), inv_inertia=f(state.inv_inertia),
        body_type=np.asarray(state.body_type, np.int64),
        size=f(state.size),
        category=np.asarray(state.category, np.uint32),
        collide=np.asarray(state.collide, np.uint32),
        is_static=np.asarray(state.is_static, bool),
        is_kinematic=np.asarray(state.is_kinematic, bool),
    )


# --- body type codes (mirrors core.state.BodyType) -------------------------
NULL, SPHERE, BOX, CAPSULE, PLANE, TRIMESH = 0, 1, 2, 3, 4, 5


# ---------------------------------------------------------------------------
# small math
# ---------------------------------------------------------------------------

def quat_to_matrix(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float64)


def quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], np.float64)


def tangent_basis(n):
    """Engine-spec deterministic tangent frame (ops/solver.py:_tangent_basis):
    e = world axis least aligned with n, t1 = cross(n, e) normalized."""
    ax = int(np.argmin(np.abs(n)))
    e = np.zeros(3)
    e[ax] = 1.0
    t1 = np.cross(n, e)
    t1 = t1 / max(np.linalg.norm(t1), _EPS)
    t2 = np.cross(n, t1)
    return t1, t2


def world_inv_inertia(q, inv_inertia_diag):
    r = quat_to_matrix(q)
    return r @ np.diag(inv_inertia_diag) @ r.T


# ---------------------------------------------------------------------------
# narrowphase pair kernels (scalar; engine-spec manifold conventions)
# Each returns a list of (point, normal a->b, depth) with depth > 0.
# ---------------------------------------------------------------------------

def _sphere_sphere(pa, qa, sa, pb, qb, sb):
    ra, rb = sa[0], sb[0]
    d = pb - pa
    dist = np.linalg.norm(d)
    n = d / dist if dist > _EPS else np.array([0.0, 1.0, 0.0])
    depth = ra + rb - dist
    if depth > 0.0:
        return [(pa + n * (ra - 0.5 * depth), n, depth)]
    return []


def _sphere_box_point(center, radius, pb, rb, half):
    """Sphere (or probe sphere) vs oriented box; engine-spec inside/outside
    handling (ops/narrowphase.py:_sphere_box_core)."""
    p_local = rb.T @ (center - pb)
    clamped = np.clip(p_local, -half, half)
    delta = p_local - clamped
    dist = np.linalg.norm(delta)
    if dist > _EPS:
        n_local = -delta / dist
        depth = radius - dist
        surf_local = clamped
    else:
        face_dist = half - np.abs(p_local)
        ax = int(np.argmin(face_dist))
        sign = 1.0 if p_local[ax] >= 0.0 else -1.0
        n_local = np.zeros(3)
        n_local[ax] = sign
        depth = radius + face_dist[ax]
        surf_local = p_local + n_local * face_dist[ax]
    point = pb + rb @ surf_local
    return point, rb @ n_local, depth


def _sphere_box(pa, qa, sa, pb, qb, sb):
    point, n, depth = _sphere_box_point(pa, sa[0], pb, quat_to_matrix(qb),
                                        0.5 * sb)
    return [(point, n, depth)] if depth > 0.0 else []


def _plane_params(p, q):
    n = quat_to_matrix(q)[:, 2]
    return n, float(n @ p)


def _sphere_plane(pa, qa, sa, pb, qb, sb):
    n_p, d_p = _plane_params(pb, qb)
    h = float(n_p @ pa) - d_p
    depth = sa[0] - h
    if depth > 0.0:
        return [(pa - n_p * h, -n_p, depth)]
    return []


# corner enumeration order must match the engine's _BOX_CORNERS
_BOX_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
     for sz in (-1.0, 1.0)], np.float64)


def _box_plane(pa, qa, sa, pb, qb, sb):
    n_p, d_p = _plane_params(pb, qb)
    ra = quat_to_matrix(qa)
    out = []
    for corner in _BOX_CORNERS:
        c = pa + ra @ (corner * (0.5 * sa))
        depth = d_p - float(c @ n_p)
        if depth > 0.0:
            out.append((c, -n_p, depth))
    return out


def _segment_endpoints(p, q, length):
    axis = quat_to_matrix(q)[:, 2]
    h = 0.5 * length
    return p - axis * h, p + axis * h, axis


def _closest_on_segment(a0, a1, p):
    d = a1 - a0
    t = float((p - a0) @ d) / max(float(d @ d), _EPS)
    return a0 + np.clip(t, 0.0, 1.0) * d


def _segment_segment(p0, p1, q0, q1):
    d1, d2, r = p1 - p0, q1 - q0, p0 - q0
    a, e = float(d1 @ d1), float(d2 @ d2)
    f, c, b = float(d2 @ r), float(d1 @ r), float(d1 @ d2)
    denom = a * e - b * b
    s = np.clip((b * f - c * e) / max(denom, _EPS), 0.0, 1.0) if denom > _EPS else 0.0
    t = (b * s + f) / max(e, _EPS)
    t_cl = np.clip(t, 0.0, 1.0)
    s = np.clip((b * t_cl - c) / max(a, _EPS), 0.0, 1.0)
    return p0 + s * d1, q0 + t_cl * d2


def _sphere_capsule(pa, qa, sa, pb, qb, sb):
    b0, b1, _ = _segment_endpoints(pb, qb, sb[1])
    closest = _closest_on_segment(b0, b1, pa)
    return _sphere_sphere(pa, qa, sa, closest, qb, sb)


def _capsule_capsule(pa, qa, sa, pb, qb, sb):
    a0, a1, ax_a = _segment_endpoints(pa, qa, sa[1])
    b0, b1, ax_b = _segment_endpoints(pb, qb, sb[1])
    ca, cb = _segment_segment(a0, a1, b0, b1)
    out = _sphere_sphere(ca, qa, sa, cb, qb, sb)

    if abs(float(ax_a @ ax_b)) > 0.999:        # near-parallel: second support
        far_a = a0 if float((ca - a0) @ (ca - a0)) > float((ca - a1) @ (ca - a1)) else a1
        cb2 = _closest_on_segment(b0, b1, far_a)
        ca2 = _closest_on_segment(a0, a1, cb2)
        if float((ca2 - ca) @ (ca2 - ca)) > 1e-8:
            out += _sphere_sphere(ca2, qa, sa, cb2, qb, sb)
    return out


def _capsule_plane(pa, qa, sa, pb, qb, sb):
    n_p, d_p = _plane_params(pb, qb)
    a0, a1, _ = _segment_endpoints(pa, qa, sa[1])
    r = sa[0]
    out = []
    for e in (a0, a1):
        h = float(n_p @ e) - d_p
        depth = r - h
        if depth > 0.0:
            out.append((e - n_p * h, -n_p, depth))
    return out


def _capsule_box(pa, qa, sa, pb, qb, sb):
    """Engine-spec probe decomposition: both cap endpoints plus the segment
    point closest to the box center, mid dropped when it coincides with an
    endpoint (ops/narrowphase.py:_capsule_box)."""
    rb = quat_to_matrix(qb)
    half = 0.5 * sb
    r = sa[0]
    a0, a1, _ = _segment_endpoints(pa, qa, sa[1])
    mid = _closest_on_segment(a0, a1, pb)
    dup = (np.linalg.norm(mid - a0) < 1e-6) or (np.linalg.norm(mid - a1) < 1e-6)

    out = []
    for idx, probe in enumerate((a0, a1, mid)):
        point, n, depth = _sphere_box_point(probe, r, pb, rb, half)
        if depth > 0.0 and not (idx == 2 and dup):
            out.append((point, n, depth))
    return out


def _clip_quad_to_rect(quad, hx, hy):
    """Sutherland-Hodgman clip of a quad against |x|<=hx, |y|<=hy, in the
    engine's traversal order (planes +x, -x, +y, -y; per edge: emit the
    inside current vertex, then the crossing point)."""
    planes = [(np.array([1.0, 0.0]), hx), (np.array([-1.0, 0.0]), hx),
              (np.array([0.0, 1.0]), hy), (np.array([0.0, -1.0]), hy)]
    verts = [np.asarray(v, np.float64) for v in quad]
    for ab, lim in planes:
        out = []
        m = len(verts)
        for i in range(m):
            cur, nxt = verts[i], verts[(i + 1) % m]
            in_cur = float(ab @ cur) <= lim
            in_nxt = float(ab @ nxt) <= lim
            if in_cur:
                out.append(cur)
            denom = float(ab @ (nxt - cur))
            if in_cur != in_nxt and abs(denom) > _EPS:
                t = np.clip((lim - float(ab @ cur)) / denom, 0.0, 1.0)
                out.append(cur + t * (nxt - cur))
            if len(out) >= 8:        # engine static capacity
                out = out[:8]
        verts = out
    return verts[:8]


def _box_box(pa, qa, sa, pb, qb, sb):
    """ODE dBoxBox structure: SAT over 15 axes with the 1.05 face-preference
    fudge, reference-face Sutherland-Hodgman clipping / edge-edge closest
    points (engine spec: ops/narrowphase.py:_box_box with exact_clip)."""
    ra, rb = quat_to_matrix(qa), quat_to_matrix(qb)
    ha, hb = 0.5 * sa, 0.5 * sb

    t_world = pb - pa
    t = ra.T @ t_world
    c = ra.T @ rb
    absc = np.abs(c) + 1e-6

    sep_a = np.abs(t) - (ha + absc @ hb)
    t_b = c.T @ t
    sep_b = np.abs(t_b) - (hb + absc.T @ ha)

    eye = np.eye(3)
    cols = c.T
    u_all = np.cross(eye[:, None, :], cols[None, :, :]).reshape(9, 3)
    norms = np.linalg.norm(u_all, axis=-1)
    edge_oks = norms > 1e-6
    edge_units = u_all / np.maximum(norms, _EPS)[:, None]
    proj_a = np.sum(np.abs(edge_units) * ha[None, :], axis=1)
    un_in_b = np.einsum("ki,ij->kj", edge_units, c)
    proj_b = np.sum(np.abs(un_in_b) * hb[None, :], axis=1)
    edge_seps = np.abs(edge_units @ t) - (proj_a + proj_b)

    all_seps = np.concatenate([sep_a, sep_b,
                               np.where(edge_oks, edge_seps, -np.inf)])
    if np.max(all_seps) > 0.0:
        return []

    fudge = 1.05
    faces = np.concatenate([sep_a, sep_b])
    best_face_sep = float(np.max(faces))
    best_face_code = int(np.argmax(faces))
    edge_adj = np.where(
        edge_oks,
        edge_seps * np.where(edge_seps < 0, 1.0 / fudge, fudge), -np.inf)
    best_edge_idx = int(np.argmax(edge_adj))
    use_edge = float(edge_adj[best_edge_idx]) > best_face_sep

    if use_edge:
        u_a = edge_units[best_edge_idx]
        sign_e = 1.0 if float(u_a @ t) >= 0.0 else -1.0
        n_a = u_a * sign_e
        n_world = ra @ n_a
        ei, ej = best_edge_idx // 3, best_edge_idx % 3
        oh_ei = np.zeros(3); oh_ei[ei] = 1.0
        oh_ej = np.zeros(3); oh_ej[ej] = 1.0

        sgn_a = np.where(n_a >= 0.0, 1.0, -1.0) * (1.0 - oh_ei)
        pa_sup = pa + ra @ (sgn_a * ha)
        da = ra @ oh_ei
        a0, a1 = pa_sup - da * ha[ei], pa_sup + da * ha[ei]

        n_b_frame = -(c.T @ n_a)
        sgn_b = np.where(n_b_frame >= 0.0, 1.0, -1.0) * (1.0 - oh_ej)
        pb_sup = pb + rb @ (sgn_b * hb)
        db = rb @ oh_ej
        b0, b1 = pb_sup - db * hb[ej], pb_sup + db * hb[ej]

        ca, cb = _segment_segment(a0, a1, b0, b1)
        depth = -float(edge_seps[best_edge_idx])
        if depth > 0.0:
            return [(0.5 * (ca + cb), n_world, depth)]
        return []

    # face case
    face_is_a = best_face_code < 3
    axis_idx = best_face_code if face_is_a else best_face_code - 3
    r_ref, r_inc = (ra, rb) if face_is_a else (rb, ra)
    p_ref, p_inc = (pa, pb) if face_is_a else (pb, pa)
    h_ref, h_inc = (ha, hb) if face_is_a else (hb, ha)

    axes_ref = r_ref.T
    n_ref_raw = axes_ref[axis_idx]
    sign_f = 1.0 if float(n_ref_raw @ (p_inc - p_ref)) >= 0.0 else -1.0
    n_ref = n_ref_raw * sign_f
    n_world = n_ref if face_is_a else -n_ref

    idx0 = 1 if axis_idx == 0 else 0
    idx1 = 1 if axis_idx == 2 else 2
    u0, u1 = axes_ref[idx0], axes_ref[idx1]
    hu0, hu1 = h_ref[idx0], h_ref[idx1]
    face_center = p_ref + n_ref * h_ref[axis_idx]

    axes_inc = r_inc.T
    align = axes_inc @ n_ref
    inc_axis = int(np.argmax(np.abs(align)))
    inc_sign = -np.sign(align[inc_axis])
    inc_axis_vec = axes_inc[inc_axis]
    inc_center = p_inc + inc_axis_vec * inc_sign * h_inc[inc_axis]
    j0 = 1 if inc_axis == 0 else 0
    j1 = 1 if inc_axis == 2 else 2
    v0 = axes_inc[j0] * h_inc[j0]
    v1 = axes_inc[j1] * h_inc[j1]
    quad_world = [inc_center + v0 + v1, inc_center + v0 - v1,
                  inc_center - v0 - v1, inc_center - v0 + v1]

    quad2d = [np.array([float((qw - face_center) @ u0),
                        float((qw - face_center) @ u1)]) for qw in quad_world]
    verts2d = _clip_quad_to_rect(quad2d, hu0, hu1)

    inc_n = inc_axis_vec * inc_sign
    denom = float(inc_n @ n_ref)
    d_inc = float(inc_n @ inc_center)
    out = []
    for v in verts2d:
        base = face_center + v[0] * u0 + v[1] * u1
        z = (d_inc - float(base @ inc_n)) / (denom if abs(denom) > 1e-6 else 1.0)
        depth = -z
        if depth > 0.0:
            lifted = base + z * n_ref
            out.append((lifted - 0.5 * depth * n_ref, n_world, depth))
    return out


_PAIR_KERNELS = {
    (SPHERE, SPHERE): _sphere_sphere,
    (SPHERE, BOX): _sphere_box,
    (SPHERE, CAPSULE): _sphere_capsule,
    (SPHERE, PLANE): _sphere_plane,
    (BOX, BOX): _box_box,
    (BOX, CAPSULE): lambda pa, qa, sa, pb, qb, sb: [
        (p, -n, d) for (p, n, d) in _capsule_box(pb, qb, sb, pa, qa, sa)],
    (BOX, PLANE): _box_plane,
    (CAPSULE, CAPSULE): _capsule_capsule,
    (CAPSULE, PLANE): _capsule_plane,
}


def collide_pair(pa, qa, ta, sa, pb, qb, tb, sb):
    """Engine-spec canonical dispatch: lower type code is A; normals flipped
    back when swapped."""
    swapped = ta > tb
    if swapped:
        pa, pb, qa, qb, sa, sb, ta, tb = pb, pa, qb, qa, sb, sa, tb, ta
    kernel = _PAIR_KERNELS.get((int(ta), int(tb)))
    if kernel is None:
        return []
    out = kernel(pa, qa, sa, pb, qb, sb)
    if swapped:
        out = [(p, -n, d) for (p, n, d) in out]
    return out


# ---------------------------------------------------------------------------
# AABBs (engine spec: |R|·h bound per type)
# ---------------------------------------------------------------------------

def _aabb(pos, q, t, sz):
    r = np.abs(quat_to_matrix(q))
    if t == SPHERE:
        half = np.full(3, sz[0])
    elif t == BOX:
        half = 0.5 * sz
    elif t == CAPSULE:
        half = np.array([sz[0], sz[0], 0.5 * sz[1] + sz[0]])
    elif t in (PLANE, TRIMESH):
        half = np.full(3, 1e9)
    else:
        return np.full(3, 1.0), np.full(3, -1.0)      # NULL: inverted box
    ext = r @ half
    return pos - ext, pos + ext


# ---------------------------------------------------------------------------
# the step
# ---------------------------------------------------------------------------

def _contacts(w, cfg: RefereeConfig, exclude=None):
    """Rows in the engine's deterministic buffer order: pairs by flattened
    upper-triangular (i*N+j) index, manifold slots in kernel order.
    ``exclude``: set of (i, j) pairs to skip (joint-connected bodies)."""
    n = len(w["body_type"])
    boxes = [_aabb(w["pos"][i], w["quat"][i], int(w["body_type"][i]),
                   w["size"][i]) for i in range(n)]
    cat, col = w["category"], w["collide"]
    movable = w["inv_mass"] > 0
    active = w["body_type"] != NULL

    rows = []
    for i in range(n):
        for j in range(i + 1, n):
            ti, tj = int(w["body_type"][i]), int(w["body_type"][j])
            if not (active[i] and active[j]):
                continue
            if ti == TRIMESH or tj == TRIMESH:
                continue
            if exclude is not None and (i, j) in exclude:
                continue
            if not (movable[i] or movable[j]):
                continue
            if not ((int(cat[i]) & int(col[j])) or (int(cat[j]) & int(col[i]))):
                continue
            lo_i, hi_i = boxes[i]
            lo_j, hi_j = boxes[j]
            if not (np.all(lo_i <= hi_j) and np.all(lo_j <= hi_i)):
                continue
            manifold = collide_pair(
                w["pos"][i], w["quat"][i], ti, w["size"][i],
                w["pos"][j], w["quat"][j], tj, w["size"][j],
            )
            for (p, nrm, d) in manifold[:cfg.max_contacts_per_pair]:
                rows.append((i, j, p, nrm, d))
    return rows


# ---------------------------------------------------------------------------
# static trimesh (engine spec: ops/trimesh.py — scalar mirror of the
# two-phase exact narrowphase, including the tile/candidate culling and the
# deepest-first dedup manifold, so the two implementations select the SAME
# contact rows and the trajectory diff is meaningful)
# ---------------------------------------------------------------------------

_MESH_TILE = 128          # ops/trimesh.py:MESH_TILE
_CAND_TILES = 8           # ops/trimesh.py:CAND_TILES
_CAND_TRIS = 16           # ops/trimesh.py:CAND_TRIS


def trimesh_to_numpy(mesh) -> dict:
    """ops.trimesh.TriMesh (JAX pytree, PADDED to the tile multiple) ->
    dict of float64 arrays. Padding is kept: the engine's tile boundaries
    are defined on the padded triangle list."""
    return dict(
        v0=np.asarray(mesh.v0, np.float64),
        e1=np.asarray(mesh.e1, np.float64),
        e2=np.asarray(mesh.e2, np.float64),
        normal=np.asarray(mesh.normal, np.float64),
        slot=int(mesh.slot),
    )


def _closest_on_triangle(p, v0, e1, e2):
    """Ericson closest point, scalar — mirrors the engine's branch-free
    region select order (ops/trimesh.py:_tri_vw: the LAST where wins, so
    vertex regions take priority over edge regions over interior)."""
    ap = p - v0
    d1, d2 = float(e1 @ ap), float(e2 @ ap)
    bp = p - (v0 + e1)
    d3, d4 = float(e1 @ bp), float(e2 @ bp)
    cp_ = p - (v0 + e2)
    d5, d6 = float(e1 @ cp_), float(e2 @ cp_)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    if d1 <= 0 and d2 <= 0:                       # vertex A
        v, w = 0.0, 0.0
    elif d3 >= 0 and d4 <= d3:                    # vertex B
        v, w = 1.0, 0.0
    elif d6 >= 0 and d5 <= d6:                    # vertex C
        v, w = 0.0, 1.0
    elif vc <= 0 and d1 >= 0 and d3 <= 0:         # edge AB
        den = d1 - d3
        v = float(np.clip(d1 / den if abs(den) > _EPS else 0.0, 0.0, 1.0))
        w = 0.0
    elif vb <= 0 and d2 >= 0 and d6 <= 0:         # edge AC
        den = d2 - d6
        v = 0.0
        w = float(np.clip(d2 / den if abs(den) > _EPS else 0.0, 0.0, 1.0))
    elif va <= 0 and (d4 - d3) >= 0 and (d5 - d6) >= 0:   # edge BC
        den = (d4 - d3) + (d5 - d6)
        w = float(np.clip((d4 - d3) / den if abs(den) > _EPS else (d4 - d3),
                          0.0, 1.0))
        v = 1.0 - w
    else:                                         # interior
        den = va + vb + vc
        safe = den if abs(den) > _EPS else 1.0
        v, w = vb / safe, vc / safe
    return v0 + v * e1 + w * e2


def _min_face_exit_np(q, half, r_mat):
    """ops/trimesh.py:_min_face_exit — nearest box-face depth + world
    outward normal for a box-local point q (assumed inside)."""
    slack = half - np.abs(q)
    axis = int(np.argmin(slack))
    depth = float(np.min(slack))
    sign = 1.0 if q[axis] >= 0.0 else -1.0
    if q[axis] == 0.0:
        sign = 1.0
    return depth, r_mat[:, axis] * sign


def _box_tri_candidates_np(pos, r_mat, half, v0, e1, e2, n_tri):
    """ops/trimesh.py:box_tri_candidates — 17 rows in class order:
    8 corners-below-face, 3 tri-vertices-in-box, 6 edge-clip endpoints."""
    eps = 1e-6
    a11, a12, a22 = float(e1 @ e1), float(e1 @ e2), float(e2 @ e2)
    det = a11 * a22 - a12 * a12
    ok_det = abs(det) > _EPS
    safe_det = det if ok_det else 1.0

    s_face = np.sign(float((pos - v0) @ n_tri))
    if s_face == 0.0:
        s_face = 1.0
    n_f = n_tri * s_face

    out = []
    for corner_u in _BOX_CORNERS:                 # 8 corner rows
        c = pos + r_mat @ (corner_u * half)
        h_c = float((c - v0) @ n_f)
        d_vec = c - v0
        u = (a22 * float(e1 @ d_vec) - a12 * float(e2 @ d_vec)) / safe_det
        w_ = (a11 * float(e2 @ d_vec) - a12 * float(e1 @ d_vec)) / safe_det
        inside = ok_det and u >= -eps and w_ >= -eps and u + w_ <= 1.0 + eps
        out.append((c, -n_f, -h_c, (-h_c > 0.0) and inside))

    tri_v = [v0, v0 + e1, v0 + e2]
    for tv in tri_v:                              # 3 vertex rows
        q = r_mat.T @ (tv - pos)
        inside_box = bool(np.all(np.abs(q) <= half + eps))
        dep, nrm = _min_face_exit_np(q, half, r_mat)
        out.append((tv, nrm, dep, inside_box and dep > 0.0))

    e_dirs = [e1, (e2 - e1), -e2]
    for j in range(3):                            # 6 edge-clip rows
        p_a, d = tri_v[j], e_dirs[j]
        a_l = r_mat.T @ (p_a - pos)
        dl = r_mat.T @ d
        t0i, t1i = [], []
        for ax in range(3):
            if abs(dl[ax]) > _EPS:
                lo = (-half[ax] - a_l[ax]) / dl[ax]
                hi = (half[ax] - a_l[ax]) / dl[ax]
                t0i.append(min(lo, hi))
                t1i.append(max(lo, hi))
            else:
                inside = abs(a_l[ax]) <= half[ax]
                t0i.append(0.0 if inside else math.inf)
                t1i.append(1.0 if inside else -math.inf)
        t0 = max(max(t0i), 0.0)
        t1 = min(min(t1i), 1.0)
        nonempty = t0 < t1
        for t, was_clipped in ((t0, t0 > eps), (t1, t1 < 1.0 - eps)):
            # empty clips leave t at ±inf; the row is masked dead below but
            # the point arithmetic would warn (inf·0) — pin t first
            t_safe = t if math.isfinite(t) else 0.0
            q = a_l + t_safe * dl
            dep, nrm = _min_face_exit_np(q, half, r_mat)
            out.append((p_a + t_safe * d, nrm, dep,
                        nonempty and was_clipped and dep > 0.0))
    return out


def _capsule_tri_candidate_np(p0, p1, radius, v0, e1, e2, n_tri):
    """ops/trimesh.py:capsule_tri_candidate — argmin over the 5-candidate
    closest-feature set (2 endpoint-face + 3 edge-edge), plus the
    core-crosses-face override."""
    cand_tri, cand_core, d2s = [], [], []
    for pe in (p0, p1):
        ct = _closest_on_triangle(pe, v0, e1, e2)
        cand_tri.append(ct)
        cand_core.append(pe)
        d2s.append(float((ct - pe) @ (ct - pe)))
    tri_v = [v0, v0 + e1, v0 + e2]
    for j in range(3):
        ea, eb = tri_v[j], tri_v[(j + 1) % 3]
        c_core, c_edge = _segment_segment(p0, p1, ea, eb)
        cand_core.append(c_core)
        cand_tri.append(c_edge)
        d2s.append(float((c_core - c_edge) @ (c_core - c_edge)))
    best = int(np.argmin(d2s))
    pt_tri, pt_core = cand_tri[best], cand_core[best]
    dist = math.sqrt(max(min(d2s), 0.0))

    h0 = float((p0 - v0) @ n_tri)
    h1 = float((p1 - v0) @ n_tri)
    if h0 * h1 < 0.0:
        denom = (h0 - h1) if abs(h0 - h1) > _EPS else 1.0
        tx = float(np.clip(h0 / denom, 0.0, 1.0))
        px = p0 + tx * (p1 - p0)
        a11, a12, a22 = float(e1 @ e1), float(e1 @ e2), float(e2 @ e2)
        det = a11 * a22 - a12 * a12
        if abs(det) > _EPS:
            d_vec = px - v0
            u = (a22 * float(e1 @ d_vec) - a12 * float(e2 @ d_vec)) / det
            w_ = (a11 * float(e2 @ d_vec) - a12 * float(e1 @ d_vec)) / det
            if u >= 0 and w_ >= 0 and u + w_ <= 1.0:
                dist = 0.0
                pt_tri = px
    n_dir = pt_tri - pt_core
    n_len = float(np.linalg.norm(n_dir))
    if n_len > 1e-6:
        nrm = n_dir / max(n_len, _EPS)
    else:
        nrm = -n_tri * np.sign(h0 if abs(h0) > abs(h1) else h1)
    dep = radius - dist
    return pt_tri, nrm, dep, dep > 0.0


def _mesh_contacts(w, mesh: dict, cfg: RefereeConfig):
    """Static-trimesh contact rows in the engine's buffer order: appended
    AFTER the primitive pair rows (ops/narrowphase.py:1062-1079), bodies in
    slot order, K manifold rows per body deepest-first (only valid rows).

    Mirrors the two-phase culling exactly (probe-min tile ranking →
    candidate triangles → per-type exact contacts → dedup deepest-K) so
    both implementations pick identical rows; top-k/argmax/argmin ties
    resolve to the first index in both."""
    n = len(w["body_type"])
    k = cfg.mesh_contacts_per_body
    v0_all, e1_all = mesh["v0"], mesh["e1"]
    e2_all, n_all = mesh["e2"], mesh["normal"]
    t_padded = v0_all.shape[0]
    nt = t_padded // _MESH_TILE
    kt = min(_CAND_TILES, nt)
    ke = _CAND_TRIS

    rows = []
    for i in range(n):
        bt = int(w["body_type"][i])
        if bt not in (SPHERE, BOX, CAPSULE):
            continue
        eligible = (bool(w["inv_mass"][i] > 0) and not w["is_static"][i]
                    and bt != NULL)
        if not eligible:
            continue
        pos = w["pos"][i]
        r_mat = quat_to_matrix(w["quat"][i])
        half = 0.5 * w["size"][i]
        r_sph = w["size"][i][0]
        h_cap = 0.5 * w["size"][i][1]
        axis_z = r_mat[:, 2]

        # phase-1 probes: center (+ long-axis extremities for box/capsule)
        if cfg.mesh_probes > 1:
            if bt == BOX:
                ax = int(np.argmax(half))
                off = r_mat[:, ax] * half[ax]
            elif bt == CAPSULE:
                off = axis_z * (h_cap + r_sph)
            else:
                off = np.zeros(3)
            probes = [pos, pos + off, pos - off]
        else:
            probes = [pos]

        # per-triangle min-over-probes closest distance (padded list —
        # padded tris sit at 1e9 and never win)
        d2_tri_all = np.empty(t_padded)
        for t in range(t_padded):
            d2_tri_all[t] = min(
                float(np.sum((_closest_on_triangle(
                    p, v0_all[t], e1_all[t], e2_all[t]) - p) ** 2))
                for p in probes)

        # tile ranking (ascending min distance, ties by tile index), then
        # candidate triangles indexed in TILE-RANK order — the engine's
        # top_k over tiles reorders the candidate feature array
        tile_d2 = d2_tri_all.reshape(nt, _MESH_TILE).min(axis=1)
        tile_rank = np.argsort(tile_d2, kind="stable")[:kt]
        cand_idx = np.concatenate(
            [np.arange(t * _MESH_TILE, (t + 1) * _MESH_TILE)
             for t in tile_rank])
        cand_d2 = d2_tri_all[cand_idx]
        top = np.argsort(cand_d2, kind="stable")[:ke]
        tris = cand_idx[top]                       # (ke,) padded tri ids

        # phase 2: per-type candidates over the ke triangles, in the
        # engine's concatenation order (box rows are CLASS-major)
        cands = []
        if bt == SPHERE:
            for t in tris:
                cl = _closest_on_triangle(pos, v0_all[t], e1_all[t],
                                          e2_all[t])
                nd = cl - pos
                nl = float(np.linalg.norm(nd))
                nrm = (nd / max(nl, _EPS) if nl > 1e-6
                       else np.array([0.0, -1.0, 0.0]))
                dep = r_sph - nl
                cands.append((cl, nrm, dep, dep > 0.0))
        elif bt == BOX:
            per_tri = [_box_tri_candidates_np(
                pos, r_mat, half, v0_all[t], e1_all[t], e2_all[t], n_all[t])
                for t in tris]                     # (ke, 17)
            for cls in range(17):                  # class-major flatten
                for pt in per_tri:
                    cands.append(pt[cls])
        else:                                      # CAPSULE
            p0 = pos - axis_z * h_cap
            p1 = pos + axis_z * h_cap
            for t in tris:
                cands.append(_capsule_tri_candidate_np(
                    p0, p1, r_sph, v0_all[t], e1_all[t], e2_all[t],
                    n_all[t]))

        # sanitize exactly like the engine (±inf from slab clips)
        cands = [(p, nr, d, bool(v and np.isfinite(d)
                                 and np.all(np.isfinite(p))
                                 and np.all(np.isfinite(nr))))
                 for (p, nr, d, v) in cands]

        # dedup deepest-k (ops/trimesh.py:_dedup_deepest_k): greedy argmax
        # with near-duplicate suppression, ties to the first index
        char = r_sph if bt in (SPHERE, CAPSULE) else float(np.min(half))
        r2 = max(0.25 * char, 1e-4) ** 2
        keys = np.array([d if v else -math.inf for (_, _, d, v) in cands])
        pts_arr = np.stack([np.where(v, p, np.zeros(3))
                            for (p, _, _, v) in cands])
        for _ in range(k):
            if np.max(keys) == -math.inf:
                break
            j = int(np.argmax(keys))
            p_j, n_j, d_j, _ = cands[j]
            rows.append((i, mesh["slot"], p_j, n_j, d_j))
            near = np.sum((pts_arr - pts_arr[j]) ** 2, -1) < r2
            keys = np.where(near, -math.inf, keys)
            keys[j] = -math.inf
    return rows


# ---------------------------------------------------------------------------
# bilateral joints (engine spec: ops/joints.py — ball + hinge mirrored here;
# the conformance scenes use those two kinds)
# ---------------------------------------------------------------------------

J_BALL, J_HINGE = 1, 2


def jointset_to_numpy(joints) -> list[dict]:
    """ops.joints.JointSet (JAX pytree) -> list of referee joint dicts
    (live slots only, in slot order — the engine emits rows per slot in
    slot order, and empty slots emit no live rows)."""
    kind = np.asarray(joints.kind)
    out = []
    for j in range(kind.shape[0]):
        if kind[j] == 0:
            continue
        if kind[j] not in (J_BALL, J_HINGE):
            raise NotImplementedError(
                "referee mirrors ball and hinge joints only")
        out.append(dict(
            kind=int(kind[j]), a=int(joints.a[j]), b=int(joints.b[j]),
            anchor_a=np.asarray(joints.anchor_a[j], np.float64),
            anchor_b=np.asarray(joints.anchor_b[j], np.float64),
            axis_a=np.asarray(joints.axis_a[j], np.float64),
            axis_b=np.asarray(joints.axis_b[j], np.float64),
            ref_a=np.asarray(joints.ref_a[j], np.float64),
            ref_b=np.asarray(joints.ref_b[j], np.float64),
            lo=float(joints.lo[j]), hi=float(joints.hi[j]),
            stop_bounce=float(joints.stop_bounce[j]),
            motor_vel=float(joints.motor_vel[j]),
            motor_fmax=float(joints.motor_fmax[j]),
        ))
    return out


def _perp_basis_np(u):
    """Engine spec ops/joints.py:_perp_basis — deterministic orthonormal
    (p, q) completing unit axis u; argmin ties resolve to the first axis."""
    ax = int(np.argmin(np.abs(u)))
    e = np.zeros(3)
    e[ax] = 1.0
    p = np.cross(u, e)
    p = p / max(np.linalg.norm(p), _EPS)
    return p, np.cross(u, p)


def _hinge_angle_np(w, jd):
    """Engine spec ops/joints.py:hinge_angle."""
    ra = quat_to_matrix(w["quat"][jd["a"]])
    rb = quat_to_matrix(w["quat"][jd["b"]])
    u = ra @ jd["axis_a"]
    u = u / max(np.linalg.norm(u), _EPS)
    pa = ra @ jd["ref_a"]
    pb = rb @ jd["ref_b"]
    pa = pa - u * float(pa @ u)
    pb = pb - u * float(pb @ u)
    return math.atan2(float(np.cross(pa, pb) @ u), float(pa @ pb))


def _joint_rows(w, joints: list[dict], inv_i_world, cfg: RefereeConfig):
    """Per-step bilateral rows in the engine's emission order: per joint
    slot, 7 rows — 3 anchor rows (world basis axes), 2 angular rows (hinge:
    ⊥-pair with axis-misalignment bias; dead for ball), 1 motor row, 1
    limit row (engine spec ops/joints.py:joint_rows; rows returned live
    rows only is NOT done — dead rows simply never move, like the engine's
    ``live`` mask)."""
    dt = cfg.dt
    erp_dt = cfg.erp / dt
    cfm_term = cfg.cfm / dt
    eye = np.eye(3)
    rows = []
    for jd in joints:
        a, b = jd["a"], jd["b"]
        is_hinge = jd["kind"] == J_HINGE
        ra = quat_to_matrix(w["quat"][a])
        rb = quat_to_matrix(w["quat"][b])
        pa = w["pos"][a] + ra @ jd["anchor_a"]
        pb = w["pos"][b] + rb @ jd["anchor_b"]
        arm_a, arm_b = pa - w["pos"][a], pb - w["pos"][b]
        axis_w = ra @ jd["axis_a"]
        axis_w = axis_w / max(np.linalg.norm(axis_w), _EPS)
        axis_b_w = rb @ jd["axis_b"]
        p_ax, q_ax = _perp_basis_np(axis_w)
        err = pa - pb
        mis = np.cross(axis_b_w, axis_w)

        def mk(n, wa, wb, rhs, live, lob=-math.inf, hib=math.inf):
            d = (float(n @ n) * (w["inv_mass"][a] + w["inv_mass"][b])
                 + float(wa @ (inv_i_world[a] @ wa))
                 + float(wb @ (inv_i_world[b] @ wb)) + cfm_term)
            return dict(a=a, b=b, n=n, wa=wa, wb=wb, rhs=rhs, live=live,
                        lob=lob, hib=hib, d=d)

        for i in range(3):                      # anchor rows
            rows.append(mk(eye[i], np.cross(arm_a, eye[i]),
                           np.cross(arm_b, eye[i]),
                           erp_dt * err[i], True))
        z3 = np.zeros(3)
        for ax in (p_ax, q_ax):                 # hinge angular pair
            rows.append(mk(z3, ax, ax, erp_dt * float(mis @ ax), is_hinge))
        # motor row (dParamVel/dParamFMax; impulse clamp ±fmax·dt)
        fmax = jd["motor_fmax"]
        rows.append(mk(z3, axis_w, axis_w, jd["motor_vel"],
                       is_hinge and fmax > 0.0, -fmax * dt, fmax * dt))
        # limit row (dParamLoStop/HiStop, one-sided, dParamBounce)
        ang = _hinge_angle_np(w, jd) if is_hinge else 0.0
        below, above = ang < jd["lo"], ang > jd["hi"]
        stop_target = erp_dt * ((jd["lo"] - ang) if below
                                else (jd["hi"] - ang))
        coord_vel = float((w["angvel"][b] - w["angvel"][a]) @ axis_w)
        approaching = (coord_vel < 0.0) if below else (coord_vel > 0.0)
        bounce_t = (-jd["stop_bounce"] * coord_vel
                    if (approaching and jd["stop_bounce"] > 0.0
                        and abs(coord_vel) > cfg.bounce_vel) else 0.0)
        stop_target = (max(stop_target, bounce_t) if below
                       else min(stop_target, bounce_t))
        rows.append(mk(z3, axis_w, axis_w, stop_target,
                       is_hinge and (below or above),
                       0.0 if below else -math.inf,
                       math.inf if below else 0.0))
    return rows


def _joint_pass(w, jrows, jlam, inv_i_world, cfg: RefereeConfig):
    """One SEQUENTIAL (Gauss-Seidel) SOR pass over all joint rows — each
    row sees the velocities already updated by every previous row, exactly
    the engine's ``joint_iteration_seq`` (ops/joints.py) and ODE
    QuickStep's sweep semantics for bilateral rows. (The engine's batched
    Jacobi pass is the throughput JACOBI solver's variant and uses a
    mass-split effective mass; the conformance PGS path mirrored here is
    sequential.)"""
    omega = cfg.sor_omega
    cfm_term = cfg.cfm / cfg.dt
    for k, rd in enumerate(jrows):
        a, b = rd["a"], rd["b"]
        rel = (float((w["linvel"][b] - w["linvel"][a]) @ rd["n"])
               + float(w["angvel"][b] @ rd["wb"])
               - float(w["angvel"][a] @ rd["wa"]))
        dl = omega * (rd["rhs"] - rel - cfm_term * jlam[k]) / rd["d"]
        new = np.clip(jlam[k] + dl, rd["lob"], rd["hib"])
        dl = (new - jlam[k]) if rd["live"] else 0.0
        jlam[k] += dl
        imp = rd["n"] * dl
        w["linvel"][a] -= w["inv_mass"][a] * imp
        w["angvel"][a] -= (inv_i_world[a] @ rd["wa"]) * dl
        w["linvel"][b] += w["inv_mass"][b] * imp
        w["angvel"][b] += (inv_i_world[b] @ rd["wb"]) * dl


def _connected(joints: list[dict]):
    return {(jd["a"], jd["b"]) for jd in joints} | \
           {(jd["b"], jd["a"]) for jd in joints}


def referee_step(w: dict, cfg: RefereeConfig, joints: list[dict] = (),
                 mesh: dict | None = None) -> dict:
    """One 120 Hz substep: collide -> external forces -> PGS -> integrate
    (the engine's documented pipeline order, core/world.py:step).

    ``joints``: ``jointset_to_numpy`` output — bilateral rows solved
    interleaved with the contact sweeps, one Jacobi joint pass per solver
    iteration after the contact sweep (engine spec ops/solver.py:282-294);
    jointed pairs are excluded from collision (``dAreConnected`` exclusion,
    ops/joints.py:connected_mask). ``mesh``: ``trimesh_to_numpy`` output —
    static-trimesh contacts appended after the primitive rows
    (ops/narrowphase.py:1062-1079 ordering)."""
    w = {k: np.copy(v) for k, v in w.items()}
    n = len(w["body_type"])
    dt = cfg.dt

    rows = _contacts(w, cfg, exclude=_connected(joints) if joints else None)
    if mesh is not None:
        rows += _mesh_contacts(w, mesh, cfg)

    # external forces: gravity on dynamic non-kinematic; gyroscopic term
    g = np.asarray(cfg.gravity, np.float64)
    inv_i_world = [world_inv_inertia(w["quat"][i], w["inv_inertia"][i])
                   for i in range(n)]
    for i in range(n):
        dyn = (w["body_type"][i] != NULL and not w["is_static"][i]
               and not w["is_kinematic"][i])
        if dyn:
            w["linvel"][i] = w["linvel"][i] + dt * g
        inv_diag = w["inv_inertia"][i]
        i_body = np.where(inv_diag > 0, 1.0 / np.maximum(inv_diag, 1e-30), 0.0)
        r = quat_to_matrix(w["quat"][i])
        i_world = r @ np.diag(i_body) @ r.T
        gyro = np.cross(w["angvel"][i], i_world @ w["angvel"][i])
        w["angvel"][i] = w["angvel"][i] + dt * (inv_i_world[i] @ (-gyro))

    # row data (engine spec: ops/solver.py:_row_data)
    cfm_term = cfg.cfm / dt
    rowdata = []
    for (a, b, p, nrm, depth) in rows:
        r_a = p - w["pos"][a]
        r_b = p - w["pos"][b]
        t1, t2 = tangent_basis(nrm)

        def eff(axis):
            rxn_a, rxn_b = np.cross(r_a, axis), np.cross(r_b, axis)
            return (w["inv_mass"][a] + w["inv_mass"][b]
                    + float(rxn_a @ (inv_i_world[a] @ rxn_a))
                    + float(rxn_b @ (inv_i_world[b] @ rxn_b)))

        d_n, d_t1, d_t2 = eff(nrm) + cfm_term, eff(t1) + cfm_term, eff(t2) + cfm_term
        va0 = w["linvel"][a] + np.cross(w["angvel"][a], r_a)
        vb0 = w["linvel"][b] + np.cross(w["angvel"][b], r_b)
        v_n0 = float((vb0 - va0) @ nrm)
        bias = min(cfg.erp * depth / dt, cfg.max_correcting_vel)
        bounce = -cfg.bounce * v_n0 if -v_n0 > cfg.bounce_vel else 0.0
        target = max(bias, bounce)
        rowdata.append(dict(a=a, b=b, r_a=r_a, r_b=r_b, n=nrm, t1=t1, t2=t2,
                            d_n=d_n, d_t1=d_t1, d_t2=d_t2, target=target))

    jrows = _joint_rows(w, joints, inv_i_world, cfg) if joints else None
    if cfg.solver == "dantzig":
        if jrows:
            raise NotImplementedError(
                "referee joints mirror the PGS interleaving only")
        _solve_direct(w, rowdata, inv_i_world, cfg)
    else:
        _solve_pgs(w, rowdata, inv_i_world, cfg, jrows=jrows)

    # integrate positions (engine spec: ops/integrator.py)
    for i in range(n):
        if w["body_type"][i] == NULL or w["is_static"][i]:
            continue
        w["pos"][i] = w["pos"][i] + dt * w["linvel"][i]
        omega_q = np.array([0.0, *w["angvel"][i]])
        q = w["quat"][i] + dt * 0.5 * quat_mul(omega_q, w["quat"][i])
        w["quat"][i] = q / max(np.linalg.norm(q), 1e-12)
    return w


def _solve_pgs(w, rowdata, inv_i_world, cfg: RefereeConfig, jrows=None):
    """QuickStep SOR sweeps (engine spec: ops/solver.py:solve_pgs — buffer
    row order, normal then t1 then t2 per row, SOR omega, CFM softening,
    lambda accumulation). ``jrows``: bilateral joint rows — one Jacobi
    joint pass after each contact sweep (ops/solver.py:286-293)."""
    cfm_term = cfg.cfm / cfg.dt
    omega = cfg.sor_omega
    mu_inf = math.isinf(cfg.mu)
    lam_n = np.zeros(len(rowdata))
    lam_1 = np.zeros(len(rowdata))
    lam_2 = np.zeros(len(rowdata))

    def rel_v(rd, axis):
        a, b = rd["a"], rd["b"]
        va = w["linvel"][a] + np.cross(w["angvel"][a], rd["r_a"])
        vb = w["linvel"][b] + np.cross(w["angvel"][b], rd["r_b"])
        return float((vb - va) @ axis)

    def apply(rd, axis, dlam):
        a, b = rd["a"], rd["b"]
        imp = axis * dlam
        w["linvel"][a] = w["linvel"][a] - w["inv_mass"][a] * imp
        w["angvel"][a] = w["angvel"][a] - inv_i_world[a] @ np.cross(rd["r_a"], imp)
        w["linvel"][b] = w["linvel"][b] + w["inv_mass"][b] * imp
        w["angvel"][b] = w["angvel"][b] + inv_i_world[b] @ np.cross(rd["r_b"], imp)

    # ODE QuickStep's per-iteration constraint reordering, reproduced as an
    # option: dxQuickStepper permutes the row order before each SOR pass
    # (deliberately dropped by both engine and referee for bitwise replay —
    # SURVEY.md §2d). The permutation changes the Gauss-Seidel sweep path
    # but not the fixed point of the regularized system.
    rng = (np.random.default_rng(cfg.randomize_rows)
           if cfg.randomize_rows is not None else None)

    jlam = np.zeros(len(jrows)) if jrows else None
    for _ in range(cfg.solver_iterations):
        order = (rng.permutation(len(rowdata)) if rng is not None
                 else range(len(rowdata)))
        for k in order:
            rd = rowdata[k]
            # residual includes ODE's CFM softening −cfm/h·λ (QuickStep
            # converges to (A + cfm/h·I)λ = rhs — engine spec ops/solver.py)
            dlam = omega * (rd["target"] - rel_v(rd, rd["n"])
                            - cfm_term * lam_n[k]) / rd["d_n"]
            new = max(lam_n[k] + dlam, 0.0)
            dlam = new - lam_n[k]
            lam_n[k] = new
            apply(rd, rd["n"], dlam)

            if cfg.friction:
                bound = math.inf if mu_inf else cfg.mu * lam_n[k]
                dls = omega * (0.0 - rel_v(rd, rd["t1"])
                               - cfm_term * lam_1[k]) / rd["d_t1"]
                new = np.clip(lam_1[k] + dls, -bound, bound)
                dls = new - lam_1[k]
                lam_1[k] = new
                apply(rd, rd["t1"], dls)

                dls = omega * (0.0 - rel_v(rd, rd["t2"])
                               - cfm_term * lam_2[k]) / rd["d_t2"]
                new = np.clip(lam_2[k] + dls, -bound, bound)
                dls = new - lam_2[k]
                lam_2[k] = new
                apply(rd, rd["t2"], dls)

        if jrows:
            # interleaved bilateral pass after each contact sweep
            # (engine spec: ops/solver.py:one_iter — contact scan, then
            # ONE Jacobi joint pass per solver iteration)
            _joint_pass(w, jrows, jlam, inv_i_world, cfg)


def _solve_direct(w, rowdata, inv_i_world, cfg: RefereeConfig):
    """Direct mixed-LCP solve (engine spec: ops/lcp.py / SolverKind.DANTZIG):
    Murty principal pivoting on the normal rows of the CFM-regularized
    Delassus system; friction rows bilateral (mu = dInfinity, no
    dContactApprox1 — the reference's surface)."""
    if cfg.friction and not math.isinf(cfg.mu):
        raise NotImplementedError("direct mode mirrors the mu=inf surface")
    c = len(rowdata)
    if c == 0:
        return
    r_rows = 3 * c if cfg.friction else c

    # rows ordered [normal block | t1 block | t2 block] like the engine
    def row_axis(k):
        rd = rowdata[k % c]
        return rd, (rd["n"], rd["t1"], rd["t2"])[k // c]

    # dense Jacobian against the 6-DoF body velocities
    n_bodies = len(w["inv_mass"])
    j = np.zeros((r_rows, n_bodies, 6))
    for k in range(r_rows):
        rd, u = row_axis(k)
        a, b = rd["a"], rd["b"]
        j[k, a, 0:3] -= u
        j[k, a, 3:6] -= np.cross(rd["r_a"], u)
        j[k, b, 0:3] += u
        j[k, b, 3:6] += np.cross(rd["r_b"], u)

    jw = j.copy()
    for i in range(n_bodies):
        jw[:, i, 0:3] *= w["inv_mass"][i]
        jw[:, i, 3:6] = jw[:, i, 3:6] @ inv_i_world[i].T
    a_mat = np.einsum("rnk,snk->rs", jw, j)
    a_mat += (cfg.cfm / cfg.dt) * np.eye(r_rows)

    vel6 = np.concatenate([w["linvel"], w["angvel"]], axis=-1)
    target = np.array([row_axis(k)[0]["target"] if k < c else 0.0
                       for k in range(r_rows)])
    b_vec = np.einsum("rnk,nk->r", j, vel6) - target

    is_normal = np.arange(r_rows) < c
    always = ~is_normal                       # bilateral friction rows
    act = always | (is_normal & (b_vec < 0.0))
    eye = np.eye(r_rows)
    lam = np.zeros(r_rows)
    for _ in range(64):
        m = np.where(act[:, None] & act[None, :], a_mat, eye)
        lam = np.linalg.solve(m, np.where(act, -b_vec, 0.0))
        w_vec = a_mat @ lam + b_vec
        new_act = ((act & ~(act & is_normal & (lam < -1e-10)))
                   | (~act & is_normal & (w_vec < -1e-10)) | always)
        if np.array_equal(new_act, act):
            break
        act = new_act
    lam = np.where(is_normal, np.maximum(lam, 0.0), lam)

    dv6 = np.einsum("r,rnk->nk", lam, jw)
    w["linvel"] += dv6[:, 0:3]
    w["angvel"] += dv6[:, 3:6]
