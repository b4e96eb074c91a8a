"""Narrowphase: primitive contact generation with static-shape manifolds.

TPU-native replacement for ODE's ``dCollide`` (reference call:
``src/main.c:678``, 8 contacts/pair). Every pair function returns a
fixed-capacity manifold — ``K = max_contacts_per_pair`` slots of
(point, normal, depth, valid) — so the whole narrowphase is one
``vmap``-batched, branch-free tensor program: per-pair type dispatch is mask
selection, not control flow (all pair kernels are evaluated and the right
one selected; with ≤6 primitive types this trades a small amount of FLOPs —
cheap on the VPU — for zero divergence and static shapes).

Conventions
-----------
* Contact normal points from body A toward body B; a positive impulse along
  the normal pushes them apart.
* ``depth > 0`` means penetration (matches ODE's ``dContactGeom.depth``).
* Capsules are aligned with their local Z axis (ODE direction 3); their
  ``size`` is (radius, cylinder_length, -).
* Planes use their local Z as the world normal via orientation.

Pair coverage: sphere/box/capsule/plane in all combinations (box-box via SAT
with ODE-style reference-face clipping and edge-edge closest points; fudge
factor 1.05 preferring face axes like ODE's dBoxBox). Trimesh collision
lives in ``ops/trimesh.py`` (Pallas-tiled) because its data layout differs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import BodyType, WorldState
from rl_ode_physics_tpu.ops.broadphase import PairCandidates
from rl_ode_physics_tpu.utils import quat as quat_m

_EPS = 1e-9


# --- tiny-dim dynamic-index helpers ---------------------------------------
# Batched dynamic indexing (arr[traced_idx] under vmap) lowers to XLA gather,
# which is pathologically slow on TPU when fused. For 3/8/9-wide axes a
# one-hot compare + masked sum is pure VPU and fuses cleanly.

def _sel(v, idx):
    """v (k,) indexed by traced scalar idx → scalar (VPU one-hot select)."""
    k = v.shape[0]
    oh = jnp.arange(k) == idx
    return jnp.sum(jnp.where(oh, v, jnp.zeros_like(v)))


def _sel_row(m, idx):
    """m (k, d) row-select by traced scalar idx → (d,)."""
    k = m.shape[0]
    oh = jnp.arange(k) == idx
    return jnp.sum(jnp.where(oh[:, None], m, jnp.zeros_like(m)), axis=0)


def _onehot(idx, k, dtype):
    return (jnp.arange(k) == idx).astype(dtype)



# --- micro-matmul helpers ---------------------------------------------------
# 3-vector/3x3 products as broadcast-sums: batched tiny dot_generals lower
# to convolutions on this TPU backend (measured hot); these stay on the VPU
# and fuse with their neighbors.

def _mv(m, v):
    """m (...,3,3) @ v (...,3) -> (...,3)."""
    return jnp.sum(m * v[..., None, :], axis=-1)


def _mtv(m, v):
    """m.T @ v for m (...,3,3), v (...,3)."""
    return jnp.sum(m * v[..., :, None], axis=-2)


def _mtm(a, b):
    """a.T @ b for a, b (...,3,3): out[i,j] = sum_k a[k,i] b[k,j]."""
    return jnp.sum(a[..., :, :, None] * b[..., :, None, :], axis=-3)


@struct.dataclass
class Contacts:
    """Static-capacity contact rows for the solver (per world)."""

    point: jnp.ndarray   # (C, 3)
    normal: jnp.ndarray  # (C, 3) from body a toward body b
    depth: jnp.ndarray   # (C,)
    a: jnp.ndarray       # (C,) int32 body slot
    b: jnp.ndarray       # (C,) int32 body slot
    valid: jnp.ndarray   # (C,) bool
    count: jnp.ndarray   # () int32
    overflow: jnp.ndarray  # () int32 — contacts dropped at capacity
    # stable identity (pair_flat·K + manifold slot; −1 when invalid) — lets
    # the opt-in warm-start path (ops/warmstart.py) match rows across steps.
    # The default pipeline ignores it (per-step transient contacts, ODE's
    # dJointGroupEmpty parity).
    key: jnp.ndarray     # (C,) int32


def _pad_manifold(points, normals, depths, valid, k: int):
    """Pad an (m, …) manifold to (k, …)."""
    m = points.shape[0]
    if m == k:
        return points, normals, depths, valid
    pad = k - m
    return (
        jnp.concatenate([points, jnp.zeros((pad, 3), points.dtype)], 0),
        jnp.concatenate([normals, jnp.zeros((pad, 3), normals.dtype)], 0),
        jnp.concatenate([depths, jnp.zeros((pad,), depths.dtype)], 0),
        jnp.concatenate([valid, jnp.zeros((pad,), bool)], 0),
    )


# ---------------------------------------------------------------------------
# Primitive pair kernels (single pair; vmapped by `narrowphase`)
# Each returns (points (k,3), normals (k,3), depths (k,), valid (k,)).
# ---------------------------------------------------------------------------

def _sphere_sphere(pa, qa, sa, pb, qb, sb, k):
    ra, rb = sa[0], sb[0]
    d = pb - pa
    dist = jnp.linalg.norm(d)
    n = d / jnp.maximum(dist, _EPS)
    # coincident centers: deterministic up-normal fallback
    n = jnp.where(dist > _EPS, n, jnp.array([0.0, 1.0, 0.0], d.dtype))
    depth = ra + rb - dist
    point = pa + n * (ra - 0.5 * depth)
    return _pad_manifold(point[None], n[None], depth[None],
                         (depth > 0.0)[None], k)


def _sphere_box_core(center, radius, pb, rb_mat, half):
    """Sphere vs oriented box; returns (point, normal a→b, depth)."""
    p_local = _mtv(rb_mat, center - pb)
    clamped = jnp.clip(p_local, -half, half)
    delta = p_local - clamped
    dist = jnp.linalg.norm(delta)
    outside = dist > _EPS

    # outside: normal (sphere→box) is -delta/dist
    n_local_out = -delta / jnp.maximum(dist, _EPS)
    depth_out = radius - dist

    # center inside box: push out along the closest face
    face_dist = half - jnp.abs(p_local)       # (3,) ≥ 0 inside
    ax = jnp.argmin(face_dist)
    oh = _onehot(ax, 3, p_local.dtype)
    p_ax = jnp.sum(p_local * oh)
    fd_ax = jnp.sum(face_dist * oh)
    sign = jnp.where(p_ax >= 0.0, 1.0, -1.0)
    n_local_in = oh * sign
    depth_in = radius + fd_ax

    n_local = jnp.where(outside, n_local_out, n_local_in)
    depth = jnp.where(outside, depth_out, depth_in)
    surf_local = jnp.where(outside, clamped,
                           p_local + n_local_in * fd_ax)
    point = pb + _mv(rb_mat, surf_local)
    n_world = _mv(rb_mat, n_local)
    return point, n_world, depth


def _sphere_box(pa, qa, sa, pb, qb, sb, k):
    point, n, depth = _sphere_box_core(
        pa, sa[0], pb, quat_m.to_matrix(qb), 0.5 * sb
    )
    return _pad_manifold(point[None], n[None], depth[None],
                         (depth > 0.0)[None], k)


def _plane_params(p, q):
    """Plane world normal (local +Z) and offset d with n·x = d."""
    n = quat_m.to_matrix(q)[:, 2]
    return n, jnp.dot(n, p)


def _sphere_plane(pa, qa, sa, pb, qb, sb, k):
    n_p, d_p = _plane_params(pb, qb)
    h = jnp.dot(n_p, pa) - d_p
    depth = sa[0] - h
    point = pa - n_p * h
    return _pad_manifold(point[None], (-n_p)[None], depth[None],
                         (depth > 0.0)[None], k)


# host constant (numpy, NOT jnp: module import must not initialize a backend)
import numpy as _np

_BOX_CORNERS = _np.array(
    [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
     for sz in (-1.0, 1.0)], _np.float32,
)  # (8, 3)


def _box_plane(pa, qa, sa, pb, qb, sb, k):
    n_p, d_p = _plane_params(pb, qb)
    ra = quat_m.to_matrix(qa)
    corners = pa + _mv(ra[None, :, :], _BOX_CORNERS * (0.5 * sa))   # (8, 3)
    depths = d_p - jnp.sum(corners * n_p, -1)
    valid = depths > 0.0
    normals = jnp.broadcast_to(-n_p, (8, 3))
    if k == 4:
        return _fold_manifold(corners, normals, depths, valid,
                              [7, 6, 5, 4])     # antipodal corners
    if k < 8:
        return _topk_manifold(corners, normals, depths, valid, k)
    return _pad_manifold(corners, normals, depths, valid, k)


def _fold_manifold(points, normals, depths, valid, pairing):
    """8-slot manifold → 4 slots by pairwise keep-the-better merge.

    ``pairing`` statically maps slot i (< 4) to its partner; for each pair
    the valid-and-deeper candidate survives. O(1) elementwise — no top_k
    sort network per pair instance. Pairings are chosen so the physically
    complete cases keep full support:

    * box-plane: antipodal corners (i, 7−i) — exactly one of each antipodal
      pair lies on the resting face, so all 4 face corners survive;
    * box-box face: clamped incident corner i with reference-rect corner i —
      the dominant stacking case has only the clamped corners valid.
    """
    i_lo = _np.arange(4)
    i_hi = _np.asarray(pairing)
    p_lo, p_hi = points[i_lo], points[i_hi]
    n_lo, n_hi = normals[i_lo], normals[i_hi]
    d_lo, d_hi = depths[i_lo], depths[i_hi]
    v_lo, v_hi = valid[i_lo], valid[i_hi]
    # prefer valid; among equal validity prefer deeper
    take_hi = (v_hi & ~v_lo) | (v_hi & v_lo & (d_hi > d_lo))
    return (
        jnp.where(take_hi[:, None], p_hi, p_lo),
        jnp.where(take_hi[:, None], n_hi, n_lo),
        jnp.where(take_hi, d_hi, d_lo),
        jnp.where(take_hi, v_hi, v_lo),
    )


def _topk_manifold(points, normals, depths, valid, k):
    """Keep the k deepest valid contacts of an 8-slot manifold.

    Selection via a one-hot matmul rather than fancy indexing — batched
    gathers are slow on TPU (see _sel)."""
    keys = jnp.where(valid, depths, -jnp.inf)
    top = jax.lax.top_k(keys, k)[1]                     # (k,)
    sel = (top[:, None] == jnp.arange(points.shape[0])[None, :]
           ).astype(points.dtype)                       # (k, 8)
    return (
        sel @ points,
        sel @ normals,
        sel @ depths,
        (sel @ valid.astype(points.dtype)) > 0.5,
    )


def _segment_endpoints(p, q, length):
    """World endpoints of a capsule's core segment (local Z axis)."""
    axis = quat_m.to_matrix(q)[:, 2]
    h = 0.5 * length
    return p - axis * h, p + axis * h, axis


def _closest_on_segment(a0, a1, p):
    d = a1 - a0
    t = jnp.dot(p - a0, d) / jnp.maximum(jnp.dot(d, d), _EPS)
    return a0 + jnp.clip(t, 0.0, 1.0) * d


def _segment_segment(p0, p1, q0, q1):
    """Closest points between segments [p0,p1] and [q0,q1] (branch-free)."""
    d1 = p1 - p0
    d2 = q1 - q0
    r = p0 - q0
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    f = jnp.dot(d2, r)
    c = jnp.dot(d1, r)
    b = jnp.dot(d1, d2)
    denom = a * e - b * b
    s = jnp.where(denom > _EPS, jnp.clip((b * f - c * e) / jnp.maximum(denom, _EPS), 0.0, 1.0), 0.0)
    t = (b * s + f) / jnp.maximum(e, _EPS)
    t_cl = jnp.clip(t, 0.0, 1.0)
    s = jnp.clip((b * t_cl - c) / jnp.maximum(a, _EPS), 0.0, 1.0)
    return p0 + s * d1, q0 + t_cl * d2


def _sphere_capsule(pa, qa, sa, pb, qb, sb, k):
    b0, b1, _ = _segment_endpoints(pb, qb, sb[1])
    closest = _closest_on_segment(b0, b1, pa)
    return _sphere_sphere(pa, qa, sa, closest, qb, sb, k)


def _capsule_capsule(pa, qa, sa, pb, qb, sb, k):
    """Closest-point contact, plus a second contact when the capsules are
    near-parallel (lying side by side needs two support points to be
    torsionally stable — ODE's dCollideCapsuleCapsule does the same)."""
    a0, a1, ax_a = _segment_endpoints(pa, qa, sa[1])
    b0, b1, ax_b = _segment_endpoints(pb, qb, sb[1])
    ca, cb = _segment_segment(a0, a1, b0, b1)
    p0, n0, d0, v0 = _sphere_sphere(ca, qa, sa, cb, qb, sb, 1)

    # parallel case: probe from the other end of capsule A's overlap range
    parallel = jnp.abs(jnp.dot(ax_a, ax_b)) > 0.999
    # endpoint of A farther from the first closest point, clamped onto B
    far_a = jnp.where(jnp.sum((ca - a0) ** 2) > jnp.sum((ca - a1) ** 2),
                      a0, a1)
    cb2 = _closest_on_segment(b0, b1, far_a)
    ca2 = _closest_on_segment(a0, a1, cb2)
    p1, n1, d1, v1 = _sphere_sphere(ca2, qa, sa, cb2, qb, sb, 1)
    # distinct-point check keeps the non-parallel case single-contact
    distinct = jnp.sum((ca2 - ca) ** 2) > 1e-8
    v1 = v1 & parallel & distinct

    return _pad_manifold(
        jnp.concatenate([p0, p1]), jnp.concatenate([n0, n1]),
        jnp.concatenate([d0, d1]), jnp.concatenate([v0, v1]), k)


def _capsule_plane(pa, qa, sa, pb, qb, sb, k):
    """Both cap spheres vs the plane → up to 2 contacts (stable lying pose)."""
    n_p, d_p = _plane_params(pb, qb)
    a0, a1, _ = _segment_endpoints(pa, qa, sa[1])
    r = sa[0]
    pts, nrms, deps, vals = [], [], [], []
    for e in (a0, a1):
        h = jnp.dot(n_p, e) - d_p
        depth = r - h
        pts.append(e - n_p * h)
        nrms.append(-n_p)
        deps.append(depth)
        vals.append(depth > 0.0)
    return _pad_manifold(jnp.stack(pts), jnp.stack(nrms),
                         jnp.stack(deps), jnp.stack(vals), k)


def _capsule_box(pa, qa, sa, pb, qb, sb, k):
    """Capsule vs box: cap-sphere tests at both endpoints plus the segment
    point closest to the box (3 candidate contacts, deduplicated by mask)."""
    rb = quat_m.to_matrix(qb)
    half = 0.5 * sb
    r = sa[0]
    a0, a1, _ = _segment_endpoints(pa, qa, sa[1])

    # point on segment closest to box center as the third probe
    mid = _closest_on_segment(a0, a1, pb)

    pts, nrms, deps, vals = [], [], [], []
    for probe in (a0, a1, mid):
        point, n, depth = _sphere_box_core(probe, r, pb, rb, half)
        pts.append(point)
        nrms.append(n)
        deps.append(depth)
        vals.append(depth > 0.0)
    pts = jnp.stack(pts)
    nrms = jnp.stack(nrms)
    deps = jnp.stack(deps)
    vals = jnp.stack(vals)
    # drop the mid probe when it coincides with an endpoint probe
    dup = (jnp.linalg.norm(mid - a0) < 1e-6) | (jnp.linalg.norm(mid - a1) < 1e-6)
    vals = vals.at[2].set(vals[2] & ~dup)
    return _pad_manifold(pts, nrms, deps, vals, k)


# ---------------------------------------------------------------------------
# Box-box: SAT + reference-face clipping (ODE dBoxBox structure)
# ---------------------------------------------------------------------------

def _clip_quad_to_rect(quad, hx, hy):
    """Exact Sutherland-Hodgman clip of a 2D quad against |x|≤hx, |y|≤hy
    (ODE dBoxBox's face clipping). Static shapes: vertex capacity 8 with a
    masked count. Dynamic per-vertex indexing makes this slow on TPU — it
    is the opt-in *conformance* manifold (``EngineConfig.exact_box_clip``);
    the throughput default is ``_face_candidates`` below.

    Returns (verts (8, 2), valid (8,)).
    """
    cap = 8
    verts = jnp.zeros((cap, 2), quad.dtype).at[:4].set(quad)
    count = jnp.asarray(4, jnp.int32)

    # planes: (a, b) with inside iff a*x + b*y <= limit
    planes = jnp.stack([
        jnp.array([1.0, 0.0], quad.dtype), jnp.array([-1.0, 0.0], quad.dtype),
        jnp.array([0.0, 1.0], quad.dtype), jnp.array([0.0, -1.0], quad.dtype),
    ])
    limits = jnp.stack([hx, hx, hy, hy])

    def clip_one(carry, plane_i):
        verts, count = carry
        ab = planes[plane_i]
        lim = limits[plane_i]

        def body(i, acc):
            out_v, out_n = acc
            cur = verts[i]
            nxt_i = jnp.where(i + 1 >= count, 0, i + 1)
            nxt = verts[nxt_i]
            in_cur = jnp.dot(ab, cur) <= lim
            in_nxt = jnp.dot(ab, nxt) <= lim
            live = i < count

            emit1 = live & in_cur                   # keep inside vertex
            out_v = out_v.at[jnp.where(emit1, out_n, cap)].set(cur, mode="drop")
            out_n = out_n + emit1.astype(jnp.int32)

            denom = jnp.dot(ab, nxt - cur)          # crossing → intersection
            t = (lim - jnp.dot(ab, cur)) / jnp.where(
                jnp.abs(denom) > _EPS, denom, 1.0)
            inter = cur + jnp.clip(t, 0.0, 1.0) * (nxt - cur)
            emit2 = live & (in_cur != in_nxt) & (jnp.abs(denom) > _EPS)
            out_v = out_v.at[jnp.where(emit2, out_n, cap)].set(inter, mode="drop")
            out_n = out_n + emit2.astype(jnp.int32)
            return out_v, out_n

        out0 = (jnp.zeros((cap + 1, 2), verts.dtype), jnp.asarray(0, jnp.int32))
        out_v, out_n = jax.lax.fori_loop(0, cap, body, out0)
        return (out_v[:cap], jnp.minimum(out_n, cap)), None

    (verts, count), _ = jax.lax.scan(clip_one, (verts, count), jnp.arange(4))
    return verts, jnp.arange(cap) < count


def _face_candidates(quad2d, hx, hy):
    """Branch-free face-face manifold candidates in reference-face coords.

    Instead of sequential Sutherland-Hodgman clipping (dynamic vertex
    counts → serialized scatters on TPU), emit a fixed 8-candidate set that
    covers the same resting configurations:

    * the 4 incident-face corners clamped into the reference rect — exact
      when the incident face lies inside the rect (small box on a big face,
      the dominant stacking case), boundary-projected otherwise;
    * the 4 reference-rect corners, valid when inside the incident quad
      (big box overhanging a small face).

    Fully vectorized; ≤8 valid points like ODE's dBoxBox manifold. A
    deviation from exact polygon clipping only in partially-overlapping
    edge regions, where clamped corners land on the rect boundary near the
    true intersection points (documented conformance deviation).

    Returns (points (8, 2), candidate_valid (8,)).
    """
    h = jnp.stack([hx, hy])
    clamped = jnp.clip(quad2d, -h, h)                      # (4, 2)

    sx = jnp.array([-1.0, 1.0, 1.0, -1.0], quad2d.dtype)
    sy = jnp.array([-1.0, -1.0, 1.0, 1.0], quad2d.dtype)
    rect = jnp.stack([sx * hx, sy * hy], axis=-1)          # (4, 2)

    # point-in-convex-quad: consistent sign of edge cross products
    q_next = jnp.roll(quad2d, -1, axis=0)                  # (4, 2)
    edges = q_next - quad2d                                # (4, 2)
    rel = rect[:, None, :] - quad2d[None, :, :]            # (4 rect, 4 edge, 2)
    cross = edges[None, :, 0] * rel[..., 1] - edges[None, :, 1] * rel[..., 0]
    inside = jnp.all(cross >= -1e-7, axis=-1) | jnp.all(cross <= 1e-7, axis=-1)

    points = jnp.concatenate([clamped, rect], axis=0)      # (8, 2)
    valid = jnp.concatenate([jnp.ones((4,), bool), inside])
    return points, valid


def _box_box(pa, qa, sa, pb, qb, sb, k, exact_clip: bool = False):
    """SAT over 15 axes, ODE axis-selection order and 1.05 face-preference
    fudge, then reference-face clipping (face case) or edge-edge closest
    point (edge case). Mirrors the structure of ODE's dBoxBox."""
    dtype = pa.dtype
    ra = quat_m.to_matrix(qa)
    rb = quat_m.to_matrix(qb)
    ha = 0.5 * sa
    hb = 0.5 * sb

    t_world = pb - pa
    t = _mtv(ra, t_world)                  # B center in A frame
    c = _mtm(ra, rb)                       # B orientation in A frame
    absc = jnp.abs(c) + 1e-6

    # --- face axes of A (A-frame unit axes) ---
    sep_a = jnp.abs(t) - (ha + absc @ hb)            # (3,) separation (<0 ⇒ overlap)
    # --- face axes of B ---
    t_b = c.T @ t
    sep_b = jnp.abs(t_b) - (hb + absc.T @ ha)        # (3,)

    # --- edge axes u = e_i × C[:, j], all 9 as one tensor computation ---
    eye = jnp.eye(3, dtype=dtype)
    cols = c.T                                        # (3 j, 3) columns of C
    # u[i, j] = e_i × C[:, j] → (3 i, 3 j, 3)
    u_all = jnp.cross(eye[:, None, :], cols[None, :, :])
    u_flat = u_all.reshape(9, 3)                      # (9, 3) in A frame
    norms = jnp.linalg.norm(u_flat, axis=-1)
    edge_oks = norms > 1e-6
    edge_units = u_flat / jnp.maximum(norms, _EPS)[:, None]
    abs_un = jnp.abs(edge_units)
    # broadcast-sums, not (9,3)@(3,·) micro-matmuls: batched tiny
    # dot_generals are a measured hot spot on TPU
    proj_a = jnp.sum(abs_un * ha[None, :], axis=1)    # (9,)
    un_in_b = jnp.sum(edge_units[:, :, None] * c[None, :, :], axis=1)
    proj_b = jnp.sum(jnp.abs(un_in_b) * hb[None, :], axis=1)
    edge_seps = jnp.abs(jnp.sum(edge_units * t[None, :], axis=1)) - (proj_a + proj_b)

    all_seps = jnp.concatenate([sep_a, sep_b, jnp.where(edge_oks, edge_seps, -jnp.inf)])
    separated = jnp.max(all_seps) > 0.0

    # ODE-style sequential axis choice: larger separation wins; edge axes
    # must beat the best face separation by the 1.05 fudge factor.
    fudge = 1.05
    best_face_sep = jnp.max(jnp.concatenate([sep_a, sep_b]))
    best_face_code = jnp.argmax(jnp.concatenate([sep_a, sep_b]))
    edge_adj = jnp.where(edge_oks, edge_seps * jnp.where(edge_seps < 0, 1.0 / fudge, fudge), -jnp.inf)
    best_edge_idx = jnp.argmax(edge_adj)
    use_edge = _sel(edge_adj, best_edge_idx) > best_face_sep

    # --------------------------- edge-edge case ---------------------------
    u_a = _sel_row(edge_units, best_edge_idx)         # axis in A frame
    sign_e = jnp.where(jnp.dot(u_a, t) >= 0.0, 1.0, -1.0)
    n_a = u_a * sign_e                                # from A toward B, A frame
    n_world_edge = _mv(ra, n_a)
    ei = best_edge_idx // 3                           # edge direction index on A
    ej = best_edge_idx % 3                            # edge direction index on B
    oh_ei = _onehot(ei, 3, dtype)
    oh_ej = _onehot(ej, 3, dtype)
    ha_ei = jnp.sum(ha * oh_ei)
    hb_ej = jnp.sum(hb * oh_ej)

    # supporting edge on A: corner most along +n_a, direction e_{ei}
    sgn_a = jnp.where(n_a >= 0.0, 1.0, -1.0) * (1.0 - oh_ei)
    pa_sup = pa + _mv(ra, sgn_a * ha)
    da = _mv(ra, oh_ei)                               # column ei of ra
    a0 = pa_sup - da * ha_ei
    a1 = pa_sup + da * ha_ei

    n_b_frame = -_mtv(c, n_a)                         # from B toward A in B frame
    sgn_b = jnp.where(n_b_frame >= 0.0, 1.0, -1.0) * (1.0 - oh_ej)
    pb_sup = pb + _mv(rb, sgn_b * hb)
    db = _mv(rb, oh_ej)
    b0 = pb_sup - db * hb_ej
    b1 = pb_sup + db * hb_ej

    ca, cb = _segment_segment(a0, a1, b0, b1)
    edge_point = 0.5 * (ca + cb)
    edge_depth = -_sel(edge_seps, best_edge_idx)

    # --------------------------- face case --------------------------------
    # Reference box R (owns the face), incident box I.
    face_is_a = best_face_code < 3
    axis_idx = jnp.where(face_is_a, best_face_code, best_face_code - 3)

    r_ref = jnp.where(face_is_a, ra, rb)
    r_inc = jnp.where(face_is_a, rb, ra)
    p_ref = jnp.where(face_is_a, pa, pb)
    p_inc = jnp.where(face_is_a, pb, pa)
    h_ref = jnp.where(face_is_a, ha, hb)
    h_inc = jnp.where(face_is_a, hb, ha)

    # face normal on reference box pointing toward the incident box
    axes_ref = r_ref.T                                 # rows = world axes of ref
    n_ref_raw = _sel_row(axes_ref, axis_idx)
    to_inc = p_inc - p_ref
    sign_f = jnp.where(jnp.dot(n_ref_raw, to_inc) >= 0.0, 1.0, -1.0)
    n_ref = n_ref_raw * sign_f                         # world, ref → inc
    # contact normal must point A→B
    n_world_face = jnp.where(face_is_a, n_ref, -n_ref)

    # build the reference-face in-plane basis (the other two axes)
    idx0 = jnp.where(axis_idx == 0, 1, 0)
    idx1 = jnp.where(axis_idx == 2, 1, 2)
    u0 = _sel_row(axes_ref, idx0)
    u1 = _sel_row(axes_ref, idx1)
    hu0 = _sel(h_ref, idx0)
    hu1 = _sel(h_ref, idx1)
    face_center = p_ref + n_ref * _sel(h_ref, axis_idx)

    # incident face: the incident-box axis most anti-parallel to n_ref
    axes_inc = r_inc.T
    align = _mv(axes_inc, n_ref)                       # (3,)
    inc_axis = jnp.argmax(jnp.abs(align))
    align_inc = _sel(align, inc_axis)
    inc_sign = -jnp.sign(align_inc)                    # face whose normal opposes n_ref
    inc_axis_vec = _sel_row(axes_inc, inc_axis)
    h_inc_ax = _sel(h_inc, inc_axis)
    inc_center = p_inc + inc_axis_vec * inc_sign * h_inc_ax
    j0 = jnp.where(inc_axis == 0, 1, 0)
    j1 = jnp.where(inc_axis == 2, 1, 2)
    v0 = _sel_row(axes_inc, j0) * _sel(h_inc, j0)
    v1 = _sel_row(axes_inc, j1) * _sel(h_inc, j1)
    quad_world = jnp.stack([
        inc_center + v0 + v1,
        inc_center + v0 - v1,
        inc_center - v0 - v1,
        inc_center - v0 + v1,
    ])                                                  # (4, 3)

    # project incident quad onto the reference face plane coordinates
    rel = quad_world - face_center
    quad2d = jnp.stack([jnp.sum(rel * u0, -1), jnp.sum(rel * u1, -1)], axis=-1)   # (4, 2)

    if exact_clip:
        verts2d, cand_valid = _clip_quad_to_rect(quad2d, hu0, hu1)
    else:
        verts2d, cand_valid = _face_candidates(quad2d, hu0, hu1)

    # lift back to 3D on the *incident* face plane to compute depth
    # depth of a candidate = distance of the corresponding incident-face
    # point below the reference face.
    inc_n = inc_axis_vec * inc_sign                     # incident face normal (world)
    denom = jnp.dot(inc_n, n_ref)
    # point on incident face with in-plane coords (x, y):
    # p = face_center + x*u0 + y*u1 + z*n_ref, where z solves the incident plane
    d_inc = jnp.dot(inc_n, inc_center)

    base = face_center + verts2d[:, 0:1] * u0 + verts2d[:, 1:2] * u1  # (8, 3)
    z = (d_inc - jnp.sum(base * inc_n, -1)) / jnp.where(jnp.abs(denom) > 1e-6, denom, 1.0)
    lifted = base + z[:, None] * n_ref
    depths_face = -z                                    # depth = -z (below face)
    valid_face = cand_valid & (depths_face > 0.0)
    # ODE places face-case contacts on the incident face, shifted halfway
    points_face = lifted - 0.5 * depths_face[..., None] * n_ref

    # --------------------------- combine ----------------------------------
    points = jnp.where(use_edge, jnp.broadcast_to(edge_point, (8, 3)), points_face)
    normals = jnp.broadcast_to(jnp.where(use_edge, n_world_edge, n_world_face), (8, 3))
    depths = jnp.where(use_edge,
                       jnp.concatenate([edge_depth[None], jnp.zeros(7, dtype)]),
                       depths_face)
    valid = jnp.where(use_edge,
                      jnp.concatenate([(edge_depth > 0.0)[None], jnp.zeros(7, bool)]),
                      valid_face)
    valid = valid & ~separated

    if k == 4:
        return _fold_manifold(points, normals, depths, valid,
                              [4, 5, 6, 7])     # clamped-corner i ↔ rect i
    if k < 8:
        return _topk_manifold(points, normals, depths, valid, k)
    return _pad_manifold(points, normals, depths, valid, k)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

# (type_a, type_b) → kernel, for canonical ordering type_a ≤ type_b
_PAIR_KERNELS = {
    (int(BodyType.SPHERE), int(BodyType.SPHERE)): _sphere_sphere,
    (int(BodyType.SPHERE), int(BodyType.BOX)): _sphere_box,
    (int(BodyType.SPHERE), int(BodyType.CAPSULE)): _sphere_capsule,
    (int(BodyType.SPHERE), int(BodyType.PLANE)): _sphere_plane,
    (int(BodyType.BOX), int(BodyType.BOX)): _box_box,   # exact_clip variant
                                                        # selected in
                                                        # _enabled_kernels
    (int(BodyType.BOX), int(BodyType.CAPSULE)): lambda pa, qa, sa, pb, qb, sb, k: _flip(_capsule_box(pb, qb, sb, pa, qa, sa, k)),
    (int(BodyType.BOX), int(BodyType.PLANE)): _box_plane,
    (int(BodyType.CAPSULE), int(BodyType.CAPSULE)): _capsule_capsule,
    (int(BodyType.CAPSULE), int(BodyType.PLANE)): _capsule_plane,
}


def _flip(manifold):
    points, normals, depths, valid = manifold
    return points, -normals, depths, valid


def _enabled_kernels(config: EngineConfig):
    """Pair-kernel table pruned by the config's static geometry
    capabilities — disabled types drop out of the compiled program."""
    import functools as _ft

    out = {}
    for (t1, t2), kernel in _PAIR_KERNELS.items():
        if not config.enable_capsules and int(BodyType.CAPSULE) in (t1, t2):
            continue
        if not config.enable_planes and int(BodyType.PLANE) in (t1, t2):
            continue
        if kernel is _box_box and config.exact_box_clip:
            kernel = _ft.partial(_box_box, exact_clip=True)
        out[(t1, t2)] = kernel
    return out


def collide_pair(pos_a, quat_a, type_a, size_a,
                 pos_b, quat_b, type_b, size_b, k: int,
                 kernels=None):
    """Contact manifold for one body pair (branch-free type dispatch).

    Canonicalizes so the lower type code is A (normals flipped back when
    swapped), evaluates every applicable kernel, selects by type mask.
    """
    swap = type_a > type_b
    pa = jnp.where(swap, pos_b, pos_a)
    pb = jnp.where(swap, pos_a, pos_b)
    qa = jnp.where(swap, quat_b, quat_a)
    qb = jnp.where(swap, quat_a, quat_b)
    sa = jnp.where(swap, size_b, size_a)
    sb = jnp.where(swap, size_a, size_b)
    ta = jnp.where(swap, type_b, type_a)
    tb = jnp.where(swap, type_a, type_b)

    points = jnp.zeros((k, 3), pos_a.dtype)
    normals = jnp.zeros((k, 3), pos_a.dtype)
    depths = jnp.zeros((k,), pos_a.dtype)
    valid = jnp.zeros((k,), bool)

    if kernels is None:
        kernels = _PAIR_KERNELS
    for (t1, t2), kernel in kernels.items():
        sel = (ta == t1) & (tb == t2)
        p, n, d, v = kernel(pa, qa, sa, pb, qb, sb, k)
        points = jnp.where(sel, p, points)
        normals = jnp.where(sel, n, normals)
        depths = jnp.where(sel, d, depths)
        valid = jnp.where(sel, v, valid)

    # un-swap: normal must point from (original) a toward b
    normals = jnp.where(swap, -normals, normals)
    return points, normals, depths, valid


# intrinsic manifold capacity per pair kernel (slots the kernel can
# actually populate) — the typed-bucket path allocates rows accordingly
# instead of padding every pair to the global K
_KERNEL_K = {
    (int(BodyType.SPHERE), int(BodyType.SPHERE)): 1,
    (int(BodyType.SPHERE), int(BodyType.BOX)): 1,
    (int(BodyType.SPHERE), int(BodyType.CAPSULE)): 1,
    (int(BodyType.SPHERE), int(BodyType.PLANE)): 1,
    (int(BodyType.BOX), int(BodyType.BOX)): 8,
    (int(BodyType.BOX), int(BodyType.CAPSULE)): 3,
    (int(BodyType.BOX), int(BodyType.PLANE)): 8,
    (int(BodyType.CAPSULE), int(BodyType.CAPSULE)): 2,
    (int(BodyType.CAPSULE), int(BodyType.PLANE)): 2,
}


def _pair_eligibility(state: WorldState, exclude=None):
    """(N, N) broadphase eligibility mask (same tests as
    ops.broadphase.broadphase) plus canonical per-pair type codes."""
    from rl_ode_physics_tpu.ops.broadphase import compute_aabbs

    n = state.num_slots
    aabb = compute_aabbs(state)
    lo, hi = aabb[..., 0, :], aabb[..., 1, :]
    overlap = jnp.all(
        (lo[:, None, :] <= hi[None, :, :]) & (lo[None, :, :] <= hi[:, None, :]),
        axis=-1)
    cat, col = state.category, state.collide
    mask_ok = (((cat[:, None] & col[None, :]) != 0)
               | ((cat[None, :] & col[:, None]) != 0))
    active = state.active
    movable = state.inv_mass > 0
    not_mesh = state.body_type != BodyType.TRIMESH
    upper = (jnp.arange(n)[:, None] < jnp.arange(n)[None, :])
    hit = (overlap & mask_ok & (active[:, None] & active[None, :])
           & (movable[:, None] | movable[None, :])
           & (not_mesh[:, None] & not_mesh[None, :]) & upper)
    if exclude is not None:
        hit = hit & ~exclude      # joint-connected pairs (dAreConnected)
    t = state.body_type
    tmin = jnp.minimum(t[:, None], t[None, :])
    tmax = jnp.maximum(t[:, None], t[None, :])
    return hit, tmin, tmax


def narrowphase_typed(state: WorldState, config: EngineConfig,
                      extra=None, exclude=None) -> Contacts:
    """Typed-bucket narrowphase: one compacted candidate list PER pair-type,
    each running ONLY its own kernel with its intrinsic manifold size.

    The classic path (``narrowphase``) evaluates every enabled pair kernel
    on every candidate and mask-selects — simple, but a mixed scene pays
    box-box SAT on its sphere-sphere pairs and pads every manifold to the
    global K. Bucketing removes both costs (round-2 profile: narrowphase
    ≈ 1/3 of the substep). Trade-off: contact rows come out grouped by
    bucket rather than in global pair order, so this is the *throughput*
    path (Jacobi — order-independent math); conformance runs (PGS
    row-order parity with the referee) keep the classic path. Enabled via
    ``EngineConfig.typed_buckets``.

    When ``config.cm_narrowphase`` and every enabled bucket has a
    component-major kernel (ops/narrowphase_cm.py — the pairs-in-lanes
    layout, round-4 machinery fix), the CM twin runs instead; this
    row-major body is the fallback and the layout-A/B reference.
    """
    if config.cm_narrowphase:
        from rl_ode_physics_tpu.ops import narrowphase_cm
        if narrowphase_cm.supports_cm(config):
            return narrowphase_cm.narrowphase_typed_cm(
                state, config, extra, exclude)
    if config.sap_window:
        raise ValueError(
            "sap_window is implemented in the component-major typed path "
            "only; this config falls back to the row-major narrowphase "
            "(exact_box_clip or an un-CM-able manifold size) — disable "
            "sap_window or remove the fallback-forcing option.")
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

    hit, tmin, tmax = _pair_eligibility(state, exclude)
    hit_flat = hit.reshape(n * n)
    tmin_f = tmin.reshape(n * n)
    tmax_f = tmax.reshape(n * n)

    sel_dt = jnp.dtype(config.selector_dtype)
    if sel_dt == jnp.bfloat16 and n > 256:
        raise ValueError(
            "selector_dtype='bfloat16' requires max_bodies <= 256 (body "
            "slot ids ride the selector matmuls and must be bf16-exact)")

    feats = jnp.concatenate([
        state.pos, state.quat, state.size,
        state.body_type.astype(f)[:, None],
    ], axis=-1).astype(sel_dt)                         # (N, 11)
    cols = jnp.arange(n, dtype=jnp.int32)

    from rl_ode_physics_tpu.ops.compaction import compact_rows_t

    # ---- closed-form bucket pair compaction (round-3) -------------------
    # The generic rank-select (`compact_mask`) answers "which source index
    # holds output rank c" with a two-level block *search* — the round-3
    # profile showed that search machinery (block one-hots, cumsum-row
    # matmul, position compare) as the single largest substep cost
    # (~0.9 ms @2048). On the (N, N) pair grid the search has a CLOSED
    # FORM: output rank c lives in row i iff rowoff[i] <= c <
    # rowoff[i] + rowcnt[i] (rowoff = exclusive cumsum of per-row hit
    # counts) — two broadcast compares build the exact A-side one-hot
    # directly, and the column follows from one within-row-cumsum lookup.
    # Buckets are PADDED to a common capacity P so every stage is one
    # batched (G, P, N) op; per-bucket rows are leading-dim slices (free).
    # (A first cut folded the within-cumsums into the feature matmul as a
    # (S, 11+G·N) output and sliced them back out — minor-dim slicing of
    # that wide output cost ~6 ms/substep @2048 in layout copies. Keep
    # every intermediate (G, P, N)-shaped and slice leading dims only.)
    kernels = list(_enabled_kernels(config).items())
    caps = [config.bucket_capacity(t1, t2) for (t1, t2), _ in kernels]
    g = len(kernels)
    p_cap = max(caps)
    hit2d = hit_flat.reshape(n, n)
    tmin2d, tmax2d = tmin_f.reshape(n, n), tmax_f.reshape(n, n)
    masks_l = [hit2d & (tmin2d == t1) & (tmax2d == t2)
               for (t1, t2), _ in kernels]              # G × (N, N)
    # PER-BUCKET within-row cumsums, directly in the selector dtype
    # (values <= N <= 256 are exact in bf16). Layout history (round 3):
    # the (G, N, N)-stacked cumsum fed to per-bucket dots copied the whole
    # stack (~0.32 ms/substep @2048); per-bucket cumsums still copy their
    # outputs but measure fastest end-to-end (37.6M vs 36.3M for a
    # triangular-ones MXU matmul that avoids the copies — the matmul costs
    # more than the copies it removes).
    within_l = [jnp.cumsum(m.astype(sel_dt), axis=1) for m in masks_l]
    rowcnt = jnp.stack([w[:, -1] for w in within_l]).astype(jnp.int32)
    rowoff = jnp.cumsum(rowcnt, axis=1) - rowcnt             # exclusive
    total3 = jnp.sum(rowcnt, axis=1)                         # (G,)
    caps_a = jnp.asarray(caps, jnp.int32)

    c_loc = jnp.arange(p_cap, dtype=jnp.int32)               # (P,)
    bvalid3 = c_loc[None, :] < jnp.minimum(total3, caps_a)[:, None]
    # The containing row of output rank p is the first row whose INCLUSIVE
    # offset (endoff = rowoff + rowcnt) exceeds p: ia3 = #{i: endoff[i] <=
    # p}. Empty rows carry endoff == their rowoff and are counted iff they
    # sit before the containing row — exactly right. One shared (G, P, N)
    # compare feeds both the row index and its pair offset (the previous
    # form materialized a full range one-hot in f32 TWICE for two separate
    # multiply-reduces — 0.6 ms/substep @2048):
    #   ia3 = sum(le)        roff3 = sum(rowcnt * le)
    # (integer side-channels stay on the VPU in i32/f32 — at TPU default
    # matmul precision the MXU rounds f32 operands to bf16, which corrupts
    # integers > 256; row offsets reach N²/2)
    endoff = rowoff + rowcnt                                 # (G, N)
    le3 = endoff[:, None, :] <= c_loc[None, :, None]         # (G, P, N)
    ia3 = jnp.sum(le3.astype(jnp.int32), axis=-1)            # (G, P)
    roff3 = jnp.sum(le3.astype(f) * rowcnt.astype(f)[:, None, :], axis=-1)
    r_resid3 = c_loc.astype(f)[None, :] - roff3              # in-row rank
    ia3 = jnp.minimum(ia3, n - 1)

    # materialize the one-hot before the dots: letting XLA fuse the
    # compare producer into the dot operand turns the dots into one
    # giant VPU loop fusion (measured 0.69 ms/substep @2048 vs 0.03 ms for
    # the isolated MXU form)
    sa3_dt = jax.lax.optimization_barrier(
        (ia3[..., None] == cols[None, None, :]).astype(sel_dt))
    # features of the A body, per bucket: (P, N)·(N, 11)
    fa3 = jnp.stack([
        jnp.matmul(sa3_dt[gi], feats, preferred_element_type=f)
        for gi in range(g)
    ])                                                       # (G, P, 11)
    # gather each slot's within-row cumsum row, PER BUCKET (G unrolled):
    # the (G, ·, ·)-batched form of this dot materialized a layout copy of
    # its output (~0.32 ms/substep @2048, the largest narrowphase item);
    # three 2-D (P, N)·(N, N) dots land in natural layouts. fa3/fb3 stay
    # batched (their outputs showed no copies). Cumsum values <= N <= 256
    # are exact even in bf16.
    ib3 = jnp.stack([
        jnp.sum((jnp.matmul(sa3_dt[gi], within_l[gi],
                            preferred_element_type=sel_dt)
                 <= r_resid3[gi, :, None]).astype(jnp.int32), axis=-1)
        for gi in range(g)
    ])                                                       # (G, P)
    ia3 = jnp.where(bvalid3, ia3, 0)
    ib3 = jnp.where(bvalid3, jnp.minimum(ib3, n - 1), 0)
    oh_b3 = (ib3[..., None] == cols[None, None, :]).astype(sel_dt)
    fb3 = jnp.stack([
        jnp.matmul(oh_b3[gi], feats, preferred_element_type=f)
        for gi in range(g)
    ])                                                       # (G, P, 11)

    packed_parts, valid_parts = [], []
    total_pairs = jnp.sum(jnp.minimum(total3, jnp.asarray(caps, jnp.int32)))
    pair_overflow = jnp.sum(
        jnp.maximum(total3 - jnp.asarray(caps, jnp.int32), 0))
    for gi, ((t1, t2), kernel) in enumerate(kernels):
        cp_b = caps[gi]
        k_b = min(_KERNEL_K[(t1, t2)], k_glob)
        fa, fb = fa3[gi, :cp_b], fb3[gi, :cp_b]
        ia, ib, bvalid = ia3[gi, :cp_b], ib3[gi, :cp_b], bvalid3[gi, :cp_b]
        # slice the 11-wide feature rows INSIDE the vmapped kernel: outer
        # minor-dim slices of the padded (P, 11) dot outputs materialize
        # as layout copies (~0.3 ms/substep @2048); per-row (11,) slices
        # fuse into the collide kernel for free
        points, normals, depths, valid = jax.vmap(
            lambda ra, rb: collide_pair(
                ra[0:3], ra[3:7], ra[10].astype(jnp.int32), ra[7:10],
                rb[0:3], rb[3:7], rb[10].astype(jnp.int32), rb[7:10],
                k_b, {(t1, t2): kernel})
        )(fa, fb)
        valid = valid & bvalid[:, None]

        # component-major payload part (10, cp_b*k_b): body ids and the
        # manifold slot ride as exact small ints; the warm-start key is
        # recomputed in int32 AFTER compaction (an f32/bf16 key column
        # would silently round above 2^24 / 2^8)
        mk = cp_b * k_b
        slot_k = jnp.tile(jnp.arange(k_b, dtype=jnp.int32), cp_b)
        # (a per-component slice+stack variant of this transpose measured
        # 1% SLOWER end-to-end — the .T form stays)
        packed_parts.append(jnp.concatenate([
            points.reshape(mk, 3).T,
            normals.reshape(mk, 3).T,
            depths.reshape(1, mk),
            jnp.repeat(ia, k_b).astype(f)[None],
            jnp.repeat(ib, k_b).astype(f)[None],
            slot_k.astype(f)[None],
        ], axis=0))                                     # (10, mk)
        valid_parts.append(valid.reshape(mk))

    packed_t = jnp.concatenate(packed_parts, axis=1)    # (10, M)
    flat_valid = jnp.concatenate(valid_parts)

    if extra is not None:
        # mesh rows: slot −1 → key −1 = excluded from warm-start matching
        # (their buffer position is a deepest-k rank that reorders between
        # steps — see the note in `narrowphase`)
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
    if config.pallas_compaction and pallas_ok():
        # VMEM one-hot kernel (ops/compaction_pallas.py): bitwise-identical
        # to the jnp selector matmul. NOT the default — isolated it wins
        # 2.31 → 1.65 ms/2048 worlds, but end-to-end at chunk 128 it
        # measures 33.4 → 32.7M bs/s: the kernel boundary adds ops to a
        # dispatch-floor-bound program (docs/BENCHMARKS.md round-3 notes)
        rows_t, cvalid, count, overflow = compact_rows_t_pallas(
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
        overflow=overflow + pair_overflow,
        key=key,
    ), total_pairs


def narrowphase(state: WorldState, cand: PairCandidates,
                config: EngineConfig, extra=None) -> Contacts:
    """Run pair kernels on broadphase candidates; compact into contact rows.

    Two-stage static-shape pipeline (SURVEY.md §7 step 3): gather candidate
    pair bodies → vmapped manifold kernels (CP, K) → deterministic cumsum
    compaction into the (C,) solver buffer. Equivalent in role to the
    reference's NearCallback + dJointCreateContact loop
    (``src/main.c:674-693``), minus the pointer graph.
    """
    k = config.max_contacts_per_pair
    ccap = config.max_contacts
    ia, ib = cand.ia, cand.ib
    f = state.pos.dtype

    # pack per-body features so each side costs ONE gather, not four
    # (batched gathers have a high fixed cost on TPU)
    feats = jnp.concatenate([
        state.pos, state.quat, state.size,
        state.body_type.astype(f)[:, None],
    ], axis=-1)                                        # (N, 11)
    # candidate-side feature gathers as one-hot matmuls (XLA gathers at
    # (CP,)-indices are measured hot spots on TPU)
    n_slots = state.num_slots
    cols = jnp.arange(n_slots, dtype=jnp.int32)
    oh_a = (ia[:, None] == cols[None, :]).astype(f)    # (CP, N)
    oh_b = (ib[:, None] == cols[None, :]).astype(f)
    fa = jnp.matmul(oh_a, feats)
    fb = jnp.matmul(oh_b, feats)

    kernels = _enabled_kernels(config)
    points, normals, depths, valid = jax.vmap(
        lambda *args: collide_pair(*args, k, kernels)
    )(
        fa[:, 0:3], fa[:, 3:7], fa[:, 10].astype(jnp.int32), fa[:, 7:10],
        fb[:, 0:3], fb[:, 3:7], fb[:, 10].astype(jnp.int32), fb[:, 7:10],
    )
    valid = valid & cand.valid[:, None]

    # flatten (CP, K) → (CP*K,), pack, and compact to capacity C via
    # rank-select + one selector matmul (ops/compaction.py)
    cp = ia.shape[0]
    flat_valid = valid.reshape(cp * k)
    # stable row identity: pair_flat·K + manifold slot (ia < ib always, so
    # pair_flat = ia·N + ib names the pair across steps); exact in f32 up
    # to N²K < 2^24
    key_space = n_slots * n_slots * k
    if key_space >= 2 ** 24:
        raise ValueError(
            f"contact-key space {key_space} (max_bodies={n_slots}, K={k}) "
            f"exceeds f32 exact-integer range 2^24; warm-start keys packed "
            f"through the f32 payload would silently collide. Reduce "
            f"max_bodies or max_contacts_per_pair.")
    slot_k = jnp.tile(jnp.arange(k, dtype=jnp.int32), cp)
    keys = ((ia * n_slots + ib).repeat(k) * k + slot_k).astype(f)
    packed = jnp.concatenate([
        points.reshape(cp * k, 3),
        normals.reshape(cp * k, 3),
        depths.reshape(cp * k, 1),
        jnp.repeat(ia, k).astype(f)[:, None],
        jnp.repeat(ib, k).astype(f)[:, None],
        keys[:, None],
    ], axis=-1)                                        # (CP*K, 10)

    if extra is not None:
        # extra manifold source (e.g. trimesh narrowphase): flat arrays
        # (points, normals, depths, a, b, valid) appended before compaction.
        # Mesh rows carry key −1 (excluded from warm-start matching): their
        # buffer position is a deepest-k RANK, which reorders between steps
        # as depths change, so a positional key could re-apply a cached
        # impulse to a different physical contact. A stable feature id
        # (triangle index) is lost by the per-body dedup/rank stage;
        # until it is threaded through, mesh contacts always cold-start.
        e_pts, e_nrm, e_dep, e_a, e_b, e_val = extra
        e_keys = jnp.full((e_a.shape[0],), -1.0, f)
        e_packed = jnp.concatenate([
            e_pts, e_nrm, e_dep[:, None],
            e_a.astype(f)[:, None], e_b.astype(f)[:, None],
            e_keys[:, None],
        ], axis=-1)
        packed = jnp.concatenate([packed, e_packed], axis=0)
        flat_valid = jnp.concatenate([flat_valid, e_val])

    from rl_ode_physics_tpu.ops.compaction import compact_rows

    rows, cvalid, count, overflow = compact_rows(flat_valid, packed, ccap)
    return Contacts(
        point=rows[:, 0:3],
        normal=rows[:, 3:6],
        depth=rows[:, 6],
        a=rows[:, 7].astype(jnp.int32),
        b=rows[:, 8].astype(jnp.int32),
        valid=cvalid,
        count=count,
        overflow=overflow,
        key=jnp.where(cvalid, rows[:, 9].astype(jnp.int32), -1),
    )
