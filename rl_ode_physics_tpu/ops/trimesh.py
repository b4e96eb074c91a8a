"""Static-trimesh narrowphase (teapot workload, BASELINE config 3).

TPU-native replacement for ODE's trimesh collider (``dCreateTriMesh``; the
reference ships ``res/teapot.obj`` — 8,884 faces — as the intended trimesh
fixture, SURVEY.md §2c). Design:

* The mesh is *static scene geometry*: triangle data (v0, e1, e2, n, AABB)
  is precomputed host-side once and baked into the jitted step as constants
  (the TPU analog of ODE's prebuilt trimesh data object).
* Per dynamic body, the hot loop is a tiled sweep over all triangles:
  one CENTER probe per body rides the batched closest-point sweep →
  nearest candidate tiles → nearest candidate triangles → EXACT
  per-type narrowphase on those candidates. Static shapes throughout.
* All three primitive types collide exactly (round-2): spheres by
  closest-point-on-triangle; boxes by the dCollideBoxTriangle feature
  classes (corner-below-face, triangle-vertex-in-box, triangle-edge
  clipped to the box — ``box_tri_candidates``); capsules by exact
  segment-triangle closest features (``capsule_tri_candidate``). The
  round-1 probe-sphere decomposition is gone.
* A Pallas TPU kernel (``ops/pallas_kernels.py``) implements the
  sphere-vs-triangle-tile sweep for large meshes; this module's pure-jnp
  path is the reference implementation and the CPU/interpret fallback.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import BodyType, WorldState

_EPS = 1e-9


@struct.dataclass
class TriMesh:
    """Precomputed triangle soup (static, world frame)."""

    v0: jnp.ndarray       # (T, 3)
    e1: jnp.ndarray       # (T, 3) v1 - v0
    e2: jnp.ndarray       # (T, 3) v2 - v0
    normal: jnp.ndarray   # (T, 3) unit
    slot: jnp.ndarray     # () int32 — world body slot this mesh belongs to

    @property
    def num_tris(self) -> int:
        return self.v0.shape[0]


def build_trimesh(vertices, triangles, slot: int = 0,
                  dtype=jnp.float32, pad_to_multiple: int = 1024) -> TriMesh:
    """Host-side mesh bake: edges, normals, padding to a tile multiple
    (padded triangles are degenerate → never produce contacts)."""
    v = np.asarray(vertices, np.float64)
    t = np.asarray(triangles, np.int64)
    v0 = v[t[:, 0]]
    e1 = v[t[:, 1]] - v0
    e2 = v[t[:, 2]] - v0
    n = np.cross(e1, e2)
    norm = np.linalg.norm(n, axis=-1, keepdims=True)
    n = n / np.maximum(norm, 1e-30)

    tcount = v0.shape[0]
    pad = (-tcount) % pad_to_multiple
    if pad:
        zeros = np.zeros((pad, 3))
        far = np.full((pad, 3), 1e9)          # degenerate, far away
        v0 = np.concatenate([v0, far])
        e1 = np.concatenate([e1, zeros])
        e2 = np.concatenate([e2, zeros])
        n = np.concatenate([n, np.tile([[0.0, 1.0, 0.0]], (pad, 1))])

    return TriMesh(
        v0=jnp.asarray(v0, dtype),
        e1=jnp.asarray(e1, dtype),
        e2=jnp.asarray(e2, dtype),
        normal=jnp.asarray(n, dtype),
        slot=jnp.asarray(slot, jnp.int32),
    )


def _tri_vw(d1, d2, d3, d4, d5, d6):
    """Barycentric (v, w) of the closest point from Ericson's edge/vertex
    region dot products — shared by the jnp path and the Pallas kernel
    (which computes d1..d6 component-wise on (8, 128) blocks)."""
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_ab = d1 - d3
    v_ab = jnp.where(jnp.abs(denom_ab) > _EPS, d1 / jnp.where(jnp.abs(denom_ab) > _EPS, denom_ab, 1.0), 0.0)
    denom_ac = d2 - d6
    w_ac = jnp.where(jnp.abs(denom_ac) > _EPS, d2 / jnp.where(jnp.abs(denom_ac) > _EPS, denom_ac, 1.0), 0.0)
    denom_bc = (d4 - d3) + (d5 - d6)
    w_bc = (d4 - d3) / jnp.where(jnp.abs(denom_bc) > _EPS, denom_bc, 1.0)

    denom_in = va + vb + vc
    v_in = vb / jnp.where(jnp.abs(denom_in) > _EPS, denom_in, 1.0)
    w_in = vc / jnp.where(jnp.abs(denom_in) > _EPS, denom_in, 1.0)

    # region masks (checked in Ericson's order; first match wins)
    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    v = v_in
    w = w_in
    v = jnp.where(on_bc, 1.0 - jnp.clip(w_bc, 0.0, 1.0), v)
    w = jnp.where(on_bc, jnp.clip(w_bc, 0.0, 1.0), w)
    v = jnp.where(on_ac, 0.0, v)
    w = jnp.where(on_ac, jnp.clip(w_ac, 0.0, 1.0), w)
    v = jnp.where(on_ab, jnp.clip(v_ab, 0.0, 1.0), v)
    w = jnp.where(on_ab, 0.0, w)
    v = jnp.where(in_c, 0.0, v)
    w = jnp.where(in_c, 1.0, w)
    v = jnp.where(in_b, 1.0, v)
    w = jnp.where(in_b, 0.0, w)
    v = jnp.where(in_a, 0.0, v)
    w = jnp.where(in_a, 0.0, w)

    return v, w


def closest_point_triangle(p, v0, e1, e2):
    """Branch-free closest point on triangle(s) to point(s).

    Ericson's real-time-collision-detection formulation with all region
    branches folded into ``where`` selects — identical math per lane, so it
    vectorizes over (T,) triangles cleanly.
    """
    ap = p - v0
    d1 = jnp.sum(e1 * ap, -1)
    d2 = jnp.sum(e2 * ap, -1)

    bp = p - (v0 + e1)
    d3 = jnp.sum(e1 * bp, -1)
    d4 = jnp.sum(e2 * bp, -1)

    cp_ = p - (v0 + e2)
    d5 = jnp.sum(e1 * cp_, -1)
    d6 = jnp.sum(e2 * cp_, -1)

    v, w = _tri_vw(d1, d2, d3, d4, d5, d6)
    return v0 + v[..., None] * e1 + w[..., None] * e2


MESH_TILE = 128


def sphere_mesh_contacts(center, radius, mesh: TriMesh, k: int,
                         use_pallas: bool = False):
    """Deepest-k contacts of one probe sphere vs the whole mesh.

    Two-level reduction with identical semantics on both paths:

    1. squared closest-point distance for every triangle, tiled
       (T/128, 128) — Pallas kernel (``ops.pallas_kernels.sphere_mesh_d2``)
       or plain jnp;
    2. per-tile minimum → cross-tile ``top_k`` → K candidate tiles
       (spatially diverse since tiles follow mesh ordering);
    3. exact contact points recomputed *only* for the K winning tiles
       (K×128 triangles instead of T).

    Returns (points (k,3), normals (k,3) sphere→mesh, depths (k,), valid).
    Deterministic: per-tile argmin and top_k tie-break by first index.
    """
    dtype = center.dtype
    t = mesh.num_tris
    nt = t // MESH_TILE

    if use_pallas:
        from rl_ode_physics_tpu.ops.pallas_kernels import sphere_mesh_d2
        d2_t = sphere_mesh_d2(center, mesh.v0.T, mesh.e1.T, mesh.e2.T)
    else:
        closest = closest_point_triangle(center, mesh.v0, mesh.e1, mesh.e2)
        d2_t = jnp.sum((closest - center) ** 2, -1).reshape(nt, MESH_TILE)

    tile_d2 = jnp.min(d2_t, axis=1)                             # (nt,)
    depth = radius - jnp.sqrt(jnp.maximum(tile_d2, 0.0))
    keys = jnp.where(depth > 0, depth, -jnp.inf)
    if k > nt:  # tiny meshes: fewer tiles than requested contacts
        keys = jnp.concatenate([keys, jnp.full((k - nt,), -jnp.inf, keys.dtype)])
    top_d, top_i = jax.lax.top_k(keys, k)
    sel = (top_i[:, None] == jnp.arange(nt)[None, :]).astype(dtype)  # (k, nt)

    # re-derive exact closest points for the k winning tiles only
    v0_k = (sel @ mesh.v0.reshape(nt, MESH_TILE * 3)).reshape(k, MESH_TILE, 3)
    e1_k = (sel @ mesh.e1.reshape(nt, MESH_TILE * 3)).reshape(k, MESH_TILE, 3)
    e2_k = (sel @ mesh.e2.reshape(nt, MESH_TILE * 3)).reshape(k, MESH_TILE, 3)
    closest_k = closest_point_triangle(center, v0_k, e1_k, e2_k)  # (k, 128, 3)
    d2_k = jnp.sum((closest_k - center) ** 2, -1)                 # (k, 128)
    best = jnp.argmin(d2_k, axis=1)
    oh = (jnp.arange(MESH_TILE)[None, :] == best[:, None]).astype(dtype)
    pts = jnp.sum(closest_k * oh[..., None], axis=1)              # (k, 3)

    n_dir = pts - center                                       # sphere → mesh
    n_len = jnp.linalg.norm(n_dir, axis=-1, keepdims=True)
    up = jnp.asarray([0.0, 1.0, 0.0], dtype)
    # center exactly on a surface point: deterministic up fallback
    n_out = jnp.where(n_len > 1e-6, n_dir / jnp.maximum(n_len, _EPS), -up)
    valid = jnp.isfinite(top_d) & (top_d > 0)
    return pts, n_out, jnp.where(valid, top_d, 0.0), valid


def _bary_uw(d, e1, e2, a11, a12, a22, det):
    """Barycentric (u along e1, w along e2) of the in-plane component of
    ``d`` (offset from v0). Valid whenever det > eps (non-degenerate tri);
    n-parallel components of d drop out because e1·n = e2·n = 0."""
    b1 = jnp.sum(e1 * d, -1)
    b2 = jnp.sum(e2 * d, -1)
    safe = jnp.where(jnp.abs(det) > _EPS, det, 1.0)
    u = (a22 * b1 - a12 * b2) / safe
    w = (a11 * b2 - a12 * b1) / safe
    return u, w, jnp.abs(det) > _EPS


def _min_face_exit(q, half, r_mat):
    """For a point ``q`` in box-local coords: depth to the nearest face,
    and that face's outward normal in world frame. (q assumed inside.)"""
    slack = half - jnp.abs(q)                      # (3,)
    axis = jnp.argmin(slack, -1)
    depth = jnp.min(slack, -1)
    oh = jax.nn.one_hot(axis, 3, dtype=q.dtype)
    sign = jnp.sign(jnp.sum(oh * q, -1))
    sign = jnp.where(sign == 0.0, 1.0, sign)
    n_world = (r_mat @ oh) * sign                  # column combination
    return depth, n_world


def box_tri_candidates(pos, r_mat, half, v0, e1, e2, n_tri):
    """Exact box-vs-triangle contact candidates (17 rows):

      0..7   box corners below the triangle plane with their projection
             inside the triangle (face contact; reproduces the box-plane
             support polygon on a coarse floor — equal corner depths);
      8..10  triangle vertices inside the box (depth/normal = nearest box
             face exit);
      11..16 triangle edges clipped to the box slabs: the two clipped
             endpoints per edge where clipping actually occurred (the
             unclipped endpoints are covered by rows 8..10).

    Replaces the round-1 probe-sphere approximation (corner skin margins);
    matches ODE's dCollideBoxTriangle contact classes (face / vertex /
    edge), re-derived branch-free. Normals point a→b = box→mesh.
    Returns (pts (17, 3), nrm (17, 3), dep (17,), valid (17,)).
    """
    f = pos.dtype
    a11 = jnp.sum(e1 * e1, -1)
    a12 = jnp.sum(e1 * e2, -1)
    a22 = jnp.sum(e2 * e2, -1)
    det = a11 * a22 - a12 * a12

    # double-sided mesh: orient the face normal toward the box center
    # (winding-independent, matching the sphere path's behavior)
    s_face = jnp.sign(jnp.sum((pos - v0) * n_tri, -1))
    s_face = jnp.where(s_face == 0.0, 1.0, s_face)
    n_f = n_tri * s_face

    # ---- corners below the triangle plane -------------------------------
    corners_unit = jnp.asarray(
        [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
         for sz in (-1.0, 1.0)], f)                          # (8, 3)
    corners = pos + (corners_unit * half) @ r_mat.T          # (8, 3) world
    h_c = jnp.sum((corners - v0) * n_f, -1)                  # signed height
    u, w, ok = _bary_uw(corners - v0, e1, e2, a11, a12, a22, det)
    eps = 1e-6
    inside_tri = ok & (u >= -eps) & (w >= -eps) & (u + w <= 1.0 + eps)
    dep_c = -h_c
    val_c = (dep_c > 0.0) & inside_tri
    nrm_c = jnp.broadcast_to(-n_f, (8, 3))

    # ---- triangle vertices inside the box -------------------------------
    tri_v = jnp.stack([v0, v0 + e1, v0 + e2])                # (3, 3)
    q_v = (tri_v - pos) @ r_mat                              # box local
    inside_box = jnp.all(jnp.abs(q_v) <= half + eps, -1)
    dep_v, nrm_v = jax.vmap(_min_face_exit, in_axes=(0, None, None))(
        q_v, half, r_mat)
    val_v = inside_box & (dep_v > 0.0)

    # ---- triangle edges clipped to the box ------------------------------
    e_starts = tri_v                                          # (3, 3)
    e_dirs = jnp.stack([e1, e2 - e1, -e2])                    # (3, 3) world

    def clip_edge(p_a, d):
        a = (p_a - pos) @ r_mat
        dl = d @ r_mat
        big = jnp.abs(dl) > _EPS
        d_safe = jnp.where(big, dl, 1.0)
        lo = (-half - a) / d_safe
        hi = (half - a) / d_safe
        t0i = jnp.where(big, jnp.minimum(lo, hi),
                        jnp.where(jnp.abs(a) <= half, 0.0, jnp.inf))
        t1i = jnp.where(big, jnp.maximum(lo, hi),
                        jnp.where(jnp.abs(a) <= half, 1.0, -jnp.inf))
        t0 = jnp.maximum(jnp.max(t0i), 0.0)
        t1 = jnp.minimum(jnp.min(t1i), 1.0)
        nonempty = t0 < t1
        out = []
        for t, was_clipped in ((t0, t0 > eps), (t1, t1 < 1.0 - eps)):
            q = a + t * dl
            dep, nrm = _min_face_exit(q, half, r_mat)
            out.append((p_a + t * d, nrm, dep,
                        nonempty & was_clipped & (dep > 0.0)))
        return out

    clip = [c for j in range(3)
            for c in clip_edge(e_starts[j], e_dirs[j])]       # 6 tuples

    pts = jnp.concatenate([corners, tri_v,
                           jnp.stack([c[0] for c in clip])])
    nrm = jnp.concatenate([nrm_c, nrm_v,
                           jnp.stack([c[1] for c in clip])])
    dep = jnp.concatenate([dep_c, dep_v,
                           jnp.stack([c[2] for c in clip])])
    val = jnp.concatenate([val_c, val_v,
                           jnp.stack([c[3] for c in clip])])
    return pts, nrm, dep, val


def _seg_seg_closest(p1, q1, p2, q2):
    """Closest points between segments [p1,q1] and [p2,q2] (Ericson 5.1.9,
    branch-free). Returns (c1, c2, d2)."""
    d1 = q1 - p1
    d2_ = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, -1)
    e = jnp.sum(d2_ * d2_, -1)
    fdot = jnp.sum(d2_ * r, -1)
    c = jnp.sum(d1 * r, -1)
    b = jnp.sum(d1 * d2_, -1)
    denom = a * e - b * b
    s = jnp.where(jnp.abs(denom) > _EPS,
                  jnp.clip((b * fdot - c * e)
                           / jnp.where(jnp.abs(denom) > _EPS, denom, 1.0),
                           0.0, 1.0),
                  0.0)
    e_safe = jnp.where(jnp.abs(e) > _EPS, e, 1.0)
    t = jnp.clip((b * s + fdot) / e_safe, 0.0, 1.0)
    a_safe = jnp.where(jnp.abs(a) > _EPS, a, 1.0)
    s = jnp.clip((b * t - c) / a_safe, 0.0, 1.0)
    c1 = p1 + s[..., None] * d1
    c2 = p2 + t[..., None] * d2_
    return c1, c2, jnp.sum((c1 - c2) ** 2, -1)


def capsule_tri_candidate(p0, p1, radius, v0, e1, e2, n_tri):
    """Exact capsule-core-segment vs triangle: the minimum over the
    complete closest-feature set (endpoint-face via closest-point-triangle,
    edge-edge for all three edges) plus the core-crosses-face case.
    Single deepest candidate per triangle (manifolds come from multiple
    triangles + the deepest-k merge). Returns (pt, nrm, dep, valid)."""
    f = p0.dtype
    cand_tri = []
    cand_core = []
    d2s = []
    for pe in (p0, p1):
        ct = closest_point_triangle(pe, v0[None], e1[None], e2[None])[0]
        cand_tri.append(ct)
        cand_core.append(pe)
        d2s.append(jnp.sum((ct - pe) ** 2, -1))
    tri_v = [v0, v0 + e1, v0 + e2]
    for j in range(3):
        ea, eb = tri_v[j], tri_v[(j + 1) % 3]
        c_core, c_edge, d2 = _seg_seg_closest(p0, p1, ea, eb)
        cand_core.append(c_core)
        cand_tri.append(c_edge)
        d2s.append(d2)
    d2_all = jnp.stack(d2s)                                   # (5,)
    best = jnp.argmin(d2_all)
    oh = jax.nn.one_hot(best, 5, dtype=f)
    pt_tri = jnp.sum(jnp.stack(cand_tri) * oh[:, None], 0)
    pt_core = jnp.sum(jnp.stack(cand_core) * oh[:, None], 0)
    dist = jnp.sqrt(jnp.maximum(jnp.min(d2_all), 0.0))

    # core crosses the triangle plane inside the triangle → contact depth r
    h0 = jnp.sum((p0 - v0) * n_tri, -1)
    h1 = jnp.sum((p1 - v0) * n_tri, -1)
    crossing = h0 * h1 < 0.0
    denom = jnp.where(jnp.abs(h0 - h1) > _EPS, h0 - h1, 1.0)
    tx = jnp.clip(h0 / denom, 0.0, 1.0)
    px = p0 + tx * (p1 - p0)
    a11 = jnp.sum(e1 * e1, -1)
    a12 = jnp.sum(e1 * e2, -1)
    a22 = jnp.sum(e2 * e2, -1)
    det = a11 * a22 - a12 * a12
    u, w, ok = _bary_uw(px - v0, e1, e2, a11, a12, a22, det)
    cross_in = crossing & ok & (u >= 0) & (w >= 0) & (u + w <= 1.0)

    dist = jnp.where(cross_in, 0.0, dist)
    pt_tri = jnp.where(cross_in, px, pt_tri)
    n_dir = pt_tri - pt_core
    n_len = jnp.linalg.norm(n_dir, axis=-1, keepdims=True)
    n_fallback = -n_tri * jnp.sign(jnp.where(jnp.abs(h0) > jnp.abs(h1),
                                             h0, h1))
    nrm = jnp.where(n_len > 1e-6, n_dir / jnp.maximum(n_len, _EPS),
                    n_fallback)
    dep = radius - dist
    return pt_tri, nrm, dep, dep > 0.0


def _dedup_deepest_k(pts, nrm, dep, val, k, dedup_r):
    """Greedy deepest-first manifold selection with near-duplicate
    suppression: adjacent mesh triangles emit the SAME contact for a shared
    vertex/edge feature, and unsuppressed duplicates would fill the K
    manifold with one physical point (point support → spurious tipping).
    k sequential argmax passes over (M,) lanes; deterministic (first index
    wins ties, so corner candidates beat equal-depth duplicates by order).
    """
    f = pts.dtype
    m = dep.shape[0]
    keys = jnp.where(val, dep, -jnp.inf)
    sel_pts, sel_nrm, sel_dep, sel_val = [], [], [], []
    r2 = dedup_r * dedup_r
    for _ in range(k):
        i = jnp.argmax(keys)
        oh = jax.nn.one_hot(i, m, dtype=f)
        p_i = oh @ pts
        ok = jnp.max(keys) > -jnp.inf
        sel_pts.append(p_i)
        sel_nrm.append(oh @ nrm)
        sel_dep.append(jnp.where(ok, oh @ dep, 0.0))
        sel_val.append(ok)
        near = jnp.sum((pts - p_i) ** 2, -1) < r2
        keys = jnp.where(near, -jnp.inf, keys)
    return (jnp.stack(sel_pts), jnp.stack(sel_nrm),
            jnp.stack(sel_dep), jnp.stack(sel_val))


CAND_TILES = 8      # phase-1: nearest mesh tiles per body (×128 triangles)
CAND_TRIS = 16      # phase-2: exact narrowphase triangles per body


def mesh_narrowphase(state: WorldState, mesh: TriMesh, config: EngineConfig,
                     contacts_per_body: int = 4, use_pallas: bool = False):
    """All dynamic bodies vs the static mesh → flat manifold arrays.

    Two-phase EXACT narrowphase (replaces the round-1 probe-sphere
    decomposition for boxes/capsules):

    1. cull: ONE center probe per body rides the batched triangle-tile
       sweep (Pallas kernel on TPU); the ``CAND_TILES`` nearest tiles →
       per-triangle center distances → the ``CAND_TRIS`` nearest candidate
       triangles per body;
    2. exact contacts per candidate triangle by body type:
       sphere — closest-point-on-triangle (as before);
       box    — ``box_tri_candidates`` (corner/vertex/edge classes, the
                dCollideBoxTriangle feature set);
       capsule— ``capsule_tri_candidate`` (exact segment-triangle
                closest features);
       then a deepest-first, duplicate-suppressed K-manifold per body
       (``_dedup_deepest_k`` — shared mesh features emit duplicates).

    Returns (points (N*k, 3), normals, depths, a, b, valid) ready to be
    concatenated with the primitive narrowphase output before compaction.
    Contact convention: body = a, mesh slot = b (normal a→b).

    Phase-1 probe placement (round 3 — closes the "long body bridging two
    mesh regions" gap): ``config.mesh_probes`` probes per body ride the
    tile sweep — the body CENTER plus, for boxes and capsules, the two
    LONG-AXIS EXTREMITIES (box: ±R·(half ⊙ onehot(argmax half)); capsule:
    ±axis·(h+r)). Tile and triangle candidate ranking take the MIN distance
    over a body's probes, so a long box spanning two separated ridges
    collects candidate triangles under BOTH ends instead of only under its
    middle (``tests/test_trimesh_exact.py::test_long_box_bridging_ridges``).
    ``mesh_probes=1`` restores the round-2 center-only behavior.
    """
    from rl_ode_physics_tpu.utils import quat as quat_m

    k = contacts_per_body
    n = state.num_slots
    dtype = state.pos.dtype
    t = mesh.num_tris
    nt = t // MESH_TILE
    kt = min(CAND_TILES, nt)
    ke = CAND_TRIS

    r_mat = quat_m.to_matrix(state.quat)                       # (N, 3, 3)
    half = 0.5 * state.size
    r_sph = state.size[:, 0]
    axis_z = r_mat[:, :, 2]
    h_cap = 0.5 * state.size[:, 1]

    btype = state.body_type
    is_sphere = btype == BodyType.SPHERE
    is_box = btype == BodyType.BOX
    is_capsule = btype == BodyType.CAPSULE

    # ---- phase 1: multi-probe tile distances ---------------------------
    centers = state.pos                                       # (N, 3)
    p_cnt = max(1, int(config.mesh_probes))
    if p_cnt > 1:
        # long-axis extremity offset per body (branch-free by type)
        ax_oh = jax.nn.one_hot(jnp.argmax(half, -1), 3, dtype=dtype)
        box_off = jnp.sum(r_mat * (half * ax_oh)[:, None, :], -1)  # (N, 3)
        cap_off = axis_z * (h_cap + r_sph)[:, None]
        off = jnp.where(is_box[:, None], box_off,
                        jnp.where(is_capsule[:, None], cap_off, 0.0))
        probes = jnp.stack(
            [centers, centers + off, centers - off], axis=1)   # (N, P, 3)
    else:
        probes = centers[:, None, :]
    flat_probes = probes.reshape(n * p_cnt, 3)
    pad = (-(n * p_cnt)) % 8
    flat_p = jnp.concatenate(
        [flat_probes, jnp.full((pad, 3), 1e9, dtype)]) if pad else flat_probes
    if use_pallas:
        from rl_ode_physics_tpu.ops.pallas_kernels import sphere_mesh_d2_tiles
        tile_d2_p = sphere_mesh_d2_tiles(flat_p, mesh.v0.T, mesh.e1.T,
                                         mesh.e2.T)[:n * p_cnt]
    else:
        closest = jax.vmap(
            lambda c: closest_point_triangle(c, mesh.v0, mesh.e1, mesh.e2)
        )(flat_probes)                                         # (NP, T, 3)
        d2 = jnp.sum((closest - flat_probes[:, None, :]) ** 2, -1)
        tile_d2_p = jnp.min(d2.reshape(n * p_cnt, nt, MESH_TILE), axis=-1)
    tile_d2 = jnp.min(tile_d2_p.reshape(n, p_cnt, nt), axis=1)  # (N, NT)

    _, top_tiles = jax.lax.top_k(-tile_d2, kt)                 # (N, kt)
    sel_t = (top_tiles[..., None] == jnp.arange(nt)[None, None, :]
             ).astype(dtype)                                   # (N, kt, NT)

    tri_feat = jnp.concatenate(
        [mesh.v0, mesh.e1, mesh.e2, mesh.normal], -1)          # (T, 12)
    feat_k = jnp.einsum(
        "pkt,td->pkd", sel_t, tri_feat.reshape(nt, MESH_TILE * 12)
    ).reshape(n, kt * MESH_TILE, 12)                           # (N, kt·128, 12)

    # per-triangle min-over-probes distance on the candidate tiles →
    # CAND_TRIS best (probe-min, like the tile ranking, so both ends of a
    # long body keep candidates)
    cl = jax.vmap(lambda ps, ft: jax.vmap(lambda c: closest_point_triangle(
        c, ft[:, 0:3], ft[:, 3:6], ft[:, 6:9]))(ps))(probes, feat_k)
    d2_tri = jnp.min(
        jnp.sum((cl - probes[:, :, None, :]) ** 2, -1), axis=1)  # (N, kt·128)
    _, top_tri = jax.lax.top_k(-d2_tri, ke)                    # (N, ke)
    sel_e = (top_tri[..., None]
             == jnp.arange(kt * MESH_TILE)[None, None, :]).astype(dtype)
    feat_e = jnp.einsum("pkm,pmd->pkd", sel_e, feat_k)         # (N, ke, 12)
    v0_e, e1_e = feat_e[..., 0:3], feat_e[..., 3:6]
    e2_e, n_e = feat_e[..., 6:9], feat_e[..., 9:12]

    # ---- phase 2: exact contacts per body type -------------------------
    cap_p0 = state.pos - axis_z * h_cap[:, None]
    cap_p1 = state.pos + axis_z * h_cap[:, None]

    parts_p, parts_n, parts_d, parts_v = [], [], [], []

    # sphere: exact closest point per candidate triangle
    cl_e = jax.vmap(lambda c, v0, e1, e2: closest_point_triangle(
        c, v0, e1, e2))(centers, v0_e, e1_e, e2_e)             # (N, ke, 3)
    d_s = jnp.linalg.norm(cl_e - centers[:, None, :], axis=-1)
    nd = cl_e - centers[:, None, :]
    nl = jnp.linalg.norm(nd, axis=-1, keepdims=True)
    up = jnp.asarray([0.0, 1.0, 0.0], dtype)
    nrm_s = jnp.where(nl > 1e-6, nd / jnp.maximum(nl, _EPS), -up)
    dep_s = r_sph[:, None] - d_s
    parts_p.append(cl_e)
    parts_n.append(nrm_s)
    parts_d.append(dep_s)
    parts_v.append((dep_s > 0.0) & is_sphere[:, None])

    # box: 17 candidates per triangle
    bp, bn, bd, bv = jax.vmap(jax.vmap(
        box_tri_candidates, in_axes=(None, None, None, 0, 0, 0, 0)),
        in_axes=(0, 0, 0, 0, 0, 0, 0))(
        state.pos, r_mat, half, v0_e, e1_e, e2_e, n_e)  # (N, ke, 17, …)
    # class-major flatten (corners of ALL triangles first, then vertex,
    # then edge-clip classes): the deepest-first selection breaks ties by
    # index, so face-support corners win over equal-depth interior mesh
    # vertices — the manifold reproduces the box-plane support polygon
    parts_p.append(jnp.swapaxes(bp, 1, 2).reshape(n, ke * 17, 3))
    parts_n.append(jnp.swapaxes(bn, 1, 2).reshape(n, ke * 17, 3))
    parts_d.append(jnp.swapaxes(bd, 1, 2).reshape(n, ke * 17))
    parts_v.append(jnp.swapaxes(bv, 1, 2).reshape(n, ke * 17)
                   & is_box[:, None])

    # capsule: one exact candidate per triangle
    if config.enable_capsules:
        cp, cn, cd, cv = jax.vmap(jax.vmap(
            capsule_tri_candidate, in_axes=(None, None, None, 0, 0, 0, 0)),
            in_axes=(0, 0, 0, 0, 0, 0, 0))(
            cap_p0, cap_p1, r_sph, v0_e, e1_e, e2_e, n_e)
        parts_p.append(cp)
        parts_n.append(cn)
        parts_d.append(cd)
        parts_v.append(cv & is_capsule[:, None])

    all_p = jnp.concatenate(parts_p, axis=1)
    all_n = jnp.concatenate(parts_n, axis=1)
    all_d = jnp.concatenate(parts_d, axis=1)
    all_v = jnp.concatenate(parts_v, axis=1)
    # sanitize: invalid rows may carry ±inf (slab clips, padded triangles);
    # one-hot selection matmuls would turn 0·inf into NaN
    all_v = (all_v & jnp.isfinite(all_d)
             & jnp.all(jnp.isfinite(all_p), -1)
             & jnp.all(jnp.isfinite(all_n), -1))
    all_d = jnp.where(all_v, all_d, 0.0)
    all_p = jnp.where(all_v[..., None], all_p, 0.0)
    all_n = jnp.where(all_v[..., None], all_n, 0.0)

    # per-body duplicate-suppressed deepest-k manifold; dedup radius scales
    # with body size (shared mesh features repeat across adjacent triangles)
    char = jnp.where(is_sphere | is_capsule, r_sph,
                     jnp.min(half, axis=-1))
    dedup_r = jnp.maximum(0.25 * char, 1e-4)
    pts_f, nrm_f, dep_f, val_f = jax.vmap(
        _dedup_deepest_k, in_axes=(0, 0, 0, 0, None, 0))(
        all_p, all_n, all_d, all_v, k, dedup_r)

    eligible = (state.active & ~state.is_static
                & (state.inv_mass > 0))[:, None]
    val_f = val_f & eligible

    a = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    b = jnp.full((n * k,), mesh.slot, jnp.int32)
    return (pts_f.reshape(n * k, 3), nrm_f.reshape(n * k, 3),
            dep_f.reshape(n * k), a, b, val_f.reshape(n * k))
