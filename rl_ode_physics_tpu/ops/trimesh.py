"""Static-trimesh narrowphase (teapot workload, BASELINE config 3).

TPU-native replacement for ODE's trimesh collider (``dCreateTriMesh``; the
reference ships ``res/teapot.obj`` — 8,884 faces — as the intended trimesh
fixture, SURVEY.md §2c). Design:

* The mesh is *static scene geometry*: triangle data (v0, e1, e2, n, AABB)
  is precomputed host-side once and baked into the jitted step as constants
  (the TPU analog of ODE's prebuilt trimesh data object).
* Per dynamic body, the hot loop is a tiled sweep over all triangles:
  closest-point-on-triangle (branch-free barycentric clamping) → per-tile
  deepest hit → cross-tile ``top_k`` for a fixed K-contact manifold. Static
  shapes throughout; one body can touch at most K triangles per step
  (deterministic deepest-first selection).
* Spheres collide exactly; capsules via ``S`` sample spheres along the core
  segment; boxes via their 8 corners + center as probe spheres (corner
  radius = a skin margin) — a documented approximation (exact box-tri SAT
  is a later refinement).
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


def body_mesh_contacts(pos, quat, body_type, size, mesh: TriMesh, k: int,
                       use_pallas: bool = False, box_margin: float = 0.02):
    """Fixed-K manifold of one body (sphere/box/capsule) vs the mesh.

    Probe-sphere decomposition: spheres are exact; capsules use 3 samples
    along the core segment; boxes use their 8 corners (with a small skin
    margin as probe radius) plus the center with the inscribed radius.
    """
    from rl_ode_physics_tpu.utils import quat as quat_m

    dtype = pos.dtype

    # build a fixed probe set (max 9 probes) + per-probe radius + validity
    r_sph = size[0]
    # capsule probes
    axis = quat_m.to_matrix(quat)[:, 2]
    h = 0.5 * size[1]
    cap_pts = jnp.stack([pos - axis * h, pos, pos + axis * h])  # (3,3)
    # box corners
    corners_unit = jnp.asarray(
        [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
         for sz in (-1.0, 1.0)], dtype)
    r_mat = quat_m.to_matrix(quat)
    box_pts = pos + (corners_unit * (0.5 * size)) @ r_mat.T     # (8,3)

    is_sphere = body_type == BodyType.SPHERE
    is_box = body_type == BodyType.BOX
    is_capsule = body_type == BodyType.CAPSULE

    probes = jnp.concatenate([pos[None], cap_pts, box_pts])     # (12, 3)
    radii = jnp.concatenate([
        jnp.where(is_sphere, r_sph,
                  jnp.where(is_box, jnp.min(0.5 * size), r_sph))[None],
        jnp.full((3,), r_sph, dtype),
        jnp.full((8,), box_margin, dtype),
    ])
    pvalid = jnp.concatenate([
        (is_sphere | is_box)[None],
        jnp.repeat(is_capsule[None], 3),
        jnp.repeat(is_box[None], 8),
    ])

    def probe(p, r):
        return sphere_mesh_contacts(p, r, mesh, k, use_pallas)

    pts, nrm, dep, val = jax.vmap(probe)(probes, radii)         # (12, k, …)
    val = val & pvalid[:, None]

    # flatten 12×k and keep the deepest k overall
    m = 12 * k
    pts = pts.reshape(m, 3)
    nrm = nrm.reshape(m, 3)
    dep = dep.reshape(m)
    val = val.reshape(m)
    keys = jnp.where(val, dep, -jnp.inf)
    top_d, top_i = jax.lax.top_k(keys, k)
    sel = (top_i[:, None] == jnp.arange(m)[None, :]).astype(dtype)
    return (sel @ pts, sel @ nrm, jnp.where(jnp.isfinite(top_d), top_d, 0.0),
            jnp.isfinite(top_d) & (top_d > 0))


def _world_probes(state: WorldState, box_margin: float):
    """Probe-sphere decomposition for every slot, vectorized: (N, 12, 3)
    positions, (N, 12) radii, (N, 12) validity (by body type)."""
    from rl_ode_physics_tpu.utils import quat as quat_m

    dtype = state.pos.dtype
    n = state.num_slots
    r_mat = quat_m.to_matrix(state.quat)                  # (N, 3, 3)
    axis = r_mat[:, :, 2]                                 # capsule local Z
    h = 0.5 * state.size[:, 1:2]
    cap = jnp.stack([state.pos - axis * h, state.pos,
                     state.pos + axis * h], axis=1)       # (N, 3, 3)

    corners = jnp.asarray(
        [[sx, sy, sz] for sx in (-1.0, 1.0) for sy in (-1.0, 1.0)
         for sz in (-1.0, 1.0)], dtype)                   # (8, 3)
    half = 0.5 * state.size                               # (N, 3)
    box_local = corners[None, :, :] * half[:, None, :]    # (N, 8, 3)
    box = state.pos[:, None, :] + jnp.einsum(
        "nij,nkj->nki", r_mat, box_local)                 # (N, 8, 3)

    t = state.body_type
    is_sphere = t == BodyType.SPHERE
    is_box = t == BodyType.BOX
    is_capsule = t == BodyType.CAPSULE
    r_sph = state.size[:, 0]

    probes = jnp.concatenate([state.pos[:, None, :], cap, box], axis=1)
    radii = jnp.concatenate([
        jnp.where(is_sphere, r_sph,
                  jnp.where(is_box, jnp.min(half, axis=-1), r_sph))[:, None],
        jnp.broadcast_to(r_sph[:, None], (n, 3)),
        jnp.full((n, 8), box_margin, dtype),
    ], axis=1)                                            # (N, 12)
    pvalid = jnp.concatenate([
        (is_sphere | is_box)[:, None],
        jnp.broadcast_to(is_capsule[:, None], (n, 3)),
        jnp.broadcast_to(is_box[:, None], (n, 8)),
    ], axis=1)                                            # (N, 12)
    return probes, radii, pvalid


def mesh_narrowphase(state: WorldState, mesh: TriMesh, config: EngineConfig,
                     contacts_per_body: int = 4, use_pallas: bool = False,
                     box_margin: float = 0.02):
    """All dynamic bodies vs the static mesh → flat manifold arrays.

    Every probe sphere of every body rides ONE batched sweep (a single
    pallas_call on TPU — no vmap-of-kernel overhead): per-probe per-tile
    best distances → cross-tile top-k → exact points for winning tiles →
    per-body deepest-k selection.

    Returns (points (N*k, 3), normals, depths, a, b, valid) ready to be
    concatenated with the primitive narrowphase output before compaction.
    Contact convention: body = a, mesh slot = b (normal a→b).
    """
    k = contacts_per_body
    n = state.num_slots
    dtype = state.pos.dtype
    t = mesh.num_tris
    nt = t // MESH_TILE

    probes, radii, pvalid = _world_probes(state, box_margin)
    p_total = n * 12                                      # multiple of 4; pad to 8
    flat_p = probes.reshape(p_total, 3)
    pad = (-p_total) % 8
    if pad:
        flat_p = jnp.concatenate(
            [flat_p, jnp.full((pad, 3), 1e9, dtype)], axis=0)

    if use_pallas:
        from rl_ode_physics_tpu.ops.pallas_kernels import sphere_mesh_d2_tiles
        tile_d2 = sphere_mesh_d2_tiles(flat_p, mesh.v0.T, mesh.e1.T,
                                       mesh.e2.T)[:p_total]
    else:
        closest = jax.vmap(
            lambda c: closest_point_triangle(c, mesh.v0, mesh.e1, mesh.e2)
        )(flat_p[:p_total])                               # (P, T, 3)
        d2 = jnp.sum((closest - flat_p[:p_total, None, :]) ** 2, -1)
        tile_d2 = jnp.min(d2.reshape(p_total, nt, MESH_TILE), axis=-1)

    radii_f = radii.reshape(p_total)
    depth_t = radii_f[:, None] - jnp.sqrt(jnp.maximum(tile_d2, 0.0))
    keys = jnp.where(depth_t > 0, depth_t, -jnp.inf)      # (P, NT)
    top_d, top_i = jax.lax.top_k(keys, k)                 # (P, k)
    sel = (top_i[..., None] == jnp.arange(nt)[None, None, :]
           ).astype(dtype)                                # (P, k, NT)

    # exact closest points only for the winning tiles
    v0_k = jnp.einsum("pkt,td->pkd", sel,
                      mesh.v0.reshape(nt, MESH_TILE * 3)
                      ).reshape(p_total, k, MESH_TILE, 3)
    e1_k = jnp.einsum("pkt,td->pkd", sel,
                      mesh.e1.reshape(nt, MESH_TILE * 3)
                      ).reshape(p_total, k, MESH_TILE, 3)
    e2_k = jnp.einsum("pkt,td->pkd", sel,
                      mesh.e2.reshape(nt, MESH_TILE * 3)
                      ).reshape(p_total, k, MESH_TILE, 3)
    centers = flat_p[:p_total, None, None, :]
    closest_k = closest_point_triangle(centers, v0_k, e1_k, e2_k)
    d2_k = jnp.sum((closest_k - centers) ** 2, -1)        # (P, k, 128)
    best = jnp.argmin(d2_k, axis=-1)
    oh = (jnp.arange(MESH_TILE)[None, None, :] == best[..., None]
          ).astype(dtype)
    pts = jnp.sum(closest_k * oh[..., None], axis=2)      # (P, k, 3)

    n_dir = pts - flat_p[:p_total, None, :]
    n_len = jnp.linalg.norm(n_dir, axis=-1, keepdims=True)
    up = jnp.asarray([0.0, 1.0, 0.0], dtype)
    nrm = jnp.where(n_len > 1e-6, n_dir / jnp.maximum(n_len, _EPS), -up)
    dep = jnp.where(jnp.isfinite(top_d), top_d, 0.0)
    val = jnp.isfinite(top_d) & (top_d > 0) & pvalid.reshape(p_total)[:, None]

    # per-body deepest-k over its 12 probes × k candidates
    m = 12 * k
    pts_b = pts.reshape(n, m, 3)
    nrm_b = nrm.reshape(n, m, 3)
    dep_b = dep.reshape(n, m)
    val_b = val.reshape(n, m)
    keys_b = jnp.where(val_b, dep_b, -jnp.inf)
    bd, bi = jax.lax.top_k(keys_b, k)                     # (N, k)
    selb = (bi[..., None] == jnp.arange(m)[None, None, :]).astype(dtype)
    pts_f = jnp.einsum("nkm,nmd->nkd", selb, pts_b)
    nrm_f = jnp.einsum("nkm,nmd->nkd", selb, nrm_b)
    dep_f = jnp.where(jnp.isfinite(bd), bd, 0.0)
    val_f = jnp.isfinite(bd) & (bd > 0)

    eligible = (state.active & ~state.is_static
                & (state.inv_mass > 0))[:, None]
    val_f = val_f & eligible

    a = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    b = jnp.full((n * k,), mesh.slot, jnp.int32)
    return (pts_f.reshape(n * k, 3), nrm_f.reshape(n * k, 3),
            dep_f.reshape(n * k), a, b, val_f.reshape(n * k))
