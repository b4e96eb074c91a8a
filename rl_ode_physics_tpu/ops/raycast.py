"""Batched ray queries against world primitives and trimeshes.

TPU-native equivalent of ODE's ray geom (``dCreateRay`` + ``dCollide``
ray-vs-* paths): the reference links ODE, whose ray geoms are the standard
sensor/picking primitive; RL workloads use them as lidar/height probes.
Everything here is branch-free and shaped (R rays × N slots), so a whole
sensor array rides one fused program and vmaps over worlds.

API:
  raycast(state, origins, dirs, config, max_dist)   → RayHits vs primitives
  raycast_mesh(origins, dirs, mesh, max_dist)       → RayHits vs a TriMesh

Hits report the NEAREST entry point along the ray (t in [0, max_dist]),
its surface normal (facing the ray origin), and the body slot (-1 = miss).
Rays starting inside a volume report a miss for that volume (entry-only
semantics, like ODE's default ray behavior without backface culling
disabled).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import BodyType, WorldState
from rl_ode_physics_tpu.utils import quat as quat_m

_EPS = 1e-9
_BIG = 1e30


@struct.dataclass
class RayHits:
    t: jnp.ndarray        # (R,) distance along the (unit) direction
    point: jnp.ndarray    # (R, 3) hit point
    normal: jnp.ndarray   # (R, 3) surface normal, facing the origin side
    body: jnp.ndarray     # (R,) int32 slot (-1 = miss)
    hit: jnp.ndarray      # (R,) bool


def _ray_sphere(o, d, center, radius):
    """Entry t vs a sphere (t, normal); misses → _BIG."""
    m = o - center
    b = jnp.sum(m * d, -1)
    c = jnp.sum(m * m, -1) - radius * radius
    disc = b * b - c
    ok = (disc >= 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = -b - sq
    ok = ok & (t >= 0.0)
    t = jnp.where(ok, t, _BIG)
    p = o + t[..., None] * d
    n = (p - center) / jnp.maximum(radius, _EPS)[..., None]
    return t, n


def _ray_box(o, d, pos, r_mat, half):
    """Entry t vs an oriented box via the slab method; normal = entry face."""
    # into box frame
    ol = jnp.einsum("...ij,...i->...j", r_mat, o - pos)    # R^T (o - pos)
    dl = jnp.einsum("...ij,...i->...j", r_mat, d)
    big = jnp.abs(dl) > _EPS
    d_safe = jnp.where(big, dl, 1.0)
    lo = (-half - ol) / d_safe
    hi = (half - ol) / d_safe
    t0i = jnp.where(big, jnp.minimum(lo, hi),
                    jnp.where(jnp.abs(ol) <= half, -_BIG, _BIG))
    t1i = jnp.where(big, jnp.maximum(lo, hi),
                    jnp.where(jnp.abs(ol) <= half, _BIG, -_BIG))
    t0 = jnp.max(t0i, axis=-1)
    t1 = jnp.min(t1i, axis=-1)
    ok = (t0 <= t1) & (t0 >= 0.0)
    t = jnp.where(ok, t0, _BIG)
    # entry face: the axis achieving t0
    ax = jnp.argmax((t0i == t0[..., None]).astype(jnp.int32), axis=-1)
    oh = jax.nn.one_hot(ax, 3, dtype=o.dtype)
    sign = -jnp.sign(jnp.sum(oh * dl, -1))
    sign = jnp.where(sign == 0.0, 1.0, sign)
    n = jnp.einsum("...ij,...j->...i", r_mat, oh * sign[..., None])
    return t, n


def _ray_capsule(o, d, pos, r_mat, radius, half_len):
    """Entry t vs a capsule (axis = local Z): cylinder body + cap spheres."""
    a = r_mat[..., :, 2]                                    # axis, world
    p0 = pos - a * half_len[..., None]
    p1 = pos + a * half_len[..., None]

    m = o - p0
    d_ax = jnp.sum(d * a, -1)
    m_ax = jnp.sum(m * a, -1)
    dp = d - a * d_ax[..., None]
    mp = m - a * m_ax[..., None]
    qa = jnp.sum(dp * dp, -1)
    qb = jnp.sum(mp * dp, -1)
    qc = jnp.sum(mp * mp, -1) - radius * radius
    disc = qb * qb - qa * qc
    ok_c = (disc >= 0.0) & (qa > _EPS)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_cyl = (-qb - sq) / jnp.where(qa > _EPS, qa, 1.0)
    s = m_ax + t_cyl * d_ax                                # axial coordinate
    ok_c = ok_c & (t_cyl >= 0.0) & (s >= 0.0) & (s <= 2.0 * half_len)
    t_cyl = jnp.where(ok_c, t_cyl, _BIG)

    t_c0, n_c0 = _ray_sphere(o, d, p0, radius)
    t_c1, n_c1 = _ray_sphere(o, d, p1, radius)

    t = jnp.minimum(t_cyl, jnp.minimum(t_c0, t_c1))
    p = o + t[..., None] * d
    ax_pt = p0 + a * jnp.clip(jnp.sum((p - p0) * a, -1),
                              0.0, 2.0 * half_len)[..., None]
    n_cyl = (p - ax_pt) / jnp.maximum(radius, _EPS)[..., None]
    n = jnp.where((t == t_cyl)[..., None], n_cyl,
                  jnp.where((t == t_c0)[..., None], n_c0, n_c1))
    return t, n


def _ray_plane(o, d, pos, r_mat):
    n_p = r_mat[..., :, 2]
    d_p = jnp.sum(n_p * pos, -1)
    denom = jnp.sum(n_p * d, -1)
    t = (d_p - jnp.sum(n_p * o, -1)) / jnp.where(
        jnp.abs(denom) > _EPS, denom, 1.0)
    ok = (jnp.abs(denom) > _EPS) & (t >= 0.0)
    t = jnp.where(ok, t, _BIG)
    n = n_p * -jnp.sign(denom)[..., None]
    return t, n


def raycast(state: WorldState, origins, dirs, config: EngineConfig,
            max_dist: float = 1e6) -> RayHits:
    """Nearest hit of R rays against every active primitive slot.

    ``origins``/``dirs``: (R, 3); directions are normalized internally.
    All (R, N) ray-slot pairs evaluate branch-free; the per-ray winner is
    an argmin over slots. vmap over worlds for batched sensor arrays.
    """
    f = state.pos.dtype
    o = jnp.asarray(origins, f)
    d = jnp.asarray(dirs, f)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), _EPS)

    n_slots = state.num_slots
    r_mat = quat_m.to_matrix(state.quat)                   # (N, 3, 3)
    half = 0.5 * state.size
    radius = state.size[:, 0]
    half_len = 0.5 * state.size[:, 1]

    # broadcast (R, N, 3)
    ob = o[:, None, :]
    db = d[:, None, :]
    pos = state.pos[None, :, :]
    rm = r_mat[None, :, :, :]

    t_s, n_s = _ray_sphere(ob, db, pos, radius[None, :])
    t_b, n_b = _ray_box(ob, db, pos, rm, half[None, :, :])
    if config.enable_capsules:
        t_c, n_c = _ray_capsule(ob, db, pos, rm, radius[None, :],
                                half_len[None, :])
    else:
        t_c = jnp.full(t_s.shape, _BIG, f)
        n_c = jnp.zeros_like(n_s)
    if config.enable_planes:
        t_p, n_p = _ray_plane(ob, db, pos, rm)
    else:
        t_p = jnp.full(t_s.shape, _BIG, f)
        n_p = jnp.zeros_like(n_s)

    bt = state.body_type[None, :]
    t_all = jnp.where(bt == BodyType.SPHERE, t_s,
            jnp.where(bt == BodyType.BOX, t_b,
            jnp.where(bt == BodyType.CAPSULE, t_c,
            jnp.where(bt == BodyType.PLANE, t_p, _BIG))))
    n_all = jnp.where((bt == BodyType.SPHERE)[..., None], n_s,
            jnp.where((bt == BodyType.BOX)[..., None], n_b,
            jnp.where((bt == BodyType.CAPSULE)[..., None], n_c, n_p)))

    t_all = jnp.where(state.active[None, :] & (t_all <= max_dist),
                      t_all, _BIG)

    best = jnp.argmin(t_all, axis=-1)                      # (R,)
    oh = jax.nn.one_hot(best, n_slots, dtype=f)            # (R, N)
    t = jnp.sum(t_all * oh, -1)
    normal = jnp.einsum("rn,rnd->rd", oh, n_all)
    hit = t < _BIG
    t = jnp.where(hit, t, max_dist)
    return RayHits(
        t=t,
        point=o + t[:, None] * d,
        normal=jnp.where(hit[:, None], normal, 0.0),
        body=jnp.where(hit, best.astype(jnp.int32), -1),
        hit=hit,
    )


def raycast_mesh(origins, dirs, mesh, max_dist: float = 1e6) -> RayHits:
    """Nearest hit of R rays against a static TriMesh (Möller–Trumbore
    over all triangles, tiled like the trimesh narrowphase; padded
    degenerate triangles never hit)."""
    f = mesh.v0.dtype
    o = jnp.asarray(origins, f)
    d = jnp.asarray(dirs, f)
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), _EPS)

    def one_ray(o1, d1):
        e1, e2, v0 = mesh.e1, mesh.e2, mesh.v0             # (T, 3)
        h = jnp.cross(d1[None, :], e2)
        det = jnp.sum(e1 * h, -1)
        ok = jnp.abs(det) > _EPS
        inv = 1.0 / jnp.where(ok, det, 1.0)
        s = o1[None, :] - v0
        u = jnp.sum(s * h, -1) * inv
        q = jnp.cross(s, e1)
        v = jnp.sum(d1[None, :] * q, -1) * inv
        t = jnp.sum(e2 * q, -1) * inv
        ok = ok & (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t >= 0.0)
        t = jnp.where(ok, t, _BIG)
        best = jnp.argmin(t)
        oh = jax.nn.one_hot(best, t.shape[0], dtype=f)
        t_best = jnp.sum(t * oh)
        n = jnp.einsum("t,td->d", oh, mesh.normal)
        # normal faces the origin side
        n = n * -jnp.sign(jnp.sum(n * d1) + _EPS)
        return t_best, n

    t, n = jax.vmap(one_ray)(o, d)
    hit = t < jnp.minimum(_BIG, max_dist + 1.0)
    hit = hit & (t <= max_dist)
    t_out = jnp.where(hit, t, max_dist)
    return RayHits(
        t=t_out,
        point=o + t_out[:, None] * d,
        normal=jnp.where(hit[:, None], n, 0.0),
        body=jnp.where(hit, mesh.slot, -1).astype(jnp.int32),
        hit=hit,
    )
