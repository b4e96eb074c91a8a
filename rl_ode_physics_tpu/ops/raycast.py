"""Batched ray queries against world primitives and trimeshes.

TPU-native equivalent of ODE's ray geom (``dCreateRay`` + ``dCollide``
ray-vs-* paths): the reference links ODE, whose ray geoms are the standard
sensor/picking primitive; RL workloads use them as lidar/height probes.
Everything here is branch-free and shaped (R rays × N slots), so a whole
sensor array rides one fused program and vmaps over worlds.

Round-5 layout (the lidar tax attack, VERDICT r4): the dense (R, N) sweep
computes **entry distances only** — the normal/face machinery (box
entry-face one-hot + frame rotation, capsule closest-axis point, sphere
normalization) runs once per RAY on the argmin winner slot, not once per
(ray, slot, type). Per-pair work drops to the slab/quadratic t tests, and
the winner pass is an (R,) gather + (R, 3) kernel — the same
sweep-then-exact two-phase shape as the trimesh narrowphase. An (R, N)
AABB slab pre-rejection was considered and rejected: with static dense
shapes nothing is skippable, so a pre-test only ADDS compares on top of
the t tests it would gate (the t tests ARE the slab test for boxes).

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


# ---------------------------------------------------------------------------
# distance-only kernels (the dense (R, N) sweep)
# ---------------------------------------------------------------------------

def _ray_sphere_t(o, d, center, radius):
    """Entry t vs a sphere; misses → _BIG."""
    m = o - center
    b = jnp.sum(m * d, -1)
    c = jnp.sum(m * m, -1) - radius * radius
    disc = b * b - c
    ok = (disc >= 0.0)
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t = -b - sq
    ok = ok & (t >= 0.0)
    return jnp.where(ok, t, _BIG)


def _ray_box_t(ol, dl, half):
    """Entry t vs an axis-aligned box in its LOCAL frame (slab method).
    ``ol``/``dl``: origin/direction already rotated into the box frame —
    shared with the winner pass so the two phases agree bitwise."""
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
    return jnp.where(ok, t0, _BIG), t0i


def _ray_capsule_t(o, d, pos, a, radius, half_len):
    """Entry t vs a capsule with world axis ``a``: cylinder + cap spheres."""
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

    t_c0 = _ray_sphere_t(o, d, p0, radius)
    t_c1 = _ray_sphere_t(o, d, p1, radius)
    return jnp.minimum(t_cyl, jnp.minimum(t_c0, t_c1))


def _ray_plane_t(o, d, pos, n_p):
    d_p = jnp.sum(n_p * pos, -1)
    denom = jnp.sum(n_p * d, -1)
    t = (d_p - jnp.sum(n_p * o, -1)) / jnp.where(
        jnp.abs(denom) > _EPS, denom, 1.0)
    ok = (jnp.abs(denom) > _EPS) & (t >= 0.0)
    return jnp.where(ok, t, _BIG)


# ---------------------------------------------------------------------------
# winner-pass normals (one slot per ray)
# ---------------------------------------------------------------------------

def _winner_normal(o, d, t, pos, r_mat, size, body_type, config):
    """Surface normal at ``o + t·d`` on the winner primitive (R, 3).

    Recomputes only the frame-dependent face/axis selection the dense
    sweep skipped; t is taken from the sweep (same math ⇒ same value).
    """
    p = o + t[..., None] * d
    radius = size[..., 0]
    half = 0.5 * size
    half_len = 0.5 * size[..., 1]

    n_sphere = (p - pos) / jnp.maximum(radius, _EPS)[..., None]

    # box: entry face = slab axis achieving t0 (recompute local frame)
    ol = jnp.einsum("...ij,...i->...j", r_mat, o - pos)
    dl = jnp.einsum("...ij,...i->...j", r_mat, d)
    _, t0i = _ray_box_t(ol, dl, half)
    ax = jnp.argmax((t0i == t0i.max(-1, keepdims=True)).astype(jnp.int32),
                    axis=-1)
    oh = jax.nn.one_hot(ax, 3, dtype=o.dtype)
    sign = -jnp.sign(jnp.sum(oh * dl, -1))
    sign = jnp.where(sign == 0.0, 1.0, sign)
    n_box = jnp.einsum("...ij,...j->...i", r_mat, oh * sign[..., None])

    bt = body_type
    n = jnp.where((bt == BodyType.SPHERE)[..., None], n_sphere, n_box)

    if config.enable_capsules:
        a = r_mat[..., :, 2]
        p0 = pos - a * half_len[..., None]
        ax_pt = p0 + a * jnp.clip(jnp.sum((p - p0) * a, -1),
                                  0.0, 2.0 * half_len)[..., None]
        n_cap = (p - ax_pt) / jnp.maximum(radius, _EPS)[..., None]
        n = jnp.where((bt == BodyType.CAPSULE)[..., None], n_cap, n)
    if config.enable_planes:
        n_pl = r_mat[..., :, 2]
        n_pl = n_pl * -jnp.sign(jnp.sum(n_pl * d, -1))[..., None]
        n = jnp.where((bt == BodyType.PLANE)[..., None], n_pl, n)
    return n


def raycast(state: WorldState, origins, dirs, config: EngineConfig,
            max_dist: float = 1e6) -> RayHits:
    """Nearest hit of R rays against every active primitive slot.

    ``origins``/``dirs``: (R, 3); directions are normalized internally.
    All (R, N) ray-slot pairs evaluate branch-free (distance-only); the
    per-ray winner is an argmin over slots, and normals run once per ray
    on the winner. vmap over worlds for batched sensor arrays.
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

    bt = state.body_type[None, :]
    t_s = _ray_sphere_t(ob, db, pos, radius[None, :])
    ol = jnp.einsum("...ij,...i->...j", rm, ob - pos)      # R^T (o - pos)
    dl = jnp.einsum("...ij,...i->...j", rm, db)
    t_b, _ = _ray_box_t(ol, dl, half[None, :, :])
    t_all = jnp.where(bt == BodyType.SPHERE, t_s,
                      jnp.where(bt == BodyType.BOX, t_b, _BIG))
    if config.enable_capsules:
        t_c = _ray_capsule_t(ob, db, pos, rm[..., :, 2], radius[None, :],
                             half_len[None, :])
        t_all = jnp.where(bt == BodyType.CAPSULE, t_c, t_all)
    if config.enable_planes:
        t_p = _ray_plane_t(ob, db, pos, rm[..., :, 2])
        t_all = jnp.where(bt == BodyType.PLANE, t_p, t_all)

    t_all = jnp.where(state.active[None, :] & (t_all <= max_dist),
                      t_all, _BIG)

    best = jnp.argmin(t_all, axis=-1)                      # (R,)
    oh = jax.nn.one_hot(best, n_slots, dtype=f)            # (R, N)
    t = jnp.sum(t_all * oh, -1)
    hit = t < _BIG

    # winner pass: (R,) gathers + (R, 3) normal kernels — the per-pair
    # face/axis machinery the sweep skipped runs once per ray
    w_pos = state.pos[best]
    w_rm = r_mat[best]
    w_size = state.size[best]
    w_bt = state.body_type[best]
    normal = _winner_normal(o, d, jnp.where(hit, t, 0.0),
                            w_pos, w_rm, w_size, w_bt, config)

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
