"""Batched ray queries against world primitives and trimeshes.

TPU-native equivalent of ODE's ray geom (``dCreateRay`` + ``dCollide``
ray-vs-* paths): the reference links ODE, whose ray geoms are the standard
sensor/picking primitive; RL workloads use them as lidar/height probes.
Everything here is branch-free and shaped (R rays × N slots), so a whole
sensor array rides one fused program and vmaps over worlds.

Round-5 layout (the lidar tax attack, VERDICT r4): the whole query is
**component-major** — positions, directions, and the rotation matrix live
as separate scalar planes ((R, N) or (N,)), never as (..., 3) or
(..., 3, 3) minors. The previous row-major sweep built (R, N, 3, 3)
rotation broadcasts and (R, N, 3) locals for the box slab test; those
minors tile-pad up to ~42× in HBM under the rollout's chunked scan (the
same trap docs/BENCHMARKS.md records for solver tensors), and the einsum
lowering was the measured bulk of the lidar tax. In plane form the sweep
is ~40 full-tile (R, N) elementwise ops and nothing else.

Phase structure stays two-phase (sweep → winner): the dense sweep computes
entry distances only; the per-ray winner is an argmin, its parameters are
selected with ONE-HOT PLANE DOTS (no dynamic-index gathers — gathers lower
badly under ``lax.scan``; the one-hot rows are shared with the t
selection), and the normal/face machinery runs once per ray. When a caller
consumes only ``hits.t`` (the lidar path), XLA dead-code-eliminates the
whole winner pass.

An (R, N) AABB slab pre-rejection was considered and rejected: with static
dense shapes nothing is skippable, so a pre-test only ADDS compares on top
of the t tests it would gate (the t tests ARE the slab test for boxes).

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

_EPS = 1e-9
_BIG = 1e30


@struct.dataclass
class RayHits:
    t: jnp.ndarray        # (R,) distance along the (unit) direction
    point: jnp.ndarray    # (R, 3) hit point
    normal: jnp.ndarray   # (R, 3) surface normal, facing the origin side
    body: jnp.ndarray     # (R,) int32 slot (-1 = miss)
    hit: jnp.ndarray      # (R,) bool


def _rot_planes(q):
    """Unit quaternion (..., 4) → nine rotation-matrix component planes
    ``r[i][j]`` (same values as ``quat.to_matrix``'s [..., i, j], without
    ever materializing the (..., 3, 3) minor)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    one = jnp.ones_like(w)
    return (
        (one - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)),
        (2.0 * (xy + wz), one - 2.0 * (xx + zz), 2.0 * (yz - wx)),
        (2.0 * (xz - wy), 2.0 * (yz + wx), one - 2.0 * (xx + yy)),
    )


# ---------------------------------------------------------------------------
# component-plane distance kernels (every operand is an (R, N) plane)
# ---------------------------------------------------------------------------

def _sphere_t_planes(m, d, radius):
    """Entry t vs spheres; ``m`` = (mx, my, mz) o−c planes, ``d`` likewise."""
    b = m[0] * d[0] + m[1] * d[1] + m[2] * d[2]
    c = m[0] * m[0] + m[1] * m[1] + m[2] * m[2] - radius * radius
    disc = b * b - c
    ok = disc >= 0.0
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    return jnp.where(ok & (t >= 0.0), t, _BIG)


def _slab_axis(olj, dlj, halfj):
    """Per-axis slab interval (t0_j, t1_j) for the box test; parallel rays
    inside the slab contribute (−BIG, +BIG), outside (+BIG, −BIG)."""
    big = jnp.abs(dlj) > _EPS
    d_safe = jnp.where(big, dlj, 1.0)
    lo = (-halfj - olj) / d_safe
    hi = (halfj - olj) / d_safe
    inside = jnp.abs(olj) <= halfj
    t0 = jnp.where(big, jnp.minimum(lo, hi), jnp.where(inside, -_BIG, _BIG))
    t1 = jnp.where(big, jnp.maximum(lo, hi), jnp.where(inside, _BIG, -_BIG))
    return t0, t1


def _box_locals(r, m, d):
    """World → box-local components: ol_j = Σ_i r[i][j]·m_i (Rᵀ·m), and the
    same for the direction. ``r`` = 3×3 tuple of planes."""
    ol = tuple(r[0][j] * m[0] + r[1][j] * m[1] + r[2][j] * m[2]
               for j in range(3))
    dl = tuple(r[0][j] * d[0] + r[1][j] * d[1] + r[2][j] * d[2]
               for j in range(3))
    return ol, dl


def _box_t_planes(ol, dl, half):
    """Entry t vs boxes in local components; returns (t, (t0_0, t0_1, t0_2))
    so the winner pass can recover the entry face from the same math."""
    t0s, t1s = [], []
    for j in range(3):
        t0j, t1j = _slab_axis(ol[j], dl[j], half[j])
        t0s.append(t0j)
        t1s.append(t1j)
    t0 = jnp.maximum(jnp.maximum(t0s[0], t0s[1]), t0s[2])
    t1 = jnp.minimum(jnp.minimum(t1s[0], t1s[1]), t1s[2])
    ok = (t0 <= t1) & (t0 >= 0.0)
    return jnp.where(ok, t0, _BIG), tuple(t0s)


def _capsule_t_planes(m0, d, a, radius, half_len):
    """Entry t vs capsules; ``m0`` = o − p0 planes (p0 = bottom cap center),
    ``a`` = world axis planes."""
    d_ax = d[0] * a[0] + d[1] * a[1] + d[2] * a[2]
    m_ax = m0[0] * a[0] + m0[1] * a[1] + m0[2] * a[2]
    dp = tuple(d[i] - a[i] * d_ax for i in range(3))
    mp = tuple(m0[i] - a[i] * m_ax for i in range(3))
    qa = dp[0] * dp[0] + dp[1] * dp[1] + dp[2] * dp[2]
    qb = mp[0] * dp[0] + mp[1] * dp[1] + mp[2] * dp[2]
    qc = mp[0] * mp[0] + mp[1] * mp[1] + mp[2] * mp[2] - radius * radius
    disc = qb * qb - qa * qc
    ok_c = (disc >= 0.0) & (qa > _EPS)
    t_cyl = (-qb - jnp.sqrt(jnp.maximum(disc, 0.0))) / jnp.where(
        qa > _EPS, qa, 1.0)
    s = m_ax + t_cyl * d_ax                                # axial coordinate
    ok_c = ok_c & (t_cyl >= 0.0) & (s >= 0.0) & (s <= 2.0 * half_len)
    t_cyl = jnp.where(ok_c, t_cyl, _BIG)

    t_c0 = _sphere_t_planes(m0, d, radius)
    m1 = tuple(m0[i] - a[i] * 2.0 * half_len for i in range(3))
    t_c1 = _sphere_t_planes(m1, d, radius)
    return jnp.minimum(t_cyl, jnp.minimum(t_c0, t_c1))


def _plane_t_planes(m, d, n_p):
    """Entry t vs planes; ``n_p`` = plane normal planes, ``m`` = o − pos."""
    denom = n_p[0] * d[0] + n_p[1] * d[1] + n_p[2] * d[2]
    num = -(n_p[0] * m[0] + n_p[1] * m[1] + n_p[2] * m[2])
    t = num / jnp.where(jnp.abs(denom) > _EPS, denom, 1.0)
    ok = (jnp.abs(denom) > _EPS) & (t >= 0.0)
    return jnp.where(ok, t, _BIG)


# ---------------------------------------------------------------------------
# winner-pass normal (component form, one slot per ray, (R,) planes)
# ---------------------------------------------------------------------------

def _winner_normal(o, d, t, w, config):
    """Surface normal components at ``o + t·d`` on the winner primitive.

    ``o``/``d``: 3-tuples of (R,) ray components; ``w``: dict of one-hot-
    selected winner parameters (pos/r/size/type planes). Recomputes only
    the frame-dependent face/axis selection the dense sweep skipped; t is
    taken from the sweep (same math ⇒ same value).
    """
    p = tuple(o[i] + t * d[i] for i in range(3))
    radius = jnp.maximum(w["s0"], _EPS)
    pos = (w["px"], w["py"], w["pz"])
    r = w["r"]
    bt = w["bt"]

    rel = tuple(p[i] - pos[i] for i in range(3))
    n_sph = tuple(rel[i] / radius for i in range(3))

    # box: entry face = slab axis achieving t0 (recompute local frame);
    # axis selection replicates argmax-first-max tie-breaking
    m = tuple(o[i] - pos[i] for i in range(3))
    ol, dl = _box_locals(r, m, d)
    half = (0.5 * w["s0"], 0.5 * w["s1"], 0.5 * w["s2"])
    _, t0s = _box_t_planes(ol, dl, half)
    sel0 = (t0s[0] >= t0s[1]) & (t0s[0] >= t0s[2])
    sel1 = ~sel0 & (t0s[1] >= t0s[2])
    sel2 = ~(sel0 | sel1)
    sgn = []
    for j, selj in enumerate((sel0, sel1, sel2)):
        s = -jnp.sign(dl[j])
        s = jnp.where(s == 0.0, 1.0, s)
        sgn.append(jnp.where(selj, s, 0.0))
    n_box = tuple(r[i][0] * sgn[0] + r[i][1] * sgn[1] + r[i][2] * sgn[2]
                  for i in range(3))

    is_sph = bt == BodyType.SPHERE
    n = tuple(jnp.where(is_sph, n_sph[i], n_box[i]) for i in range(3))

    if config.enable_capsules:
        a = (r[0][2], r[1][2], r[2][2])                    # local z in world
        half_len = 0.5 * w["s1"]
        p0 = tuple(pos[i] - a[i] * half_len for i in range(3))
        rp = tuple(p[i] - p0[i] for i in range(3))
        s_ax = jnp.clip(rp[0] * a[0] + rp[1] * a[1] + rp[2] * a[2],
                        0.0, 2.0 * half_len)
        n_cap = tuple((rp[i] - a[i] * s_ax) / radius for i in range(3))
        is_cap = bt == BodyType.CAPSULE
        n = tuple(jnp.where(is_cap, n_cap[i], n[i]) for i in range(3))
    if config.enable_planes:
        a = (r[0][2], r[1][2], r[2][2])
        d_dot = a[0] * d[0] + a[1] * d[1] + a[2] * d[2]
        flip = -jnp.sign(d_dot)
        n_pl = tuple(a[i] * flip for i in range(3))
        is_pl = bt == BodyType.PLANE
        n = tuple(jnp.where(is_pl, n_pl[i], n[i]) for i in range(3))
    return n


def raycast(state: WorldState, origins, dirs, config: EngineConfig,
            max_dist: float = 1e6) -> RayHits:
    """Nearest hit of R rays against every active primitive slot.

    ``origins``/``dirs``: (R, 3); directions are normalized internally.
    All (R, N) ray-slot pairs evaluate branch-free as component planes
    (distance-only); the per-ray winner is an argmin over slots, its
    parameters come from one-hot plane dots, and normals run once per ray
    on the winner. vmap over worlds for batched sensor arrays.
    """
    f = state.pos.dtype
    o_in = jnp.asarray(origins, f)
    d_in = jnp.asarray(dirs, f)
    d_in = d_in / jnp.maximum(
        jnp.linalg.norm(d_in, axis=-1, keepdims=True), _EPS)

    n_slots = state.num_slots
    # ray components (R, 1) — broadcast against (N,) slot planes → (R, N)
    o = tuple(o_in[:, i][:, None] for i in range(3))
    d = tuple(d_in[:, i][:, None] for i in range(3))

    # slot component planes (N,)
    px, py, pz = (state.pos[:, i] for i in range(3))
    r = _rot_planes(state.quat)                            # 3×3 of (N,)
    s0, s1, s2 = (state.size[:, i] for i in range(3))
    radius = s0
    half = (0.5 * s0, 0.5 * s1, 0.5 * s2)
    bt = state.body_type[None, :]

    m = (o[0] - px, o[1] - py, o[2] - pz)                  # (R, N) each

    t_s = _sphere_t_planes(m, d, radius)
    ol, dl = _box_locals(r, m, d)
    t_b, _ = _box_t_planes(ol, dl, half)
    t_all = jnp.where(bt == BodyType.SPHERE, t_s,
                      jnp.where(bt == BodyType.BOX, t_b, _BIG))
    if config.enable_capsules:
        a = (r[0][2], r[1][2], r[2][2])                    # capsule world axis
        half_len = 0.5 * s1
        m0 = tuple(m[i] + a[i] * half_len for i in range(3))
        t_c = _capsule_t_planes(m0, d, a, radius, half_len)
        t_all = jnp.where(bt == BodyType.CAPSULE, t_c, t_all)
    if config.enable_planes:
        n_p = (r[0][2], r[1][2], r[2][2])
        t_p = _plane_t_planes(m, d, n_p)
        t_all = jnp.where(bt == BodyType.PLANE, t_p, t_all)

    t_all = jnp.where(state.active[None, :] & (t_all <= max_dist),
                      t_all, _BIG)

    best = jnp.argmin(t_all, axis=-1)                      # (R,)
    oh = jax.nn.one_hot(best, n_slots, dtype=f)            # (R, N)
    t = jnp.sum(t_all * oh, -1)
    hit = t < _BIG

    # winner parameters as one-hot plane dots (no gathers — they lower
    # badly under lax.scan); XLA fuses the 16 reductions over one oh
    sel = lambda plane: jnp.sum(oh * plane[None, :], -1)   # (N,) → (R,)
    winner = {
        "px": sel(px), "py": sel(py), "pz": sel(pz),
        "s0": sel(s0), "s1": sel(s1), "s2": sel(s2),
        "r": tuple(tuple(sel(r[i][j]) for j in range(3)) for i in range(3)),
        "bt": jnp.sum(oh * state.body_type[None, :].astype(f),
                      -1).astype(state.body_type.dtype),
    }
    o_r = tuple(c[:, 0] for c in o)
    d_r = tuple(c[:, 0] for c in d)
    n = _winner_normal(o_r, d_r, jnp.where(hit, t, 0.0), winner, config)
    normal = jnp.stack(n, axis=-1)                         # (R, 3)

    t = jnp.where(hit, t, max_dist)
    return RayHits(
        t=t,
        point=o_in + t[:, None] * d_in,
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
