"""Bilateral joints (ball, hinge, fixed, slider, universal) as solver rows.

Beyond-parity capability (docs/ROADMAP.md §4): the reference game uses only
contact joints (``dJointCreateContact``, /root/reference/src/main.c:682),
but the ODE engine it links exposes bilateral joints as a core feature —
a user switching from an ODE-based stack expects them. This module extends
the impulse-space solver with ODE-style bilateral constraint rows:

* BALL   — 3 rows: the world-frame relative velocity of the two anchor
  points is driven to the ERP-scaled anchor separation (dJointCreateBall).
* HINGE  — the 3 ball rows + 2 angular rows keeping the relative angular
  velocity perpendicular to the hinge axis zero (ERP bias on axis
  misalignment), + an optional motor row (dParamVel/dParamFMax) and a
  one-sided limit row (dParamLoStop/HiStop) — dJointCreateHinge.
* FIXED  — 3 anchor rows + 3 angular rows locking all relative rotation
  (two-frame-vector orientation error) — dJointCreateFixed.
* SLIDER — 2 lateral anchor rows (⊥ the slide axis) + 3 rotation-lock
  rows + optional LINEAR motor and position-limit rows along the axis
  (dJointCreateSlider with dParamVel/FMax/LoStop/HiStop in meters).
* UNIVERSAL — the 3 ball rows + 1 angular row keeping axis 1 (on body a)
  perpendicular to axis 2 (on body b) — dJointCreateUniversal.

Rows are solved interleaved with the contact sweep, one unclamped
projected-Jacobi (or PGS) update per solver iteration — the iterative
equivalent of ODE folding bilateral rows into the same LCP. Everything is
fixed-capacity and branch-free: a ``JointSet`` holds ``max_joints`` slots
(type 0 = empty), so jit traces once regardless of how many joints exist.

Anchors and axes are stored in BODY-LOCAL coordinates and transformed by
the current body poses every step, exactly like ODE's joint anchors.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import WorldState, world_inv_inertia
from rl_ode_physics_tpu.utils import quat as quat_m

_EPS = 1e-9

JOINT_NONE = 0
JOINT_BALL = 1
JOINT_HINGE = 2
JOINT_FIXED = 3
JOINT_SLIDER = 4
JOINT_UNIVERSAL = 5

# rows emitted per joint slot (static): 3 linear + 2 angular constraint
# rows (ball leaves the angular rows disabled) + 1 motor row + 1 limit row
ROWS_PER_JOINT = 7


@struct.dataclass
class JointSet:
    """Fixed-capacity joint table (a pytree — pass to ``make_step_fn`` /
    ``step`` like the trimesh; update between steps to add/remove)."""

    kind: jnp.ndarray        # (J,) int32 — JOINT_* code (0 = empty slot)
    a: jnp.ndarray           # (J,) int32 body slot
    b: jnp.ndarray           # (J,) int32 body slot
    anchor_a: jnp.ndarray    # (J, 3) anchor in a's local frame
    anchor_b: jnp.ndarray    # (J, 3) anchor in b's local frame
    axis_a: jnp.ndarray      # (J, 3) hinge axis in a's local frame
    axis_b: jnp.ndarray      # (J, 3) hinge axis in b's local frame
    ref_a: jnp.ndarray       # (J, 3) angle reference ⊥ axis, a's frame
    ref_b: jnp.ndarray       # (J, 3) the same world vector in b's frame
    lo: jnp.ndarray          # (J,) hinge angle lo stop (dParamLoStop)
    hi: jnp.ndarray          # (J,) hinge angle hi stop (dParamHiStop)
    stop_bounce: jnp.ndarray  # (J,) stop restitution (dParamBounce, 0=off)
    motor_vel: jnp.ndarray   # (J,) motor target angular velocity (dParamVel)
    motor_fmax: jnp.ndarray  # (J,) motor max torque, 0 = off (dParamFMax)

    @property
    def capacity(self) -> int:
        return self.kind.shape[0]


def empty_joints(capacity: int, dtype=jnp.float32) -> JointSet:
    z3 = jnp.zeros((capacity, 3), dtype)
    ax = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], dtype), (capacity, 1))
    rf = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]], dtype), (capacity, 1))
    inf = jnp.full((capacity,), jnp.inf, dtype)
    z = jnp.zeros((capacity,), dtype)
    return JointSet(kind=jnp.zeros((capacity,), jnp.int32),
                    a=jnp.zeros((capacity,), jnp.int32),
                    b=jnp.zeros((capacity,), jnp.int32),
                    anchor_a=z3, anchor_b=z3, axis_a=ax, axis_b=ax,
                    ref_a=rf, ref_b=rf,
                    lo=-inf, hi=inf, stop_bounce=z, motor_vel=z,
                    motor_fmax=z)


def _to_local(state: WorldState, body, world_point):
    r = quat_m.to_matrix(state.quat[body])
    return r.T @ (jnp.asarray(world_point, state.pos.dtype) - state.pos[body])


def add_ball(joints: JointSet, state: WorldState, slot: int,
             a: int, b: int, world_anchor) -> JointSet:
    """dJointCreateBall + dJointSetBallAnchor: store the current world
    anchor in both bodies' local frames."""
    wa = jnp.asarray(world_anchor, state.pos.dtype)
    return joints.replace(
        kind=joints.kind.at[slot].set(JOINT_BALL),
        a=joints.a.at[slot].set(a),
        b=joints.b.at[slot].set(b),
        anchor_a=joints.anchor_a.at[slot].set(_to_local(state, a, wa)),
        anchor_b=joints.anchor_b.at[slot].set(_to_local(state, b, wa)),
    )


def add_hinge(joints: JointSet, state: WorldState, slot: int,
              a: int, b: int, world_anchor, world_axis) -> JointSet:
    """dJointCreateHinge + SetHingeAnchor/SetHingeAxis."""
    j = add_ball(joints, state, slot, a, b, world_anchor)
    ax = jnp.asarray(world_axis, state.pos.dtype)
    ax = ax / jnp.maximum(jnp.linalg.norm(ax), _EPS)
    ra = quat_m.to_matrix(state.quat[a])
    rb = quat_m.to_matrix(state.quat[b])
    # angle reference: any world vector ⊥ axis at creation time defines
    # angle 0 (ODE stores qrel; this perpendicular pair is equivalent for
    # the hinge's 1-DoF angle)
    ref_w, _ = _perp_basis(ax)
    return j.replace(
        kind=j.kind.at[slot].set(JOINT_HINGE),
        axis_a=j.axis_a.at[slot].set(ra.T @ ax),
        axis_b=j.axis_b.at[slot].set(rb.T @ ax),
        ref_a=j.ref_a.at[slot].set(ra.T @ ref_w),
        ref_b=j.ref_b.at[slot].set(rb.T @ ref_w),
    )


def set_hinge_limits(joints: JointSet, slot: int, lo, hi,
                     bounce=0.0) -> JointSet:
    """dJointSetHingeParam(dParamLoStop / dParamHiStop / dParamBounce).
    Angles in radians (hinge) or meters (slider) relative to the creation
    pose. ``bounce`` > 0 makes the stop restitute the approach velocity
    like ODE's dParamBounce."""
    return joints.replace(lo=joints.lo.at[slot].set(lo),
                          hi=joints.hi.at[slot].set(hi),
                          stop_bounce=joints.stop_bounce.at[slot].set(bounce))


def set_hinge_motor(joints: JointSet, slot: int, vel, fmax) -> JointSet:
    """dJointSetHingeParam(dParamVel / dParamFMax): drive the hinge angular
    velocity toward ``vel`` with torque bounded by ``fmax`` (0 = off)."""
    return joints.replace(motor_vel=joints.motor_vel.at[slot].set(vel),
                          motor_fmax=joints.motor_fmax.at[slot].set(fmax))


def add_fixed(joints: JointSet, state: WorldState, slot: int,
              a: int, b: int) -> JointSet:
    """dJointCreateFixed + dJointSetFixed: lock the current relative pose.
    Anchor = midpoint of the body origins; the stored axis/ref frame pair
    encodes the relative orientation to maintain."""
    mid = 0.5 * (state.pos[a] + state.pos[b])
    j = add_ball(joints, state, slot, a, b, mid)
    f = state.pos.dtype
    za = jnp.asarray([0.0, 0.0, 1.0], f)
    xa = jnp.asarray([1.0, 0.0, 0.0], f)
    ra = quat_m.to_matrix(state.quat[a])
    rb = quat_m.to_matrix(state.quat[b])
    return j.replace(
        kind=j.kind.at[slot].set(JOINT_FIXED),
        axis_a=j.axis_a.at[slot].set(ra.T @ za),
        axis_b=j.axis_b.at[slot].set(rb.T @ za),
        ref_a=j.ref_a.at[slot].set(ra.T @ xa),
        ref_b=j.ref_b.at[slot].set(rb.T @ xa),
    )


def add_slider(joints: JointSet, state: WorldState, slot: int,
               a: int, b: int, world_axis) -> JointSet:
    """dJointCreateSlider + dJointSetSliderAxis: bodies translate along
    ``world_axis`` only, relative rotation fully locked. Slide position 0
    is the creation pose; ``set_hinge_limits``/``set_hinge_motor`` apply in
    meters / m/s / N along the axis."""
    ax = jnp.asarray(world_axis, state.pos.dtype)
    ax = ax / jnp.maximum(jnp.linalg.norm(ax), _EPS)
    # anchor on the slide line: body a's origin at creation
    j = add_ball(joints, state, slot, a, b, state.pos[a])
    ra = quat_m.to_matrix(state.quat[a])
    rb = quat_m.to_matrix(state.quat[b])
    ref_w, _ = _perp_basis(ax)
    return j.replace(
        kind=j.kind.at[slot].set(JOINT_SLIDER),
        axis_a=j.axis_a.at[slot].set(ra.T @ ax),
        axis_b=j.axis_b.at[slot].set(rb.T @ ax),
        ref_a=j.ref_a.at[slot].set(ra.T @ ref_w),
        ref_b=j.ref_b.at[slot].set(rb.T @ ref_w),
    )


def add_universal(joints: JointSet, state: WorldState, slot: int,
                  a: int, b: int, world_anchor, axis1, axis2) -> JointSet:
    """dJointCreateUniversal: ball anchor + axis1 (fixed in a) stays
    perpendicular to axis2 (fixed in b). axis1 ⊥ axis2 required at
    creation (a drive-shaft cross)."""
    j = add_ball(joints, state, slot, a, b, world_anchor)
    f = state.pos.dtype
    a1 = jnp.asarray(axis1, f)
    a1 = a1 / jnp.maximum(jnp.linalg.norm(a1), _EPS)
    a2 = jnp.asarray(axis2, f)
    a2 = a2 / jnp.maximum(jnp.linalg.norm(a2), _EPS)
    ra = quat_m.to_matrix(state.quat[a])
    rb = quat_m.to_matrix(state.quat[b])
    return j.replace(
        kind=j.kind.at[slot].set(JOINT_UNIVERSAL),
        axis_a=j.axis_a.at[slot].set(ra.T @ a1),
        axis_b=j.axis_b.at[slot].set(rb.T @ a2),
    )


def slider_position(state: WorldState, joints: JointSet):
    """(J,) slide distance along the axis relative to the creation pose
    (dJointGetSliderPosition)."""
    a, b = joints.a, joints.b
    ra = quat_m.to_matrix(state.quat[a])
    rb = quat_m.to_matrix(state.quat[b])
    u = jnp.einsum("jik,jk->ji", ra, joints.axis_a)
    pa = state.pos[a] + jnp.einsum("jik,jk->ji", ra, joints.anchor_a)
    pb = state.pos[b] + jnp.einsum("jik,jk->ji", rb, joints.anchor_b)
    return jnp.sum((pb - pa) * u, -1)


def hinge_angle(state: WorldState, joints: JointSet):
    """(J,) current hinge angles (radians, relative to creation pose)."""
    a, b = joints.a, joints.b
    ra = quat_m.to_matrix(state.quat[a])
    rb = quat_m.to_matrix(state.quat[b])
    u = jnp.einsum("jik,jk->ji", ra, joints.axis_a)
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), _EPS)
    pa = jnp.einsum("jik,jk->ji", ra, joints.ref_a)
    pb = jnp.einsum("jik,jk->ji", rb, joints.ref_b)
    # project both references into the plane ⊥ u, angle from a's to b's
    pa = pa - u * jnp.sum(pa * u, -1, keepdims=True)
    pb = pb - u * jnp.sum(pb * u, -1, keepdims=True)
    s = jnp.sum(jnp.cross(pa, pb) * u, -1)
    c = jnp.sum(pa * pb, -1)
    return jnp.arctan2(s, c)


def _perp_basis(u):
    """Deterministic orthonormal (p, q) completing unit axis u; (..., 3)."""
    ax = jnp.argmin(jnp.abs(u), axis=-1)
    e = jax.nn.one_hot(ax, 3, dtype=u.dtype)
    p = jnp.cross(u, e)
    p = p / jnp.maximum(jnp.linalg.norm(p, axis=-1, keepdims=True), _EPS)
    q = jnp.cross(u, p)
    return p, q


def connected_mask(joints: JointSet, num_slots: int) -> jnp.ndarray:
    """(N, N) True where the two slots are directly connected by a live
    joint — ODE's ``dAreConnected``. The step pipeline excludes these pairs
    from collision, matching the conventional ODE nearCallback pattern of
    skipping connected bodies (jointed assemblies would otherwise fight
    their own contacts)."""
    live = joints.kind != JOINT_NONE
    cols = jnp.arange(num_slots)
    oh_a = (joints.a[:, None] == cols[None, :]) & live[:, None]   # (J, N)
    oh_b = (joints.b[:, None] == cols[None, :]) & live[:, None]
    m = (jnp.einsum("jn,jm->nm", oh_a.astype(jnp.float32),
                    oh_b.astype(jnp.float32)) > 0)
    return m | m.T


def joint_rows(state: WorldState, joints: JointSet, config: EngineConfig):
    """Per-step packed bilateral rows (R = J·ROWS_PER_JOINT, fixed-shape):

    returns dict of (R, …) arrays: body indices, linear axis ``n`` (zero
    for angular rows), rel-velocity angular weights ``wa``/``wb``
    (J's angular blocks: r×n for linear rows, the axis itself for angular
    rows), effective mass ``d``, ERP bias ``rhs``, and ``live``.
    """
    f = state.pos.dtype
    jcap = joints.capacity
    dt = config.dt
    erp_dt = config.erp / dt

    a, b = joints.a, joints.b
    ra = quat_m.to_matrix(state.quat[a])                  # (J, 3, 3)
    rb = quat_m.to_matrix(state.quat[b])
    pa = state.pos[a] + jnp.einsum("jik,jk->ji", ra, joints.anchor_a)
    pb = state.pos[b] + jnp.einsum("jik,jk->ji", rb, joints.anchor_b)
    arm_a = pa - state.pos[a]                             # (J, 3)
    arm_b = pb - state.pos[b]

    axis_w = jnp.einsum("jik,jk->ji", ra, joints.axis_a)  # hinge axis, world
    axis_w = axis_w / jnp.maximum(
        jnp.linalg.norm(axis_w, axis=-1, keepdims=True), _EPS)
    axis_b_w = jnp.einsum("jik,jk->ji", rb, joints.axis_b)
    p_ax, q_ax = _perp_basis(axis_w)

    is_ball = joints.kind == JOINT_BALL
    is_hinge = joints.kind == JOINT_HINGE
    is_fixed = joints.kind == JOINT_FIXED
    is_slider = joints.kind == JOINT_SLIDER
    is_univ = joints.kind == JOINT_UNIVERSAL
    rot_locked = is_fixed | is_slider
    live_j = is_ball | is_hinge | is_fixed | is_slider | is_univ

    err = pa - pb                                         # anchor separation
    # hinge axis misalignment: u = axis_b × axis_a, projected on p/q
    mis = jnp.cross(axis_b_w, axis_w)
    # full orientation error for rotation-locked joints (two-frame-vector
    # form: rotating b by err aligns its stored frame with a's)
    ref_a_w = jnp.einsum("jik,jk->ji", ra, joints.ref_a)
    ref_b_w = jnp.einsum("jik,jk->ji", rb, joints.ref_b)
    rot_err = 0.5 * (jnp.cross(axis_b_w, axis_w)
                     + jnp.cross(ref_b_w, ref_a_w))

    eye = jnp.eye(3, dtype=f)
    inf_j = jnp.full((jcap,), jnp.inf, f)
    zero_j = jnp.zeros((jcap,), f)

    sel3 = lambda c, x, y: jnp.where(c[:, None], x, y)

    rows_n, rows_wa, rows_wb = [], [], []
    rows_rhs, rows_live, rows_lob, rows_hib = [], [], [], []
    # 3 anchor rows. Ball/hinge/fixed: world basis axes. Slider: the two
    # lateral axes ⊥ the slide axis (motion ALONG the axis is free), and
    # the third slot becomes the first rotation-lock row.
    lat = (p_ax, q_ax)
    for i in range(3):
        e_i = jnp.broadcast_to(eye[i], (jcap, 3))
        if i < 2:
            n = sel3(is_slider, lat[i], e_i)
            rows_n.append(n)
            rows_wa.append(jnp.cross(arm_a, n))           # r_a × n
            rows_wb.append(jnp.cross(arm_b, n))
            rows_rhs.append(erp_dt * jnp.where(
                is_slider, jnp.sum(err * n, -1), err[:, i]))
            rows_live.append(live_j)
        else:
            # slider: angular rot-lock about e_x instead of a third anchor
            rows_n.append(sel3(~is_slider, e_i, jnp.zeros((jcap, 3), f)))
            rows_wa.append(sel3(is_slider, jnp.broadcast_to(eye[0], (jcap, 3)),
                                jnp.cross(arm_a, e_i)))
            rows_wb.append(sel3(is_slider, jnp.broadcast_to(eye[0], (jcap, 3)),
                                jnp.cross(arm_b, e_i)))
            rows_rhs.append(erp_dt * jnp.where(
                is_slider, rot_err[:, 0], err[:, i]))
            rows_live.append(live_j)
        rows_lob.append(-inf_j)
        rows_hib.append(inf_j)
    # universal: keep axis1 (a-fixed, = axis_w) ⊥ axis2 (b-fixed):
    # C = a1·a2, dC/dt = −(w_b − w_a)·(a1×a2) → row axis u = a1×a2 with
    # target +erp/dt·C (sign: positive dλ increases (w_b−w_a)·u = −dC/dt)
    u_cross = jnp.cross(axis_w, axis_b_w)
    u_norm = jnp.linalg.norm(u_cross, axis=-1, keepdims=True)
    u_cross = u_cross / jnp.maximum(u_norm, 1e-3)   # degenerate at gimbal
    c_perp = jnp.sum(axis_w * axis_b_w, -1)

    # 2 angular rows. Hinge: perpendicular pair with axis-misalignment
    # bias. Fixed: rot-lock about e_x, e_y. Slider: rot-lock e_y, e_z.
    # Universal: first slot is the perpendicularity row, second dead.
    for k_ang in range(2):
        hinge_ax = lat[k_ang]
        lock_ax_f = jnp.broadcast_to(eye[k_ang], (jcap, 3))       # fixed
        lock_ax_s = jnp.broadcast_to(eye[k_ang + 1], (jcap, 3))   # slider
        ax = sel3(is_hinge, hinge_ax, sel3(is_slider, lock_ax_s, lock_ax_f))
        if k_ang == 0:
            ax = sel3(is_univ, u_cross, ax)
        rows_n.append(jnp.zeros((jcap, 3), f))
        rows_wa.append(ax)
        rows_wb.append(ax)
        rows_rhs.append(jnp.where(
            is_hinge, erp_dt * jnp.sum(mis * ax, -1),
            jnp.where(is_univ & (k_ang == 0), erp_dt * c_perp,
                      erp_dt * jnp.sum(rot_err * ax, -1))))
        rows_live.append(is_hinge | rot_locked
                         | (is_univ if k_ang == 0 else jnp.zeros_like(is_univ)))
        rows_lob.append(-inf_j)
        rows_hib.append(inf_j)

    # motor row. Hinge: angular drive about the axis (dParamVel/dParamFMax,
    # impulse clamped to ±fmax·dt). Slider: LINEAR drive along the axis.
    # Fixed: third rot-lock row (e_z).
    mot_n = sel3(is_slider, axis_w, jnp.zeros((jcap, 3), f))
    ez = jnp.broadcast_to(eye[2], (jcap, 3))
    mot_wa = sel3(is_hinge, axis_w,
                  sel3(is_fixed, ez, jnp.cross(arm_a, mot_n)))
    mot_wb = sel3(is_hinge, axis_w,
                  sel3(is_fixed, ez, jnp.cross(arm_b, mot_n)))
    rows_n.append(mot_n)
    rows_wa.append(mot_wa)
    rows_wb.append(mot_wb)
    rows_rhs.append(jnp.where(is_fixed, erp_dt * rot_err[:, 2],
                              joints.motor_vel))
    rows_live.append(((is_hinge | is_slider) & (joints.motor_fmax > 0.0))
                     | is_fixed)
    rows_lob.append(jnp.where(is_fixed, -inf_j, -joints.motor_fmax * dt))
    rows_hib.append(jnp.where(is_fixed, inf_j, joints.motor_fmax * dt))

    # limit row: one-sided stop when the hinge angle / slide position is
    # outside [lo, hi] (ERP-driven, optionally restituting — dParamBounce)
    coord = jnp.where(is_slider, slider_position(state, joints),
                      hinge_angle(state, joints))
    below = coord < joints.lo
    above = coord > joints.hi
    stop_target = jnp.where(below, erp_dt * (joints.lo - coord),
                            erp_dt * (joints.hi - coord))
    # dParamBounce: if approaching the stop faster than bounce_vel, the
    # target restitutes the pre-solve approach velocity (like contact
    # restitution, src/main.c:685-687 semantics applied to the stop)
    wvel = state.angvel
    axis_rel = (jnp.sum(wvel[b] * axis_w, -1)
                - jnp.sum(wvel[a] * axis_w, -1))
    lin_rel = (jnp.sum(state.linvel[b] * axis_w, -1)
               - jnp.sum(state.linvel[a] * axis_w, -1))
    coord_vel = jnp.where(is_slider, lin_rel, axis_rel)
    approaching = jnp.where(below, coord_vel < 0.0, coord_vel > 0.0)
    bounce_target = jnp.where(
        approaching & (joints.stop_bounce > 0.0)
        & (jnp.abs(coord_vel) > config.bounce_vel),
        -joints.stop_bounce * coord_vel, 0.0)
    stop_target = jnp.where(below, jnp.maximum(stop_target, bounce_target),
                            jnp.minimum(stop_target, bounce_target))
    lim_n = sel3(is_slider, axis_w, jnp.zeros((jcap, 3), f))
    rows_n.append(lim_n)
    rows_wa.append(sel3(is_hinge, axis_w, jnp.cross(arm_a, lim_n)))
    rows_wb.append(sel3(is_hinge, axis_w, jnp.cross(arm_b, lim_n)))
    rows_rhs.append(stop_target)
    rows_live.append((is_hinge | is_slider) & (below | above))
    rows_lob.append(jnp.where(below, zero_j, -inf_j))
    rows_hib.append(jnp.where(below, inf_j, zero_j))

    rpj = ROWS_PER_JOINT
    # interleave per joint: (J, R/J, …) → (R,)
    n = jnp.stack(rows_n, 1).reshape(jcap * rpj, 3)
    wa = jnp.stack(rows_wa, 1).reshape(jcap * rpj, 3)
    wb = jnp.stack(rows_wb, 1).reshape(jcap * rpj, 3)
    rhs = jnp.stack(rows_rhs, 1).reshape(jcap * rpj)
    live = jnp.stack(rows_live, 1).reshape(jcap * rpj)
    lob = jnp.stack(rows_lob, 1).reshape(jcap * rpj)
    hib = jnp.stack(rows_hib, 1).reshape(jcap * rpj)

    a_r = jnp.repeat(a, rpj)
    b_r = jnp.repeat(b, rpj)

    inv_i = world_inv_inertia(state)                      # (N, 3, 3)
    inv_m = state.inv_mass
    ii_a, ii_b = inv_i[a_r], inv_i[b_r]

    def iiv(ii, v):                                       # (R,3,3)·(R,3)
        return jnp.sum(ii * v[:, None, :], axis=-1)

    ang_resp_a = iiv(ii_a, wa)                            # invI_a·wa
    ang_resp_b = iiv(ii_b, wb)
    d = (jnp.sum(n * n, -1) * (inv_m[a_r] + inv_m[b_r])
         + jnp.sum(wa * ang_resp_a, -1)
         + jnp.sum(wb * ang_resp_b, -1))
    cfm_term = config.cfm / dt
    d = d + cfm_term

    # mass-splitting degree for the parallel (Jacobi) update: JOINTS (not
    # rows) touching each body — mirrors the contact κ, which counts
    # contacts, not axis rows
    cols = jnp.arange(state.num_slots)
    deg = (jnp.sum((cols[None, :] == a[:, None]) & live_j[:, None], 0)
           + jnp.sum((cols[None, :] == b[:, None]) & live_j[:, None], 0)
           ).astype(f)
    split = jnp.maximum(jnp.maximum(deg[a_r], deg[b_r]), 1.0)

    return dict(a=a_r, b=b_r, n=n, wa=wa, wb=wb,
                ang_resp_a=ang_resp_a, ang_resp_b=ang_resp_b,
                inv_m_a=inv_m[a_r], inv_m_b=inv_m[b_r],
                d=(d - cfm_term) * split + cfm_term,
                d_seq=d,
                rhs=rhs, live=live, lob=lob, hib=hib)


def joint_iteration(vel8, rows, lam, omega, cfm_term):
    """One BATCHED (Jacobi, mass-split) relaxation pass over all joint rows
    (equality rows have ±inf clamp bounds; motor/limit rows are clamped).

    ``vel8``: (N, 8) packed [linvel ‖ angvel ‖ pad] (the Jacobi solver's
    carry). Gather-compute-scatter with one-hot matmuls, like the contact
    pass; rows see the velocities from the START of the pass so the update
    is deterministic and batched. Stability requires the mass-SPLIT
    effective mass ``rows["d"]`` (split by per-body joint degree) — the
    throughput JACOBI solver's pass. The conformance PGS path uses
    ``joint_iteration_seq`` instead (exact QuickStep sweep order).
    Returns (vel8', lam').
    """
    f = vel8.dtype
    nslots = vel8.shape[0]
    a, b = rows["a"], rows["b"]
    oh_a = jax.nn.one_hot(a, nslots, dtype=f)             # (R, N)
    oh_b = jax.nn.one_hot(b, nslots, dtype=f)
    va = oh_a @ vel8                                      # (R, 8)
    vb = oh_b @ vel8

    rel = (jnp.sum((vb[:, 0:3] - va[:, 0:3]) * rows["n"], -1)
           + jnp.sum(vb[:, 3:6] * rows["wb"], -1)
           - jnp.sum(va[:, 3:6] * rows["wa"], -1))
    d = rows["d"]
    # target velocity = +erp/dt · constraint error (drives the error to
    # zero: positive dλ pushes body b along +n / body a along −n);
    # equality rows have ±inf bounds, motor/limit rows are clamped
    dl = omega * (rows["rhs"] - rel - cfm_term * lam) / d
    new_lam = jnp.clip(lam + dl, rows["lob"], rows["hib"])
    dl = jnp.where(rows["live"], new_lam - lam, 0.0)
    lam = lam + dl

    imp = rows["n"] * dl[:, None]                         # (R, 3)
    contrib_a = jnp.concatenate(
        [-rows["inv_m_a"][:, None] * imp,
         -rows["ang_resp_a"] * dl[:, None],
         jnp.zeros((imp.shape[0], 2), f)], -1)            # (R, 8)
    contrib_b = jnp.concatenate(
        [rows["inv_m_b"][:, None] * imp,
         rows["ang_resp_b"] * dl[:, None],
         jnp.zeros((imp.shape[0], 2), f)], -1)
    dv = oh_a.T @ contrib_a + oh_b.T @ contrib_b          # (N, 8)
    return vel8 + dv, lam


def joint_iteration_seq(vel8, rows, lam, omega, cfm_term):
    """One SEQUENTIAL (Gauss-Seidel) SOR pass over the joint rows — each
    row sees the velocities already updated by every previous row, exactly
    ODE QuickStep's sweep semantics for bilateral rows.

    Used by the conformance-grade PGS path and the DANTZIG bilateral
    post-pass. The batched ``joint_iteration`` (Jacobi, snapshot
    velocities) is only stable with the mass-split effective mass
    (``rows["d"]``); with the plain ``d_seq`` it DIVERGES on joint chains —
    two joints sharing a body (e.g. hinge + ball in a two-link pendulum)
    both apply full-magnitude corrections against the same snapshot, the
    summed update overshoots ~2x, and the per-step iteration loop amplifies
    it (found by the hinge_chain conformance trajectory,
    tests/test_conformance_referee.py). Gauss-Seidel has no such
    self-coupling term, matching the referee's sequential mirror
    (testing/referee.py:_joint_pass).

    Scalar scan over R = J·7 rows: the conformance path trades lanes for
    exact QuickStep ordering (same design choice as solve_pgs's row scan).
    """
    f = vel8.dtype

    def one_row(carry, i):
        v8, lm = carry
        a, b = rows["a"][i], rows["b"][i]
        va, vb = v8[a], v8[b]
        rel = (jnp.sum((vb[0:3] - va[0:3]) * rows["n"][i])
               + jnp.sum(vb[3:6] * rows["wb"][i])
               - jnp.sum(va[3:6] * rows["wa"][i]))
        dl = (omega * (rows["rhs"][i] - rel - cfm_term * lm[i])
              / rows["d_seq"][i])
        new = jnp.clip(lm[i] + dl, rows["lob"][i], rows["hib"][i])
        dl = jnp.where(rows["live"][i], new - lm[i], 0.0)
        lm = lm.at[i].add(dl)
        imp = rows["n"][i] * dl
        z2 = jnp.zeros((2,), f)
        v8 = v8.at[a].add(jnp.concatenate(
            [-rows["inv_m_a"][i] * imp, -rows["ang_resp_a"][i] * dl, z2]))
        v8 = v8.at[b].add(jnp.concatenate(
            [rows["inv_m_b"][i] * imp, rows["ang_resp_b"][i] * dl, z2]))
        return (v8, lm), None

    (vel8, lam), _ = jax.lax.scan(
        one_row, (vel8, lam), jnp.arange(rows["rhs"].shape[0]))
    return vel8, lam


def feedback(rows, lam, dt: float):
    """dJointGetFeedback analog: constraint force/torque applied to each
    body by each joint, from the solved per-row impulses ``lam`` (R,).

    Returns dict of (J, 3) world-frame arrays: force_a/torque_a applied to
    body a, force_b/torque_b to body b (forces = impulse / dt, like ODE's
    feedback which reports the last step's constraint force).
    """
    rpj = ROWS_PER_JOINT
    r = lam.shape[0]
    jcap = r // rpj
    lam_c = lam[:, None]
    f_b = (rows["n"] * lam_c).reshape(jcap, rpj, 3).sum(1) / dt
    t_b = (rows["wb"] * lam_c).reshape(jcap, rpj, 3).sum(1) / dt
    t_a = -(rows["wa"] * lam_c).reshape(jcap, rpj, 3).sum(1) / dt
    return dict(force_a=-f_b, torque_a=t_a, force_b=f_b, torque_b=t_b)
