"""Bilateral joints (ball/hinge) — beyond-parity capability tests.

The reference game uses contact joints only; the ODE engine it links also
provides bilateral joints, implemented here as unclamped solver rows
interleaved with the contact sweep (ops/joints.py).
"""

import numpy as np
import jax
import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
from rl_ode_physics_tpu.core.state import BodyType
from rl_ode_physics_tpu.core.world import make_step_fn
from rl_ode_physics_tpu.models.builder import WorldBuilder
from rl_ode_physics_tpu.ops import joints as jt
from rl_ode_physics_tpu.utils import quat as quat_m
import pytest

CFG = EngineConfig(max_bodies=8, max_pair_candidates=32, max_contacts=32)


def _anchor_world(w, joints, slot, side="a"):
    body = int(getattr(joints, side)[slot])
    loc = getattr(joints, f"anchor_{side}")[slot]
    r = quat_m.to_matrix(w.quat[body])
    return np.asarray(w.pos[body] + r @ loc)


def _pendulum(solver=SolverKind.JACOBI, iters=None):
    cfg = CFG.replace(solver=solver)
    if iters:
        cfg = cfg.replace(solver_iterations=iters)
    b = WorldBuilder(cfg, 0)
    # static anchor block at the origin, bob hanging via a rod-less ball
    b.add_body_map((0.0, 3.0, 0.0), (0.0, 0.0, 0.0), (0.2, 0.2, 0.2))
    b.add_body(BodyType.BOX, (1.0, 3.0, 0.0), (0.3, 0.3, 0.3))
    w = b.finish()
    joints = jt.empty_joints(4)
    joints = jt.add_ball(joints, w, 0, 0, 1, (0.0, 3.0, 0.0))
    return cfg, w, joints


def test_ball_pendulum_holds_anchor():
    """Ball-joint pendulum: the bob swings under gravity but its anchor
    point stays pinned (drift well under the body size) over 240 substeps,
    and the swing actually happens (the bob falls from horizontal)."""
    cfg, w, joints = _pendulum()
    stepf = make_step_fn(cfg, substeps=8, donate=False, joints=joints)
    y_min = 3.0
    for _ in range(30):
        w = stepf(w)
        y_min = min(y_min, float(w.pos[1, 1]))
        pa = _anchor_world(w, joints, 0, "a")
        pb = _anchor_world(w, joints, 0, "b")
        assert np.linalg.norm(pa - pb) < 0.05, "anchor drifted apart"
    assert y_min < 2.6, "pendulum never swung down"
    # rod length |bob - anchor| stays 1 (anchor offset is (-1,0,0) in bob frame)
    d = np.linalg.norm(np.asarray(w.pos[1]) - np.array([0.0, 3.0, 0.0]))
    assert abs(d - 1.0) < 0.06


@pytest.mark.slow
def test_ball_pendulum_pgs_matches_jacobi_roughly():
    cfg_j, w, joints = _pendulum()
    cfg_p, _, _ = _pendulum(solver=SolverKind.PGS)
    fj = make_step_fn(cfg_j, substeps=8, donate=False, joints=joints)
    fp = make_step_fn(cfg_p, substeps=8, donate=False, joints=joints)
    wj = wp = w
    for _ in range(10):
        wj = fj(wj)
        wp = fp(wp)
    assert np.allclose(np.asarray(wj.pos[1]), np.asarray(wp.pos[1]),
                       atol=0.15)


def test_hinge_restricts_rotation_axis():
    """Hinge about world z: the door's angular velocity stays parallel to
    z while it swings; the anchor stays pinned."""
    cfg = CFG
    b = WorldBuilder(cfg, 0)
    b.add_body_map((0.0, 3.0, 0.0), (0.0, 0.0, 0.0), (0.2, 0.2, 0.2))
    b.add_body(BodyType.BOX, (1.0, 3.0, 0.0), (1.6, 0.2, 0.2))
    w = b.finish()
    joints = jt.empty_joints(4)
    joints = jt.add_hinge(joints, w, 0, 0, 1, (0.0, 3.0, 0.0),
                          (0.0, 0.0, 1.0))
    stepf = make_step_fn(cfg, substeps=8, donate=False, joints=joints)
    y_min = 3.0
    for _ in range(25):
        w = stepf(w)
        y_min = min(y_min, float(w.pos[1, 1]))
        ang = np.asarray(w.angvel[1])
        perp = np.linalg.norm(ang[:2])
        assert perp < 0.15 * max(1.0, abs(ang[2])) + 0.05, \
            f"off-axis rotation {ang}"
    # it swung about z (the door is a pendulum — track the low point, it
    # may be back near the top after ~1.7 s)
    assert y_min < 2.7
    pa = _anchor_world(w, joints, 0, "a")
    pb = _anchor_world(w, joints, 0, "b")
    assert np.linalg.norm(pa - pb) < 0.06


def test_ball_chain_hangs_vertically():
    """3-link ball chain from a static anchor settles hanging down."""
    cfg = CFG
    b = WorldBuilder(cfg, 0)
    b.add_body_map((0.0, 5.0, 0.0), (0.0, 0.0, 0.0), (0.2, 0.2, 0.2))
    for i in range(3):
        b.add_body(BodyType.BOX, (0.8 * (i + 1), 5.0, 0.0), (0.3, 0.3, 0.3))
    w = b.finish()
    joints = jt.empty_joints(4)
    joints = jt.add_ball(joints, w, 0, 0, 1, (0.4, 5.0, 0.0))
    joints = jt.add_ball(joints, w, 1, 1, 2, (1.2, 5.0, 0.0))
    joints = jt.add_ball(joints, w, 2, 2, 3, (2.0, 5.0, 0.0))
    stepf = make_step_fn(cfg, substeps=8, donate=False, joints=joints)
    for _ in range(120):
        w = stepf(w)
        # an undamped chain swings forever; damp between ticks so it
        # settles into the constraint-satisfying equilibrium
        w = w.replace(linvel=w.linvel * 0.9, angvel=w.angvel * 0.9)
    pos = np.asarray(w.pos[1:4])
    # links ordered downward, roughly below the anchor
    assert pos[0, 1] > pos[1, 1] > pos[2, 1]
    assert abs(pos[2, 0]) < 0.6
    # chain did not stretch: total length anchor→last within 10%
    total = (np.linalg.norm(pos[0] - [0.4, 5.0, 0.0])
             + np.linalg.norm(pos[1] - pos[0])
             + np.linalg.norm(pos[2] - pos[1]))
    assert total < 2.0 * 1.15


def test_joints_under_vmap():
    """Joint solve composes with vmap over worlds (same JointSet)."""
    from rl_ode_physics_tpu.parallel.batch import replicate

    cfg, w, joints = _pendulum()
    batch = replicate(w, 3)
    f = jax.jit(jax.vmap(
        lambda s: __import__("rl_ode_physics_tpu.core.world",
                             fromlist=["step"]).step(s, cfg, joints=joints)))
    for _ in range(20):
        batch = f(batch)
    pa = np.asarray(batch.pos[:, 1])
    assert np.allclose(pa, pa[0:1], atol=1e-6)      # identical worlds agree
    d = np.linalg.norm(pa[0] - np.array([0.0, 3.0, 0.0]))
    assert abs(d - 1.0) < 0.06


def test_joint_with_contacts():
    """A jointed bob colliding with the floor: both constraint types are
    satisfied simultaneously (rod keeps length, bob stays above floor)."""
    cfg = CFG
    b = WorldBuilder(cfg, 0)
    b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (20.0, 0.5, 20.0))
    b.add_body_map((0.0, 1.1, 0.0), (0.0, 0.0, 0.0), (0.2, 0.2, 0.2))
    b.add_body(BodyType.SPHERE, (1.0, 1.1, 0.0), (0.3, 0.0, 0.0))
    w = b.finish()
    joints = jt.empty_joints(2)
    joints = jt.add_ball(joints, w, 0, 1, 2, (0.0, 1.1, 0.0))
    stepf = make_step_fn(cfg, substeps=8, donate=False, joints=joints)
    for _ in range(60):
        w = stepf(w)
    p = np.asarray(w.pos[2])
    assert p[1] > 0.5          # resting on the floor (0.25 slab + 0.3 r)
    d = np.linalg.norm(p - np.array([0.0, 1.1, 0.0]))
    assert abs(d - 1.0) < 0.08  # rod length held while resting


def test_hinge_motor_reaches_target_velocity():
    """Motor (dParamVel/dParamFMax): the hinge spins up to the target
    angular velocity and holds it against gravity."""
    cfg = CFG
    b = WorldBuilder(cfg, 0)
    b.add_body_map((0.0, 3.0, 0.0), (0.0, 0.0, 0.0), (0.2, 0.2, 0.2))
    b.add_body(BodyType.BOX, (1.0, 3.0, 0.0), (1.6, 0.2, 0.2))
    w = b.finish()
    joints = jt.empty_joints(2)
    joints = jt.add_hinge(joints, w, 0, 0, 1, (0.0, 3.0, 0.0),
                          (0.0, 0.0, 1.0))
    joints = jt.set_hinge_motor(joints, 0, vel=2.0, fmax=50.0)
    stepf = make_step_fn(cfg, substeps=8, donate=False, joints=joints)
    for _ in range(30):
        w = stepf(w)
    wz = float(w.angvel[1, 2])
    assert abs(wz - 2.0) < 0.25, f"motor speed {wz} != 2.0"


def test_hinge_limit_stops_swing():
    """Limits (dParamLoStop/HiStop): a falling door stops at the -45° stop
    instead of swinging through."""
    cfg = CFG
    b = WorldBuilder(cfg, 0)
    b.add_body_map((0.0, 3.0, 0.0), (0.0, 0.0, 0.0), (0.2, 0.2, 0.2))
    b.add_body(BodyType.BOX, (1.0, 3.0, 0.0), (1.6, 0.2, 0.2))
    w = b.finish()
    joints = jt.empty_joints(2)
    joints = jt.add_hinge(joints, w, 0, 0, 1, (0.0, 3.0, 0.0),
                          (0.0, 0.0, 1.0))
    lo = -np.pi / 4
    joints = jt.set_hinge_limits(joints, 0, lo=lo, hi=np.pi / 4)
    stepf = make_step_fn(cfg, substeps=8, donate=False, joints=joints)
    min_angle = 0.0
    for _ in range(40):
        w = stepf(w)
        ang = float(jt.hinge_angle(w, joints)[0])
        min_angle = min(min_angle, ang)
    # gravity pulls the door toward -pi/2; the stop holds it near -pi/4
    assert min_angle < -0.3, "door never swung"
    assert min_angle > lo - 0.15, f"swung through the stop: {min_angle}"
    final = float(jt.hinge_angle(w, joints)[0])
    assert abs(final - lo) < 0.2, f"did not settle at the stop: {final}"


def test_fixed_joint_locks_relative_pose():
    """Fixed joint: a two-box 'welded' assembly falls as one rigid body —
    relative pose (offset and orientation) is preserved through tumbling."""
    cfg = CFG
    b = WorldBuilder(cfg, 0)
    b.add_body(BodyType.BOX, (0.0, 4.0, 0.0), (0.4, 0.4, 0.4))
    b.add_body(BodyType.BOX, (0.7, 4.0, 0.0), (0.4, 0.4, 0.4))
    w = b.finish()
    # give the assembly a spin so orientation locking is actually exercised
    w = w.replace(angvel=w.angvel.at[0].set(jnp.asarray([0.0, 2.0, 1.0])))
    joints = jt.empty_joints(2)
    joints = jt.add_fixed(joints, w, 0, 0, 1)
    stepf = make_step_fn(cfg, substeps=8, donate=False, joints=joints)
    for _ in range(20):
        w = stepf(w)
        d = np.linalg.norm(np.asarray(w.pos[1] - w.pos[0]))
        assert abs(d - 0.7) < 0.03, f"offset drifted to {d}"
    # orientations stayed identical (started identical, welded)
    qd = np.abs(np.asarray(w.quat[0]) - np.asarray(w.quat[1]))
    qd = min(float(qd.max()),
             float(np.abs(np.asarray(w.quat[0]) + np.asarray(w.quat[1])).max()))
    assert qd < 0.05, f"orientation drift {qd}"


def test_slider_translates_along_axis_only():
    """Slider along x: gravity can't move the hanging block (y is locked);
    a linear motor drives it along x at the target speed; the position
    limit stops it."""
    cfg = CFG
    b = WorldBuilder(cfg, 0)
    b.add_body_map((0.0, 3.0, 0.0), (0.0, 0.0, 0.0), (0.2, 0.2, 0.2))
    b.add_body(BodyType.BOX, (0.0, 3.0, 0.0), (0.4, 0.4, 0.4))
    w = b.finish()
    joints = jt.empty_joints(2)
    joints = jt.add_slider(joints, w, 0, 0, 1, (1.0, 0.0, 0.0))
    joints = jt.set_hinge_motor(joints, 0, vel=1.0, fmax=100.0)
    joints = jt.set_hinge_limits(joints, 0, lo=-10.0, hi=1.5)
    stepf = make_step_fn(cfg, substeps=8, donate=False, joints=joints)
    for i in range(15):
        w = stepf(w)
        p = np.asarray(w.pos[1])
        assert abs(p[1] - 3.0) < 0.02, f"slider sagged: {p}"
        assert abs(p[2]) < 0.02
    s = float(jt.slider_position(w, joints)[0])
    # motor drove it toward the 1.5 m stop (15 ticks x 1/15 s x 1 m/s = 1 m)
    assert s > 0.8, f"motor did not drive the slider: {s}"
    for _ in range(20):
        w = stepf(w)
    s = float(jt.slider_position(w, joints)[0])
    assert abs(s - 1.5) < 0.1, f"limit did not hold: {s}"
    # orientation never changed
    assert abs(float(w.quat[1, 0]) - 1.0) < 1e-3


def test_universal_keeps_axes_perpendicular():
    """Universal joint: anchored spinning body keeps axis1 (a-fixed, x)
    perpendicular to axis2 (b-fixed, y) while the bob swings and twists."""
    from rl_ode_physics_tpu.utils import quat as quat_m

    cfg = CFG
    b = WorldBuilder(cfg, 0)
    b.add_body_map((0.0, 3.0, 0.0), (0.0, 0.0, 0.0), (0.2, 0.2, 0.2))
    b.add_body(BodyType.BOX, (1.0, 3.0, 0.0), (0.5, 0.3, 0.3))
    w = b.finish()
    # kick it so it swings AND tries to twist
    w = w.replace(angvel=w.angvel.at[1].set(jnp.asarray([3.0, 0.0, 1.0])))
    joints = jt.empty_joints(2)
    joints = jt.add_universal(joints, w, 0, 0, 1, (0.0, 3.0, 0.0),
                              (1.0, 0.0, 0.0), (0.0, 1.0, 0.0))
    stepf = make_step_fn(cfg, substeps=8, donate=False, joints=joints)
    for _ in range(30):
        w = stepf(w)
        ra = np.eye(3)
        rb = np.asarray(quat_m.to_matrix(w.quat[1]))
        a1 = ra @ np.array([1.0, 0.0, 0.0])
        a2 = rb @ np.asarray(joints.axis_b[0])
        dot = abs(float(a1 @ a2))
        assert dot < 0.08, f"axes no longer perpendicular: {dot}"
        pa = _anchor_world(w, joints, 0, "a")
        pb = _anchor_world(w, joints, 0, "b")
        assert np.linalg.norm(pa - pb) < 0.06


@pytest.mark.slow
def test_hinge_stop_bounce():
    """dParamBounce: with bounce=0.8 the door rebounds off the stop with
    a substantial fraction of its approach speed; with bounce=0 it stays."""
    def run(bounce):
        cfg = CFG
        b = WorldBuilder(cfg, 0)
        b.add_body_map((0.0, 3.0, 0.0), (0.0, 0.0, 0.0), (0.2, 0.2, 0.2))
        b.add_body(BodyType.BOX, (1.0, 3.0, 0.0), (1.6, 0.2, 0.2))
        w = b.finish()
        joints = jt.empty_joints(2)
        joints = jt.add_hinge(joints, w, 0, 0, 1, (0.0, 3.0, 0.0),
                              (0.0, 0.0, 1.0))
        joints = jt.set_hinge_limits(joints, 0, lo=-np.pi / 4, hi=np.pi / 4,
                                     bounce=bounce)
        stepf = make_step_fn(cfg, substeps=8, donate=False, joints=joints)
        hit_speed = rebound = 0.0
        hit = False
        for _ in range(40):
            w = stepf(w)
            wz = float(w.angvel[1, 2])
            ang = float(jt.hinge_angle(w, joints)[0])
            if not hit and ang < -np.pi / 4 + 0.08:
                hit = True
                hit_speed = abs(wz)
            elif hit:
                rebound = max(rebound, wz)   # positive wz = swinging back up
        return hit_speed, rebound

    hs_b, reb_b = run(0.8)
    hs_0, reb_0 = run(0.0)
    assert hs_b > 0.5, "door never reached the stop"
    assert reb_b > 0.3 * hs_b, f"no rebound with bounce=0.8: {reb_b} vs {hs_b}"
    assert reb_0 < 0.5 * reb_b, f"bounce=0 rebounded too much: {reb_0}"


def test_joint_feedback_reports_pendulum_weight():
    """dJointGetFeedback analog: a bob hanging at rest below a ball joint
    reports a constraint force on the bob equal to +m·g (holding it up)."""
    from rl_ode_physics_tpu.core.world import step_with_diagnostics

    cfg = CFG
    b = WorldBuilder(cfg, 0)
    b.add_body_map((0.0, 3.0, 0.0), (0.0, 0.0, 0.0), (0.2, 0.2, 0.2))
    b.add_body(BodyType.BOX, (0.0, 2.0, 0.0), (0.3, 0.3, 0.3))
    w = b.finish()
    joints = jt.empty_joints(2)
    joints = jt.add_ball(joints, w, 0, 0, 1, (0.0, 3.0, 0.0))
    f = jax.jit(lambda s: step_with_diagnostics(s, cfg, joints=joints))
    for _ in range(200):
        w, m = f(w)
    fb = np.asarray(m["joint_force_b"][0])     # force on body b (the bob)
    # default mass 1, |g| = 9.81: joint holds the bob up against gravity
    assert abs(fb[1] - 9.81) < 0.6, f"vertical hold force {fb}"
    assert abs(fb[0]) < 0.6 and abs(fb[2]) < 0.6
