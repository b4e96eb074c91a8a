"""End-to-end physics behavior: integrator analytics, contact resolution,
stacking, momentum conservation, determinism (SURVEY.md §4 test pyramid)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
from rl_ode_physics_tpu.core.state import BodyType, create_world
from rl_ode_physics_tpu.core.world import (
    add_body, add_body_map, make_step_fn, step_with_diagnostics,
)
from rl_ode_physics_tpu.models import scenes

CFG = EngineConfig(max_bodies=8, max_pair_candidates=32, max_contacts=64)


def test_ballistic_free_fall_analytic():
    """No contacts: y(t) follows the semi-implicit Euler closed form."""
    w = create_world(CFG)
    h0 = 10.0
    w, _ = add_body(w, BodyType.SPHERE, (0.0, h0, 0.0), (0.1, 0.0, 0.0))
    stepf = make_step_fn(CFG, substeps=1, donate=False)
    k = 60
    for _ in range(k):
        w = stepf(w)
    dt, g = CFG.dt, 9.8
    # semi-implicit Euler: y_k = h0 - g dt^2 * k(k+1)/2
    expected = h0 - g * dt * dt * k * (k + 1) / 2
    assert abs(float(w.pos[0, 1]) - expected) < 1e-4
    assert abs(float(w.linvel[0, 1]) + g * dt * k) < 1e-4


def test_gravity_matches_reference_value():
    """Gravity is (0, -9.8, 0) — src/main.c:96."""
    assert CFG.gravity == (0.0, -9.8, 0.0)


def test_sphere_rests_on_floor():
    """Sphere settles at floor_top + radius (arena floor is a 100×1×100 box
    centered at the origin → top at y=0.5)."""
    w = scenes.sphere_drop_world(CFG, height=2.0, radius=0.15)
    stepf = make_step_fn(CFG, substeps=12, donate=False)
    for _ in range(30):
        w = stepf(w)
    assert abs(float(w.pos[4, 1]) - 0.65) < 5e-3
    assert abs(float(w.linvel[4, 1])) < 1e-2


def test_restitution_bounce():
    """With bounce=0.2 (src/main.c:685) a falling sphere rebounds with
    roughly 0.2× its impact speed."""
    w = scenes.sphere_drop_world(CFG, height=1.0, radius=0.15)
    stepf = make_step_fn(CFG, substeps=1, donate=False)
    prev_vy = 0.0
    impact_v = None
    bounce_v = None
    for _ in range(240):
        w = stepf(w)
        vy = float(w.linvel[4, 1])
        if impact_v is None and prev_vy < -0.5 and vy > 0.0:
            impact_v = -prev_vy
            bounce_v = vy
            break
        prev_vy = vy
    assert impact_v is not None, "sphere never bounced"
    ratio = bounce_v / impact_v
    assert 0.05 < ratio < 0.4, f"bounce ratio {ratio} far from 0.2"


def test_no_bounce_below_threshold():
    """Impacts slower than bounce_vel=0.1 (src/main.c:686) don't rebound."""
    # start resting just 1mm above the surface → tiny impact speed
    w = scenes.grass_plane_world(CFG)
    w, _ = add_body(w, BodyType.SPHERE, (0.0, 0.651, 0.0), (0.15, 0.0, 0.0))
    stepf = make_step_fn(CFG, substeps=1, donate=False)
    max_vy = -1.0
    for _ in range(120):
        w = stepf(w)
        max_vy = max(max_vy, float(w.linvel[4, 1]))
    assert max_vy < 0.05


def test_sphere_sphere_momentum_conservation():
    """Head-on equal-mass collision, no gravity, no friction torque:
    linear momentum is conserved."""
    cfg = CFG.replace(gravity=(0.0, 0.0, 0.0))
    w = create_world(cfg)
    w, _ = add_body(w, BodyType.SPHERE, (-1.0, 0.0, 0.0), (0.3, 0.0, 0.0),
                    linvel=(2.0, 0.0, 0.0))
    w, _ = add_body(w, BodyType.SPHERE, (1.0, 0.0, 0.0), (0.3, 0.0, 0.0),
                    linvel=(-2.0, 0.0, 0.0))
    stepf = make_step_fn(cfg, substeps=4, donate=False)
    for _ in range(30):
        w = stepf(w)
    p = np.asarray(w.linvel[0] + w.linvel[1])
    assert np.allclose(p, 0.0, atol=1e-4)
    # they must have separated (moving apart or stopped)
    assert float(w.linvel[0, 0]) <= 1e-3 and float(w.linvel[1, 0]) >= -1e-3


def test_box_stack_stays_up():
    w = scenes.grass_plane_world(CFG)
    for i in range(3):
        w, _ = add_body(w, BodyType.BOX, (0.0, 1.0 + i * 1.01, 0.0),
                        (1.0, 1.0, 1.0))
    stepf = make_step_fn(CFG, substeps=12, donate=False)
    for _ in range(40):
        w = stepf(w)
    ys = [float(w.pos[4 + i, 1]) for i in range(3)]
    assert abs(ys[0] - 1.0) < 0.05
    assert abs(ys[1] - 2.0) < 0.08
    assert abs(ys[2] - 3.0) < 0.12


def test_capsule_rests_on_floor():
    w = scenes.grass_plane_world(CFG)
    # capsule lying horizontally (local Z along world X)
    from rl_ode_physics_tpu.utils import quat as q
    lying = q.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.asarray(np.pi / 2))
    w, _ = add_body(w, BodyType.CAPSULE, (0.0, 2.0, 0.0), (0.3, 1.0, 0.0),
                    quat=lying)
    stepf = make_step_fn(CFG, substeps=12, donate=False)
    for _ in range(40):
        w = stepf(w)
    # resting height = floor top (0.5) + radius
    assert abs(float(w.pos[4, 1]) - 0.8) < 0.02


def test_kinematic_body_ignores_gravity_and_is_immovable():
    w = scenes.grass_plane_world(CFG)
    w, _ = add_body(w, BodyType.BOX, (0.0, 3.0, 0.0), (1.0, 1.0, 1.0),
                    kinematic=True)
    w, _ = add_body(w, BodyType.SPHERE, (0.0, 4.2, 0.0), (0.3, 0.0, 0.0))
    stepf = make_step_fn(CFG, substeps=12, donate=False)
    for _ in range(30):
        w = stepf(w)
    # kinematic box unmoved; sphere rests on it
    assert abs(float(w.pos[4, 1]) - 3.0) < 1e-6
    assert abs(float(w.pos[5, 1]) - 3.8) < 0.02


def test_step_deterministic_bitwise():
    """Same initial state → bitwise identical trajectory (lockstep replay
    contract, SURVEY.md §2d)."""
    stepf = make_step_fn(CFG, substeps=4, donate=False)

    def run():
        w = scenes.stack_world(CFG.replace(max_bodies=8), num_bodies=3,
                               seed=99)
        for _ in range(20):
            w = stepf(w)
        return np.asarray(w.pos), np.asarray(w.quat), np.asarray(w.linvel)

    a = run()
    b = run()
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_vmap_batch_matches_single():
    """A vmapped batch of identical worlds evolves identically to one world."""
    from rl_ode_physics_tpu.core.world import step as step_one

    w = scenes.sphere_drop_world(CFG, height=2.0)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (4,) + x.shape), w
    )
    stepb = jax.jit(jax.vmap(lambda s: step_one(s, CFG)))
    stepf = make_step_fn(CFG, donate=False)
    for _ in range(30):
        batch = stepb(batch)
        w = stepf(w)
    for i in range(4):
        assert np.allclose(np.asarray(batch.pos[i]), np.asarray(w.pos),
                           atol=1e-6)


def test_diagnostics_counters():
    w = scenes.sphere_drop_world(CFG, height=0.6)
    fn = jax.jit(lambda s: step_with_diagnostics(s, CFG))
    for _ in range(30):
        w, m = fn(w)
    assert int(m["num_contacts"]) >= 1
    assert int(m["pair_overflow"]) == 0
    assert int(m["contact_overflow"]) == 0
    assert float(m["max_penetration"]) < 0.05
    assert int(m["num_bodies"]) == 1


def test_pgs_solver_also_settles():
    cfg = CFG.replace(solver=SolverKind.PGS, max_contacts=16,
                      max_pair_candidates=16)
    w = scenes.sphere_drop_world(cfg, height=1.0)
    stepf = make_step_fn(cfg, substeps=12, donate=False)
    for _ in range(20):
        w = stepf(w)
    assert abs(float(w.pos[4, 1]) - 0.65) < 5e-3


def test_infinite_friction_no_slide_on_slope():
    """mu = dInfinity (src/main.c:687): a box on the tilted red wall's
    slope must not slide. We emulate with a tilted static box + cube."""
    from rl_ode_physics_tpu.utils import quat as q
    w = create_world(CFG)
    w, _ = add_body_map(w, (0.0, 0.0, 0.0), (0.0, 0.0, -0.3),
                        (20.0, 1.0, 20.0))
    # place the cube on the incline, slightly above, axis-aligned with it
    tilt = q.from_euler_xyz(jnp.array([0.0, 0.0, -0.3]))
    from rl_ode_physics_tpu.utils.quat import rotate
    up_local = rotate(tilt, jnp.array([0.0, 1.1, 0.0]))
    w, _ = add_body(w, BodyType.BOX, np.asarray(up_local), (1.0, 1.0, 1.0),
                    quat=tilt)
    x0 = float(w.pos[1, 0])
    stepf = make_step_fn(CFG, substeps=12, donate=False)
    for _ in range(20):
        w = stepf(w)
    assert abs(float(w.pos[1, 0]) - x0) < 0.05, "box slid on infinite-friction slope"


def test_capsule_stack_world_settles():
    """BASELINE config 2: kinematic player capsule + box/sphere rain."""
    cfg = EngineConfig(max_bodies=24, max_pair_candidates=128,
                       max_contacts=256)
    w = scenes.capsule_stack_world(cfg, num_bodies=16, seed=7)
    stepf = make_step_fn(cfg, substeps=12, donate=False)
    for _ in range(120):            # bodies fall from y∈[20,50]
        w = stepf(w)
    import numpy as np
    dyn = np.asarray(w.dynamic & ~w.is_kinematic)
    ys = np.asarray(w.pos[:, 1])[dyn]
    assert ys.max() < 20.0, "bodies should have fallen"
    assert ys.min() > -2.0, "bodies must not tunnel through the floor"
    # the kinematic capsule stayed put
    cap = int(np.flatnonzero(np.asarray(w.is_kinematic))[0])
    assert abs(float(w.pos[cap, 1]) - 2.0) < 1e-5


def test_exact_box_clip_conformance_path():
    """Opt-in ODE-style Sutherland-Hodgman manifold: stacks settle the same
    as the default 8-candidate scheme."""
    for exact in (False, True):
        cfg = CFG.replace(exact_box_clip=exact, solver=SolverKind.PGS,
                          max_contacts=32, max_pair_candidates=16)
        w = scenes.grass_plane_world(cfg)
        w, _ = add_body(w, BodyType.BOX, (0.0, 1.2, 0.0), (1.0, 1.0, 1.0))
        # rotate 30 deg about y: exact clip produces the true octagonal
        # overlap footprint
        from rl_ode_physics_tpu.utils import quat as q
        rot = q.from_axis_angle(jnp.array([0.0, 1.0, 0.0]),
                                jnp.asarray(np.pi / 6))
        w, _ = add_body(w, BodyType.BOX, (0.0, 2.21, 0.0), (1.0, 1.0, 1.0),
                        quat=rot)
        stepf = make_step_fn(cfg, substeps=12, donate=False)
        for _ in range(30):
            w = stepf(w)
        assert abs(float(w.pos[4, 1]) - 1.0) < 0.05, f"exact={exact}"
        assert abs(float(w.pos[5, 1]) - 2.0) < 0.08, f"exact={exact}"


def test_capsule_capsule_contacts():
    """Parallel lying capsules get a 2-point manifold (torsional support);
    crossed capsules get one contact."""
    from rl_ode_physics_tpu.ops.narrowphase import _capsule_capsule
    from rl_ode_physics_tpu.utils import quat as q

    size = jnp.array([0.3, 2.0, 0.0])
    qz = q.identity()                       # capsules along world z
    # parallel, overlapping side by side, 0.5 apart (< 2r = 0.6)
    p, n, d, v = _capsule_capsule(
        jnp.array([0.0, 0.0, 0.0]), qz, size,
        jnp.array([0.5, 0.0, 0.3]), qz, size, 4)
    assert int(v.sum()) == 2
    assert np.allclose(np.asarray(d)[np.asarray(v)], 0.1, atol=1e-5)

    # crossed at right angles: one contact
    qx = q.from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.asarray(np.pi / 2))
    p, n, d, v = _capsule_capsule(
        jnp.array([0.0, 0.0, 0.0]), qz, size,
        jnp.array([0.0, 0.5, 0.0]), qx, size, 4)
    assert int(v.sum()) == 1

    # capsule stacked on capsule settles at 2r above
    cfg = CFG
    w = scenes.grass_plane_world(cfg)
    from rl_ode_physics_tpu.utils.quat import from_axis_angle
    lying = from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.asarray(np.pi / 2))
    w, _ = add_body(w, BodyType.CAPSULE, (0.0, 0.8, 0.0), (0.3, 1.0, 0.0),
                    quat=lying, kinematic=True)
    w, _ = add_body(w, BodyType.CAPSULE, (0.0, 1.6, 0.0), (0.3, 1.0, 0.0),
                    quat=lying)
    stepf = make_step_fn(cfg, substeps=12, donate=False)
    for _ in range(40):
        w = stepf(w)
    assert abs(float(w.pos[5, 1]) - 1.4) < 0.03   # 0.8 + 2r
