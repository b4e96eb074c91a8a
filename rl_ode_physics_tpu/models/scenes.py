"""Scene builders — the conformance workloads from BASELINE.json.

``grass_plane_world`` reproduces the reference server's arena exactly
(``StartServer`` world build, ``src/main.c:115-121``): a 100×1×100 floor at
the origin plus three static walls (the fourth is commented out in the
reference — ``src/main.c:119`` — so we also leave it out). Other builders
cover BASELINE configs 1, 2 and 4.

All builders assemble the SoA state host-side (``models.builder``) and
upload once; colors follow the raylib constants used at the call sites
(DARKGRAY, RED, GREEN, BLUE).
"""

from __future__ import annotations

import numpy as np

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import BodyType, WorldState
from rl_ode_physics_tpu.models.builder import WorldBuilder
from rl_ode_physics_tpu.utils.prng import RandStream

# raylib color constants used by the reference arena
DARKGRAY = (80, 80, 80, 255)
RED = (230, 41, 55, 255)
GREEN = (0, 228, 48, 255)
BLUE = (0, 121, 241, 255)


def _arena(config: EngineConfig, seed: int) -> WorldBuilder:
    b = WorldBuilder(config, seed)
    b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0),
                   (100.0, 1.0, 100.0), DARKGRAY)
    b.add_body_map((4.0, 3.0, 0.0), (0.0, 0.0, -0.5), (0.5, 8.0, 12.0), RED)
    b.add_body_map((0.0, 3.0, 6.0), (0.0, 0.0, 0.0), (12.0, 8.0, 0.5), GREEN)
    b.add_body_map((0.0, 3.0, -6.0), (0.0, 0.0, 0.0), (12.0, 8.0, 0.5), BLUE)
    return b


def grass_plane_world(config: EngineConfig, seed: int = 0) -> WorldState:
    """The reference arena (src/main.c:115-121): floor + 3 walls."""
    return _arena(config, seed).finish()


def sphere_drop_world(config: EngineConfig, height: float = 5.0,
                      radius: float = 0.15, seed: int = 0) -> WorldState:
    """BASELINE config 1: single sphere free-fall + bounce on the arena
    floor (radius matches the reference's SPACE-spawned sphere,
    ``src/main.c:524-527``)."""
    b = _arena(config, seed)
    b.add_body(BodyType.SPHERE, (0.0, height, 0.0), (radius, 0.0, 0.0))
    return b.finish()


def stack_world(config: EngineConfig, num_bodies: int = 64,
                seed: int = 1234) -> WorldState:
    """BASELINE config 2-style workload: box/sphere bodies raining onto the
    arena, sampled with the reference's spawn distribution
    (``src/main.c:502-522``: pos x,z∈[-4,4], y∈[20,50]; 50% box with sides
    ∈[0.2,1.0], else sphere with r∈[0.1,0.4]; color channels ∈[30,190))."""
    b = _arena(config, seed)
    rng = RandStream(seed)
    for _ in range(num_bodies):
        pos = (rng.double(-4.0, 4.0), rng.double(20.0, 50.0),
               rng.double(-4.0, 4.0))
        if rng.randint(0, 2) == 0:
            size = (rng.double(0.2, 1.0), rng.double(0.2, 1.0),
                    rng.double(0.2, 1.0))
            b.add_body(BodyType.BOX, pos, size, color=rng.color())
        else:
            size = (rng.double(0.1, 0.4), 0.0, 0.0)
            b.add_body(BodyType.SPHERE, pos, size, color=rng.color())
    return b.finish()


def capsule_stack_world(config: EngineConfig, num_bodies: int = 64,
                        seed: int = 7) -> WorldState:
    """BASELINE config 2: a player-style capsule plus box/sphere stacks."""
    b = _arena(config, seed)
    rng = RandStream(seed)
    for _ in range(num_bodies - 1):
        pos = (rng.double(-4.0, 4.0), rng.double(20.0, 50.0),
               rng.double(-4.0, 4.0))
        if rng.randint(0, 2) == 0:
            size = (rng.double(0.2, 1.0), rng.double(0.2, 1.0),
                    rng.double(0.2, 1.0))
            b.add_body(BodyType.BOX, pos, size, color=rng.color())
        else:
            size = (rng.double(0.1, 0.4), 0.0, 0.0)
            b.add_body(BodyType.SPHERE, pos, size, color=rng.color())
    b.add_body(BodyType.CAPSULE, (0.0, 2.0, -3.0), (0.5, 1.0, 0.0),
               kinematic=True)
    return b.finish()


def bench_world(config: EngineConfig, num_bodies: int = 60,
                seed: int = 42) -> WorldState:
    """BASELINE config 4 per-world scene: arena + ``num_bodies`` dynamic
    bodies in a dense grid above the floor so the steady state has real
    contact work (resting stacks), not just ballistic flight."""
    b = _arena(config, seed)
    rng = RandStream(seed)
    side = int(np.ceil(num_bodies ** (1.0 / 3.0)))
    n = 0
    for ix in range(side):
        for iy in range(side):
            for iz in range(side):
                if n >= num_bodies:
                    break
                pos = (
                    (ix - side / 2) * 0.9 + rng.double(-0.05, 0.05),
                    1.0 + iy * 0.9,
                    (iz - side / 2) * 0.9 + rng.double(-0.05, 0.05),
                )
                if (n % 2) == 0:
                    b.add_body(BodyType.BOX, pos, (0.6, 0.6, 0.6),
                               color=rng.color())
                else:
                    b.add_body(BodyType.SPHERE, pos, (0.3, 0.0, 0.0),
                               color=rng.color())
                n += 1
    return b.finish()


def hinge_chain_scene(config: EngineConfig):
    """(state, JointSet) — the joint-conformance scene (VERDICT r3 item 3):
    a two-link pendulum (motorized+limited HINGE to a static anchor, BALL
    joint between the links) swinging down onto a dynamic box resting on
    the floor. Exercises anchor rows, hinge angular rows, the motor row
    (friction-style: vel=0, fmax>0), the limit row (the swing passes
    lo=-2.2), ball rows, joint-contact interplay, and the connected-pair
    collision exclusion (the links overlap at the ball anchor). Shared by
    tests/_traj_engine.py and tests/test_conformance_referee.py."""
    from rl_ode_physics_tpu.ops.joints import (
        add_ball, add_hinge, empty_joints, set_hinge_limits, set_hinge_motor)

    b = WorldBuilder(config, 0)
    b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (100.0, 1.0, 100.0))
    anchor = b.add_body_map((0.0, 4.0, 0.0), (0.0, 0.0, 0.0),
                            (0.3, 0.3, 0.3))
    # link A: long axis along +x, inner end at the anchor point
    link_a = b.add_body(BodyType.BOX, (0.8, 4.0, 0.0), (1.6, 0.15, 0.15))
    # link B: continues the chain along +x
    link_b = b.add_body(BodyType.BOX, (2.4, 4.0, 0.0), (1.6, 0.15, 0.15))
    # strike box under the swing path
    b.add_body(BodyType.BOX, (0.3, 0.76, 0.0), (0.5, 0.5, 0.5))
    state = b.finish()

    j = empty_joints(4, dtype=state.pos.dtype)
    j = add_hinge(j, state, 0, anchor, link_a,
                  world_anchor=(0.0, 4.0, 0.0), world_axis=(0.0, 0.0, 1.0))
    j = set_hinge_limits(j, 0, -2.2, 0.35)
    j = set_hinge_motor(j, 0, vel=0.0, fmax=0.4)      # joint friction
    j = add_ball(j, state, 1, link_a, link_b, world_anchor=(1.6, 4.0, 0.0))
    return state, j


def ridge_mesh_geometry():
    """Analytic twin-ridge heightfield (48 triangles): piecewise-linear
    ridges at x=±1.4, valley at the center. Small enough that the scalar
    referee's all-triangle sweep stays fast, rich enough for face/vertex/
    edge trimesh feature classes."""
    xs = np.linspace(-3.0, 3.0, 7)
    zs = np.linspace(-2.0, 2.0, 5)

    def height(x):
        return (0.5 * max(0.0, 1.0 - abs(x - 1.4))
                + 0.5 * max(0.0, 1.0 - abs(x + 1.4)))

    verts = np.array([[x, height(x), z] for z in zs for x in xs], np.float64)
    tris = []
    nx = len(xs)
    for r in range(len(zs) - 1):
        for c in range(nx - 1):
            i = r * nx + c
            tris.append([i, i + 1, i + nx])
            tris.append([i + 1, i + nx + 1, i + nx])
    return verts, np.array(tris, np.int64)


def ridge_mesh_scene(config: EngineConfig):
    """(state, TriMesh) — the trimesh-conformance scene (VERDICT r3 item 3):
    sphere + box + capsule dropped into the valley of the twin-ridge
    heightfield. Shared by tests/_traj_engine.py (engine f64 subprocess)
    and the scalar referee (``testing.referee.trimesh_to_numpy`` of the
    SAME padded TriMesh, so both sides see identical tile boundaries)."""
    from rl_ode_physics_tpu.ops.trimesh import build_trimesh

    b = WorldBuilder(config, 0)
    mesh_slot = b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0),
                               (0.0, 0.0, 0.0))
    b.body_type[mesh_slot] = int(BodyType.TRIMESH)
    b.add_body(BodyType.SPHERE, (-0.6, 1.6, 0.4), (0.3, 0.0, 0.0))
    b.add_body(BodyType.BOX, (0.0, 1.2, -0.5), (0.5, 0.5, 0.5))
    s = float(np.sin(np.pi / 4))
    b.add_body(BodyType.CAPSULE, (0.6, 2.0, 0.2), (0.2, 0.8, 0.0),
               quat=(s, 0.0, s, 0.0))
    state = b.finish()

    verts, tris = ridge_mesh_geometry()
    mesh = build_trimesh(verts, tris, slot=mesh_slot,
                         dtype=state.pos.dtype, pad_to_multiple=128)
    return state, mesh


def capsule_pile_world(config: EngineConfig) -> WorldState:
    """Capsule-rich conformance scene (VERDICT r3 item 3: widen the
    row-randomization bound beyond mini_stack): five capsules in mixed
    orientations piling up between two boxes on the floor — dominated by
    capsule-capsule/capsule-box/capsule-plane rows. Shared by the referee
    row-randomization bound test (tests/test_conformance_referee.py)."""
    b = WorldBuilder(config, 0)
    b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (100.0, 1.0, 100.0))
    s = float(np.sin(np.pi / 4))
    # lying capsules (local Z onto world X / world Z), staggered heights
    b.add_body(BodyType.CAPSULE, (0.0, 0.78, 0.0), (0.25, 1.0, 0.0),
               quat=(s, 0.0, s, 0.0))
    b.add_body(BodyType.CAPSULE, (0.1, 1.35, 0.05), (0.25, 0.9, 0.0))
    b.add_body(BodyType.CAPSULE, (-0.15, 1.95, -0.04), (0.22, 1.1, 0.0),
               quat=(s, 0.0, s, 0.0))
    # upright capsule dropped onto the pile
    b.add_body(BodyType.CAPSULE, (0.3, 3.0, 0.2), (0.2, 0.8, 0.0),
               quat=(s, s, 0.0, 0.0))
    # kinematic player capsule brushing the pile edge
    b.add_body(BodyType.CAPSULE, (1.6, 1.5, 0.0), (0.5, 1.0, 0.0),
               kinematic=True)
    # bounding boxes the pile leans against
    b.add_body(BodyType.BOX, (-1.6, 0.88, 0.0), (0.7, 0.7, 0.7))
    b.add_body(BodyType.BOX, (0.0, 0.83, 1.7), (0.9, 0.6, 0.5))
    return b.finish()


def mini_stack_world(config: EngineConfig, seed: int = 0) -> WorldState:
    """Reduced BASELINE config 2 (the referee-conformance scene): box tower
    + spheres + dynamic/kinematic capsules on the arena floor. Tower boxes
    use distinct side lengths so ODE's SAT face-selection argmax is never
    degenerate between two implementations (the |C|+1e-6 fudge breaks ties
    only when the box extents differ). Shared by tests/_traj_engine.py (f64
    conformance subprocess) and the in-process TPU-default-precision
    trajectory tests."""
    del seed
    b = WorldBuilder(config, 0)
    b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (100.0, 1.0, 100.0))
    # 3-box tower, distinct sizes, slight initial clearance
    b.add_body(BodyType.BOX, (0.0, 0.88, 0.0), (0.7, 0.7, 0.7))
    b.add_body(BodyType.BOX, (0.05, 1.58, 0.03), (0.6, 0.6, 0.6))
    b.add_body(BodyType.BOX, (-0.04, 2.20, -0.02), (0.5, 0.5, 0.5))
    # spheres: one near rest, one dropped
    b.add_body(BodyType.SPHERE, (1.5, 0.85, 0.0), (0.3, 0.0, 0.0))
    b.add_body(BodyType.SPHERE, (-1.5, 1.5, 0.3), (0.3, 0.0, 0.0))
    # dynamic capsule lying on its side (local Z rotated onto world X)
    s = float(np.sin(np.pi / 4))
    b.add_body(BodyType.CAPSULE, (0.0, 0.83, 2.0), (0.25, 1.0, 0.0),
               quat=(s, 0.0, s, 0.0))
    # kinematic player capsule standing in the scene
    b.add_body(BodyType.CAPSULE, (3.0, 1.5, 0.0), (0.5, 1.0, 0.0),
               kinematic=True)
    return b.finish()
