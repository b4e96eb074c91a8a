"""Scene builders — the conformance workloads from BASELINE.json.

``grass_plane_world`` reproduces the reference server's arena exactly
(``StartServer`` world build, ``src/main.c:115-121``): a 100×1×100 floor at
the origin plus three static walls (the fourth is commented out in the
reference — ``src/main.c:119`` — so we also leave it out). Other builders
cover BASELINE configs 1, 2 and 4.

Colors follow the raylib constants used at the call sites (DARKGRAY, RED,
GREEN, BLUE).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import BodyType, CollMask, WorldState, create_world
from rl_ode_physics_tpu.core.world import add_body, add_body_map
from rl_ode_physics_tpu.utils.prng import RandStream

# raylib color constants used by the reference arena
DARKGRAY = (80, 80, 80, 255)
RED = (230, 41, 55, 255)
GREEN = (0, 228, 48, 255)
BLUE = (0, 121, 241, 255)


def grass_plane_world(config: EngineConfig, seed: int = 0) -> WorldState:
    """The reference arena (src/main.c:115-121): floor + 3 walls."""
    w = create_world(config, seed)
    w, _ = add_body_map(w, (0.0, 0.0, 0.0), (0.0, 0.0, 0.0),
                        (100.0, 1.0, 100.0), DARKGRAY)
    w, _ = add_body_map(w, (4.0, 3.0, 0.0), (0.0, 0.0, -0.5),
                        (0.5, 8.0, 12.0), RED)
    w, _ = add_body_map(w, (0.0, 3.0, 6.0), (0.0, 0.0, 0.0),
                        (12.0, 8.0, 0.5), GREEN)
    w, _ = add_body_map(w, (0.0, 3.0, -6.0), (0.0, 0.0, 0.0),
                        (12.0, 8.0, 0.5), BLUE)
    return w


def sphere_drop_world(config: EngineConfig, height: float = 5.0,
                      radius: float = 0.15, seed: int = 0) -> WorldState:
    """BASELINE config 1: single sphere free-fall + bounce on the arena
    floor (radius matches the reference's SPACE-spawned sphere,
    ``src/main.c:524-527``)."""
    w = grass_plane_world(config, seed)
    w, _ = add_body(w, BodyType.SPHERE, (0.0, height, 0.0),
                    (radius, 0.0, 0.0))
    return w


def stack_world(config: EngineConfig, num_bodies: int = 64,
                seed: int = 1234) -> WorldState:
    """BASELINE config 2-style workload: box/sphere bodies raining onto the
    arena, sampled with the reference's spawn distribution
    (``src/main.c:502-522``: pos x,z∈[-4,4], y∈[20,50]; 50% box with sides
    ∈[0.2,1.0], else sphere with r∈[0.1,0.4]; color channels ∈[30,190))."""
    w = grass_plane_world(config, seed)
    rng = RandStream(seed)
    for _ in range(num_bodies):
        pos = (rng.double(-4.0, 4.0), rng.double(20.0, 50.0),
               rng.double(-4.0, 4.0))
        if rng.randint(0, 2) == 0:
            size = (rng.double(0.2, 1.0), rng.double(0.2, 1.0),
                    rng.double(0.2, 1.0))
            w, _ = add_body(w, BodyType.BOX, pos, size, color=rng.color())
        else:
            size = (rng.double(0.1, 0.4), 0.0, 0.0)
            w, _ = add_body(w, BodyType.SPHERE, pos, size, color=rng.color())
    return w


def capsule_stack_world(config: EngineConfig, num_bodies: int = 64,
                        seed: int = 7) -> WorldState:
    """BASELINE config 2: a player-style capsule plus box/sphere stacks."""
    w = stack_world(config, num_bodies=num_bodies - 1, seed=seed)
    w, _ = add_body(w, BodyType.CAPSULE, (0.0, 2.0, -3.0), (0.5, 1.0, 0.0),
                    kinematic=True)
    return w


def bench_world(config: EngineConfig, num_bodies: int = 60,
                seed: int = 42) -> WorldState:
    """BASELINE config 4 per-world scene: arena + ``num_bodies`` dynamic
    bodies in a dense grid above the floor so the steady state has real
    contact work (resting stacks), not just ballistic flight."""
    w = grass_plane_world(config, seed)
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
                    w, _ = add_body(w, BodyType.BOX, pos,
                                    (0.6, 0.6, 0.6), color=rng.color())
                else:
                    w, _ = add_body(w, BodyType.SPHERE, pos,
                                    (0.3, 0.0, 0.0), color=rng.color())
                n += 1
    return w
