"""Host-side world builder: assemble SoA state in numpy, upload once.

``core.world.add_body`` is the jit-safe in-simulation spawn path (one slot
per call, usable inside a compiled server tick). Building a 60-body scene
with it costs 60 small device dispatches — wasteful at setup time. This
builder accumulates bodies in plain numpy and materializes the WorldState
with a single host→device transfer.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import (
    BodyType, CollMask, WorldState,
)
from rl_ode_physics_tpu.utils import quat as quat_m


class WorldBuilder:
    def __init__(self, config: EngineConfig, seed: int = 0):
        self.config = config
        self.seed = seed
        n = config.max_bodies
        f = np.dtype(config.dtype)
        self.pos = np.zeros((n, 3), f)
        self.quat = np.tile(np.array([1.0, 0, 0, 0], f), (n, 1))
        self.linvel = np.zeros((n, 3), f)
        self.angvel = np.zeros((n, 3), f)
        self.inv_mass = np.zeros((n,), f)
        self.inv_inertia = np.zeros((n, 3), f)
        self.body_type = np.zeros((n,), np.int32)
        self.size = np.zeros((n, 3), f)
        self.category = np.zeros((n,), np.uint32)
        self.collide = np.zeros((n,), np.uint32)
        self.is_static = np.zeros((n,), bool)
        self.is_kinematic = np.zeros((n,), bool)
        self.color = np.zeros((n, 4), np.uint8)
        self.count = 0

    def _next(self) -> int:
        if self.count >= self.config.max_bodies:
            raise ValueError("world capacity exceeded "
                             f"({self.config.max_bodies} slots)")
        i = self.count
        self.count += 1
        return i

    def add_body(self, body_type: int, pos, size, quat=None, *,
                 category=int(CollMask.OBJ),
                 collide=int(CollMask.OBJ) | int(CollMask.MAP),
                 kinematic=False, color=(255, 255, 255, 255),
                 linvel=(0.0, 0.0, 0.0), angvel=(0.0, 0.0, 0.0),
                 mass: float = 1.0, inertia=(1.0, 1.0, 1.0)) -> int:
        """AddBody semantics (src/main.c:695-733) with ODE default mass
        (m=1, I=identity — the reference never sets mass)."""
        i = self._next()
        self.pos[i] = pos
        if quat is not None:
            self.quat[i] = np.asarray(quat)
        self.linvel[i] = linvel
        self.angvel[i] = angvel
        self.body_type[i] = int(body_type)
        self.size[i] = size
        self.category[i] = category
        self.collide[i] = collide
        self.is_kinematic[i] = kinematic
        self.color[i] = color
        if not kinematic:
            self.inv_mass[i] = 1.0 / mass
            self.inv_inertia[i] = 1.0 / np.asarray(inertia, np.float64)
        return i

    def add_body_map(self, pos, rot_euler, size,
                     color=(80, 80, 80, 255)) -> int:
        """AddBodyMap semantics (src/main.c:735-761): static box geom."""
        i = self._next()
        self.pos[i] = pos
        self.quat[i] = np.asarray(
            quat_m.from_euler_xyz(jnp.asarray(rot_euler, jnp.float32)))
        self.body_type[i] = int(BodyType.BOX)
        self.size[i] = size
        self.category[i] = int(CollMask.MAP)
        self.collide[i] = 0xFFFFFFFF
        self.is_static[i] = True
        self.color[i] = color
        return i

    def finish(self) -> WorldState:
        """One host→device upload of the whole world."""
        f = jnp.dtype(self.config.dtype)
        return WorldState(
            pos=jnp.asarray(self.pos, f),
            quat=jnp.asarray(self.quat, f),
            linvel=jnp.asarray(self.linvel, f),
            angvel=jnp.asarray(self.angvel, f),
            force=jnp.zeros_like(jnp.asarray(self.pos, f)),
            torque=jnp.zeros_like(jnp.asarray(self.pos, f)),
            inv_mass=jnp.asarray(self.inv_mass, f),
            inv_inertia=jnp.asarray(self.inv_inertia, f),
            body_type=jnp.asarray(self.body_type),
            size=jnp.asarray(self.size, f),
            category=jnp.asarray(self.category),
            collide=jnp.asarray(self.collide),
            is_static=jnp.asarray(self.is_static),
            is_kinematic=jnp.asarray(self.is_kinematic),
            friction=jnp.full((len(self.pos),), self.config.mu, f),
            restitution=jnp.full((len(self.pos),), self.config.bounce, f),
            color=jnp.asarray(self.color),
            tick=jnp.zeros((), jnp.int32),
            rng_state=jnp.asarray(self.seed, jnp.uint32),
        )
