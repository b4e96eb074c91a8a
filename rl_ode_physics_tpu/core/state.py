"""World state: the SoA pytree that replaces ODE's pointer graph.

ODE models a world as heap objects linked by pointers (``dBodyID``,
``dGeomID``; reference usage ``src/main.c:703-726``). The TPU-native design
flattens all of it into fixed-shape structure-of-arrays tensors with masks:

* a *slot* 0..max_bodies-1 replaces a (dBodyID, dGeomID) pair — mirroring the
  reference's own fixed ``Body bodies[MAX_BODIES]`` slot arrays and free-slot
  scan allocation (``src/main.c:106-110,696-699``),
* ``body_type == NULL`` marks a free slot (``inc/body.h:14-18`` semantics),
* static map geoms (reference: geoms with ``body == NULL``,
  ``src/main.c:753``) are slots with ``is_static=True`` and zero inverse
  mass/inertia,
* kinematic bodies (``dBodySetKinematic``, ``src/main.c:712``) keep zero
  inverse mass but may carry velocity.

Everything is a plain JAX pytree (registered dataclass), so ``WorldState``
flows through ``jit`` / ``vmap`` / ``lax.scan`` / ``shard_map`` unchanged. A
batch of worlds is simply the same pytree with a leading batch axis.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
from flax import struct

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.utils import quat as quat_m


class BodyType(enum.IntEnum):
    """Geometry type codes. 0..2 match the reference enum (inc/body.h:14-18);
    3+ are framework extensions for the BASELINE workloads."""

    NULL = 0
    SPHERE = 1
    BOX = 2
    CAPSULE = 3
    PLANE = 4
    TRIMESH = 5


class CollMask(enum.IntEnum):
    """Category/collide bitmask values (inc/body.h:8-12)."""

    MAP = 1
    OBJ = 2
    ALL = 0xFFFFFFFF


@struct.dataclass
class WorldState:
    """One physics world (add a leading axis for a batch of worlds)."""

    # kinematic state
    pos: jnp.ndarray        # (N, 3) body/geom position
    quat: jnp.ndarray       # (N, 4) orientation (w, x, y, z)
    linvel: jnp.ndarray     # (N, 3)
    angvel: jnp.ndarray     # (N, 3) world-frame angular velocity

    # force/torque accumulators (dBodyAddForce/-Torque analog, cleared per step)
    force: jnp.ndarray      # (N, 3)
    torque: jnp.ndarray     # (N, 3)

    # mass properties
    inv_mass: jnp.ndarray      # (N,)
    inv_inertia: jnp.ndarray   # (N, 3) body-frame diagonal of I^-1

    # geometry
    body_type: jnp.ndarray  # (N,) int32 BodyType codes
    size: jnp.ndarray       # (N, 3) sphere:(r,-,-) box:(lx,ly,lz) capsule:(r,l,-)

    # collision filtering (dGeomSetCategoryBits/SetCollideBits, src/main.c:724-725)
    category: jnp.ndarray   # (N,) uint32
    collide: jnp.ndarray    # (N,) uint32

    # flags
    is_static: jnp.ndarray     # (N,) bool — geom without a body (src/main.c:753)
    is_kinematic: jnp.ndarray  # (N,) bool — dBodySetKinematic (src/main.c:712)

    # per-body surface parameters (beyond-parity: ODE sets these per
    # contact in the NearCallback; here each body carries its own and pair
    # values mix as min(friction), max(restitution) when
    # EngineConfig.per_body_surface is on — otherwise the global config
    # values apply and these fields are inert)
    friction: jnp.ndarray     # (N,) mu (inf = unbounded, the ref default)
    restitution: jnp.ndarray  # (N,) bounce in [0, 1]

    # presentation state carried for snapshot parity (BodyState.col, inc/body.h:30)
    color: jnp.ndarray      # (N, 4) uint8 rgba

    # bookkeeping
    tick: jnp.ndarray       # () int32 — server tick counter
    rng_state: jnp.ndarray  # () uint32 — reference-compatible PRNG stream state
    # cumulative capacity-overflow counter: pair candidates / contact rows
    # DROPPED because a static buffer (max_pair_candidates, bucket_caps,
    # max_contacts) was full. Incremented by step() on the default path —
    # overflow is observable from any WorldState without diagnostics mode
    # (a scene exceeding its configured capacities silently loses contacts,
    # so this must be loud). 0 = nothing was ever dropped.
    overflow: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))

    @property
    def num_slots(self) -> int:
        return self.pos.shape[-2]

    @property
    def active(self) -> jnp.ndarray:
        """(N,) bool — slot occupied (body_type != NULL)."""
        return self.body_type != BodyType.NULL

    @property
    def dynamic(self) -> jnp.ndarray:
        """(N,) bool — integrated by the stepper (active, non-static)."""
        return self.active & ~self.is_static


def create_world(config: EngineConfig, seed: int = 0) -> WorldState:
    """An empty world: every slot free (BODYTYPE_NULL), like the reference's
    init loop ``src/main.c:106-110``."""
    n = config.max_bodies
    f = jnp.dtype(config.dtype)
    zeros3 = jnp.zeros((n, 3), dtype=f)
    q = jnp.tile(quat_m.identity(f), (n, 1))
    return WorldState(
        pos=zeros3,
        quat=q,
        linvel=zeros3,
        angvel=zeros3,
        force=zeros3,
        torque=zeros3,
        inv_mass=jnp.zeros((n,), dtype=f),
        inv_inertia=jnp.zeros((n, 3), dtype=f),
        body_type=jnp.zeros((n,), dtype=jnp.int32),
        size=zeros3,
        category=jnp.zeros((n,), dtype=jnp.uint32),
        collide=jnp.zeros((n,), dtype=jnp.uint32),
        is_static=jnp.zeros((n,), dtype=bool),
        is_kinematic=jnp.zeros((n,), dtype=bool),
        friction=jnp.full((n,), config.mu, dtype=f),
        restitution=jnp.full((n,), config.bounce, dtype=f),
        color=jnp.zeros((n, 4), dtype=jnp.uint8),
        tick=jnp.zeros((), dtype=jnp.int32),
        rng_state=jnp.asarray(seed, dtype=jnp.uint32),
    )


# ---------------------------------------------------------------------------
# Mass helpers (ODE dMass* equivalents)
# ---------------------------------------------------------------------------

def default_mass(dtype=jnp.float32):
    """ODE ``dBodyCreate`` default mass parameters: total mass 1, unit
    inertia. The reference never calls dMassSet* after dBodyCreate
    (``src/main.c:703-709``), so every dynamic body in the game runs with
    these defaults — our scene builders reproduce that for conformance."""
    return jnp.asarray(1.0, dtype), jnp.ones((3,), dtype)


def sphere_mass(radius, density=1.0):
    """dMassSetSphere: m = 4/3 π ρ r³, I = 2/5 m r² (diagonal)."""
    m = (4.0 / 3.0) * jnp.pi * density * radius ** 3
    i = 0.4 * m * radius ** 2
    return m, jnp.stack([i, i, i], axis=-1)


def box_mass(sides, density=1.0):
    """dMassSetBox: m = ρ·lx·ly·lz, I = m/12 · diag(ly²+lz², lx²+lz², lx²+ly²)."""
    lx, ly, lz = sides[..., 0], sides[..., 1], sides[..., 2]
    m = density * lx * ly * lz
    k = m / 12.0
    return m, jnp.stack(
        [k * (ly**2 + lz**2), k * (lx**2 + lz**2), k * (lx**2 + ly**2)],
        axis=-1,
    )


def capsule_mass(radius, length, density=1.0):
    """dMassSetCapsule for a capsule aligned with local Z (ODE direction 3):
    cylinder of given length plus two hemispherical caps."""
    r2 = radius * radius
    m_cyl = density * jnp.pi * r2 * length
    m_caps = density * (4.0 / 3.0) * jnp.pi * radius ** 3
    m = m_cyl + m_caps
    # transverse inertia (about x/y), axial about z
    i_axial = m_cyl * 0.5 * r2 + m_caps * 0.4 * r2
    i_trans = (
        m_cyl * (0.25 * r2 + length ** 2 / 12.0)
        + m_caps * (0.4 * r2 + 0.375 * radius * length + 0.25 * length ** 2)
    )
    return m, jnp.stack([i_trans, i_trans, i_axial], axis=-1)


def similarity_diag(r: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """R · diag(d) · Rᵀ as pure VPU broadcast-sum (tiny 3×3 dims — avoids
    dot_general lowering of micro-matmuls on TPU)."""
    tmp = r * d[..., None, :]
    return jnp.sum(tmp[..., :, None, :] * r[..., None, :, :], axis=-1)


def world_inv_inertia(state: WorldState) -> jnp.ndarray:
    """(N, 3, 3) world-frame inverse inertia: R · diag(invI_body) · Rᵀ."""
    r = quat_m.to_matrix(state.quat)
    return similarity_diag(r, state.inv_inertia)
