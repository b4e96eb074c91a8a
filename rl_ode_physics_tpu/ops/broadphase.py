"""Broadphase: masked all-pairs AABB overlap + bitmask filter + compaction.

TPU-native replacement for ODE's hash space (``dHashSpaceCreate``
``src/main.c:97`` + ``dSpaceCollide`` ``src/main.c:212``). At the reference's
scales (64–512 bodies/world) the upper-triangular all-pairs test is a dense,
fully-vectorized O(N²/2) mask computation — a few thousand to ~131k fused
VPU lane-ops per world — which beats emulating a pointer-chasing hash grid
on a vector machine (SURVEY.md §7 step 4).

Filtering reproduces ODE's category/collide semantics exactly: a pair is
tested iff ``(cat1 & col2) || (cat2 & col1)`` (the test ODE's
``dSpaceCollide`` applies to the bits set via ``dGeomSetCategoryBits`` /
``dGeomSetCollideBits``, reference call sites ``src/main.c:724-725``).

The surviving pairs are *compacted* into a static-capacity candidate buffer
(cumsum + scatter — deterministic, no data-dependent shapes) so the expensive
narrowphase only runs on ``max_pair_candidates`` slots instead of all N²/2
pairs.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp
from flax import struct

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import BodyType, WorldState


@struct.dataclass
class PairCandidates:
    """Static-capacity broadphase output (per world)."""

    ia: jnp.ndarray      # (CP,) int32 — first body slot of the pair
    ib: jnp.ndarray      # (CP,) int32 — second body slot
    valid: jnp.ndarray   # (CP,) bool
    count: jnp.ndarray   # () int32 — number of valid candidates (≤ CP)
    overflow: jnp.ndarray  # () int32 — pairs dropped because CP was too small


@functools.lru_cache(maxsize=None)
def _tri_indices(n: int):
    """Static upper-triangular pair index arrays (host-precomputed).

    Cached as *numpy* arrays on purpose: jnp constants materialized inside a
    jit trace are tracers and must never be cached across traces.
    """
    ia, ib = np.triu_indices(n, k=1)
    return ia.astype(np.int32), ib.astype(np.int32)


def compute_aabbs(state: WorldState, margin: float = 0.0) -> jnp.ndarray:
    """(N, 2, 3) world-frame AABBs (min, max) for every slot.

    Box extents use the |R|·h bound; capsules use their local bounding box
    (r, r, L/2+r) through |R|; planes get a huge box (they overlap
    everything, like ODE's unbounded plane geoms). NULL slots get an empty
    (inverted) box so they never overlap anything.
    """
    from rl_ode_physics_tpu.utils import quat as quat_m

    r = quat_m.to_matrix(state.quat)           # (N, 3, 3)
    abs_r = jnp.abs(r)
    t = state.body_type
    sz = state.size

    # local half-extent box per type
    half_sphere = jnp.broadcast_to(sz[..., 0:1], sz.shape)
    half_box = 0.5 * sz
    cap_r, cap_l = sz[..., 0], sz[..., 1]
    half_capsule = jnp.stack([cap_r, cap_r, 0.5 * cap_l + cap_r], axis=-1)
    big = jnp.full_like(sz, 1e9)

    half_local = jnp.where((t == BodyType.SPHERE)[..., None], half_sphere,
                 jnp.where((t == BodyType.BOX)[..., None], half_box,
                 jnp.where((t == BodyType.CAPSULE)[..., None], half_capsule,
                 jnp.where((t == BodyType.PLANE)[..., None] | (t == BodyType.TRIMESH)[..., None],
                           big, jnp.zeros_like(sz)))))

    ext = jnp.einsum("...ij,...j->...i", abs_r, half_local) + margin
    lo = state.pos - ext
    hi = state.pos + ext
    # NULL slots: inverted box → overlaps nothing
    null = (t == BodyType.NULL)[..., None]
    lo = jnp.where(null, jnp.full_like(lo, 1.0), lo)
    hi = jnp.where(null, jnp.full_like(hi, -1.0), hi)
    return jnp.stack([lo, hi], axis=-2)


def broadphase(state: WorldState, config: EngineConfig,
               margin: float = 0.0, exclude=None) -> PairCandidates:
    """All-pairs AABB + mask test, compacted to ``max_pair_candidates``.

    Computed as dense (N, N) broadcast masks — zero gathers (batched gathers
    carry a high fixed cost on TPU); pair indices fall out of the compacted
    flat index arithmetically (i = idx // N, j = idx % N).
    """
    n = state.num_slots
    cp = config.max_pair_candidates

    aabb = compute_aabbs(state, margin)
    lo, hi = aabb[..., 0, :], aabb[..., 1, :]

    overlap = jnp.all(
        (lo[:, None, :] <= hi[None, :, :]) & (lo[None, :, :] <= hi[:, None, :]),
        axis=-1,
    )                                                        # (N, N)

    # ODE collision filter: (cat1 & col2) || (cat2 & col1)
    cat, col = state.category, state.collide
    mask_ok = (((cat[:, None] & col[None, :]) != 0)
               | ((cat[None, :] & col[:, None]) != 0))

    active = state.active
    both_active = active[:, None] & active[None, :]

    # A contact between two infinite-mass bodies (static or kinematic) can
    # produce no impulse — skip, like ODE skips geom pairs with no body.
    movable = state.inv_mass > 0
    any_movable = movable[:, None] | movable[None, :]

    # trimesh slots collide through the dedicated mesh narrowphase
    # (ops/trimesh.py), not the primitive pair pipeline
    not_mesh = state.body_type != BodyType.TRIMESH
    no_mesh_pair = not_mesh[:, None] & not_mesh[None, :]

    # upper-triangular (i < j) to count each pair once
    upper = (jnp.arange(n)[:, None] < jnp.arange(n)[None, :])

    hit = (overlap & mask_ok & both_active & any_movable & no_mesh_pair
           & upper)
    if exclude is not None:
        # joint-connected pairs (ODE dAreConnected) don't collide
        hit = hit & ~exclude
    hit = hit.reshape(n * n)

    # deterministic scatter-free compaction (top_k; see ops/compaction.py)
    from rl_ode_physics_tpu.ops.compaction import compact_mask

    idx, valid, count, overflow = compact_mask(hit, cp)
    return PairCandidates(
        ia=jnp.where(valid, idx // n, 0),
        ib=jnp.where(valid, idx % n, 0),
        valid=valid,
        count=count,
        overflow=overflow,
    )
