"""World-batch data parallelism: vmap across independent worlds.

The reference runs exactly one ODE world per server process
(``src/main.c:95``). The TPU-native concurrency unit (SURVEY.md §2d) is a
*batch* of independent worlds: the same pure ``step`` vmapped over a leading
axis — the rigid-body analog of batched RL environments. No cross-world
communication exists in the hot loop, so the batch scales embarrassingly
(shard it over chips with ``parallel.mesh``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import WorldState
from rl_ode_physics_tpu.core.world import step


def replicate(state: WorldState, num_worlds: int,
              reseed: bool = True) -> WorldState:
    """Tile one world into a (num_worlds, …) batch.

    ``reseed=True`` gives each world its own PRNG stream (seed + world index)
    so stochastic spawns decorrelate across the batch.
    """
    batch = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (num_worlds,) + x.shape).copy(), state
    )
    if reseed:
        seeds = state.rng_state + jnp.arange(num_worlds, dtype=jnp.uint32)
        batch = batch.replace(rng_state=seeds)
    return batch


def batched_step(batch: WorldState, config: EngineConfig) -> WorldState:
    """One substep for every world in the batch."""
    return jax.vmap(lambda s: step(s, config))(batch)


@functools.lru_cache(maxsize=None)
def make_batched_step_fn(config: EngineConfig, substeps: int = 1,
                         donate: bool = True):
    """Compiled batch step: (B, …) WorldState → (B, …) WorldState.

    ``substeps`` substeps run inside one device launch via ``lax.scan``
    (the 120 Hz cadence between 60 Hz snapshot reads, ``src/main.c:208-220``).
    """
    def fn(batch: WorldState) -> WorldState:
        def body(s, _):
            return batched_step(s, config), None
        if substeps == 1:
            return batched_step(batch, config)
        batch, _ = jax.lax.scan(body, batch, None, length=substeps)
        return batch

    return jax.jit(fn, donate_argnums=(0,) if donate else ())
