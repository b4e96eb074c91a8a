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


@functools.lru_cache(maxsize=64)   # bounded — see core/world.py note
def make_batched_step_fn(config: EngineConfig, substeps: int = 1,
                         donate: bool = True, chunk: int = 0,
                         unroll: int = 1):
    """Compiled batch step: (B, …) WorldState → (B, …) WorldState.

    ``substeps`` substeps run inside one device launch via ``lax.scan``
    (the 120 Hz cadence between 60 Hz snapshot reads, ``src/main.c:208-220``).

    ``chunk``: process the batch in world-chunks of this size sequentially
    (``lax.map``) inside the launch. Bounds peak HBM for very large batches:
    XLA pads the minor (…, 3)/(…, 4) vector dims of collision intermediates
    to full 128-lane tiles, so an 8192-world narrowphase materialized at
    once can exceed HBM even though the logical data is small. Chunks of
    2048 keep the padded intermediates ~10 GB while leaving plenty of
    parallelism per chunk.

    ``unroll``: scan unroll factor for the substep loop — removes while-loop
    carry copies (~14% faster at full unroll, measured) at the cost of
    proportionally longer compiles.
    """
    config.validate()      # unsupported compositions error at config time

    def fn(batch: WorldState) -> WorldState:
        if config.dense_pipeline:
            # the dense pipeline's (N, N, K, 3) intermediates tile-pad ~42x
            # on TPU (docs/BENCHMARKS.md); refuse batch sizes that would
            # OOM instead of letting the flag foot-gun (VERDICT r1 note)
            n = config.max_bodies
            worlds = batch.pos.shape[0] if batch.pos.ndim == 3 else 1
            per_chunk = chunk or worlds
            # a padded (N, N, K, 3) f32 tensor tiles to (N, N, ceil8(K),
            # 128) and ~3 are live at once (26 GB measured at 512 worlds
            # x 64 bodies x K=4)
            k_pad = -(-config.max_contacts_per_pair // 8) * 8
            padded_gb = 3 * per_chunk * n * n * k_pad * 128 * 4 / 1e9
            if padded_gb > 8.0:
                raise ValueError(
                    f"dense_pipeline at {per_chunk} worlds x {n} bodies "
                    f"needs ~{padded_gb:.0f} GB of padded intermediates on "
                    f"TPU; use the sparse pipeline or chunk<="
                    f"{max(1, int(per_chunk * 8.0 / padded_gb))}")
        def substep_loop(b):
            if substeps == 1:
                return batched_step(b, config)
            b, _ = jax.lax.scan(
                lambda s, _: (batched_step(s, config), None),
                b, None, length=substeps, unroll=min(unroll, substeps))
            return b

        if not chunk:
            return substep_loop(batch)
        b_total = batch.pos.shape[0]
        if b_total % chunk:
            raise ValueError(f"batch {b_total} not divisible by chunk {chunk}")
        folded = jax.tree_util.tree_map(
            lambda x: x.reshape((b_total // chunk, chunk) + x.shape[1:]),
            batch)
        out = jax.lax.map(substep_loop, folded)
        return jax.tree_util.tree_map(
            lambda x: x.reshape((b_total,) + x.shape[2:]), out)

    return jax.jit(fn, donate_argnums=(0,) if donate else ())
