"""Multi-chip scaling: world-batch vmap + Mesh/shard_map sharding."""

from rl_ode_physics_tpu.parallel.batch import (
    replicate, batched_step, make_batched_step_fn,
)
from rl_ode_physics_tpu.parallel.mesh import (
    make_mesh, batch_sharding, shard_batch,
    make_sharded_step_fn, make_shard_map_step_fn, WORLD_AXIS,
)
