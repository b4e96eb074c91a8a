"""Batched RL rollout demo — the framework as an RL physics backend.

Spawns a batch of arena worlds with one force-controlled actor sphere per
world, runs a scanned rollout with random action sequences, and reports
env-steps/sec (BASELINE config 4's "batched RL-style env throughput").

    python examples/rl_rollout.py [num_worlds] [steps]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(num_worlds: int = 256, steps: int = 60):
    from rl_ode_physics_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    from rl_ode_physics_tpu.core.config import EngineConfig
    from rl_ode_physics_tpu.core.state import BodyType
    from rl_ode_physics_tpu.models.builder import WorldBuilder
    from rl_ode_physics_tpu.models.env import PhysicsEnv

    config = EngineConfig(max_bodies=8, max_pair_candidates=32,
                          max_contacts=64)

    def scene(cfg, seed):
        b = WorldBuilder(cfg, seed)
        b.add_body_map((0, 0, 0), (0, 0, 0), (100.0, 1.0, 100.0))
        actor = b.add_body(BodyType.SPHERE, (0.0, 1.0, 0.0), (0.3, 0, 0))
        return b.finish()

    env = PhysicsEnv(config, scene, actor_slots=[1],
                     num_worlds=num_worlds, substeps=2)
    state, obs = env.reset(seed=0)
    print(f"obs shape {obs.shape}")

    key = jax.random.PRNGKey(0)
    actions = jax.random.uniform(
        key, (steps, num_worlds, 1, 6), minval=-5.0, maxval=5.0)
    # keep actors hovering: bias the y-force around gravity
    actions = actions.at[..., 1].add(9.8)

    final, traj = env.rollout(state, actions)       # compile
    jax.block_until_ready(traj)
    t0 = time.perf_counter()
    final, traj = env.rollout(state, actions)
    jax.block_until_ready(traj)
    dt = time.perf_counter() - t0

    env_steps = steps * num_worlds
    print(f"rollout: {steps} control steps × {num_worlds} envs "
          f"in {dt:.3f}s → {env_steps / dt:,.0f} env-steps/sec")
    print(f"actor height spread at T: "
          f"min {float(traj[-1, :, 1, 1].min()):.2f} "
          f"max {float(traj[-1, :, 1, 1].max()):.2f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256,
         int(sys.argv[2]) if len(sys.argv) > 2 else 60)
