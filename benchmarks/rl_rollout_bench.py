"""End-to-end RL rollout throughput — the repo's namesake use case
(VERDICT r2 item 8).

Measures ``PhysicsEnv.rollout``: actions in → physics substeps → obs (+
optional lidar) out, across the full 8192-world batch, as env-steps/sec
(one env step = one 60 Hz control step = ``substeps`` 120 Hz physics
substeps per world). This is the number an RL practitioner sees; the raw
body-steps/sec of ``bench.py`` is the physics-core view of the same
workload.

    python benchmarks/rl_rollout_bench.py            # TPU
    BENCH_WORLDS=512 BENCH_LIDAR=0 python benchmarks/rl_rollout_bench.py

Env overrides: BENCH_WORLDS, BENCH_BODIES, BENCH_HORIZON, BENCH_REPEATS,
BENCH_SUBSTEPS, BENCH_LIDAR (rays per actor, 0 disables).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    from rl_ode_physics_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from rl_ode_physics_tpu.core.config import EngineConfig
    from rl_ode_physics_tpu.models import scenes
    from rl_ode_physics_tpu.models.env import PhysicsEnv

    num_worlds = int(os.environ.get("BENCH_WORLDS", 8192))
    num_bodies = int(os.environ.get("BENCH_BODIES", 64))
    substeps = int(os.environ.get("BENCH_SUBSTEPS", 2))   # 60 Hz control
    horizon = int(os.environ.get("BENCH_HORIZON", 16))
    repeats = int(os.environ.get("BENCH_REPEATS", 4))
    lidar_rays = int(os.environ.get("BENCH_LIDAR", 16))
    # chunked stepping inside the env, same measured-optimal regime as
    # bench.py (the round-3 rollout stepped 8192 worlds in one unchunked
    # vmap — a large share of its 9.4x gap vs the raw engine). 256 is the
    # round-4 optimum for the chunk-major rollout (sweep: 64 → 132k,
    # 128 → 241k, 256 → 247k, 512 → 248k env-steps/sec; docs/BENCHMARKS.md)
    chunk = int(os.environ.get("BENCH_CHUNK", 256))
    if num_worlds <= chunk or num_worlds % chunk:
        chunk = 0
    # ALL slots (round-3 behavior) vs actor slots only: BENCH_OBS=all|actors
    obs_mode = os.environ.get("BENCH_OBS", "actors")

    # the SHIPPED throughput policy (hb-8, typed buckets, K=4 — identical
    # numerics to bench.py by construction). Contact capacity 80, NOT the
    # raw bench's lane-aligned 64: the env workload differs (actor slots
    # are force-driven every control step), and at C=64 the loud overflow
    # counter fires (2 dropped rows measured) — this workload's peak is
    # above the raw scene's 56. 2C=160 is not tile-aligned; capacity
    # honesty beats the alignment win here.
    config = EngineConfig.throughput(
        max_bodies=num_bodies,
        max_pair_candidates=4 * num_bodies,
        max_contacts=int(os.environ.get(
            "BENCH_CONTACTS", 80 if num_bodies == 64 else 2 * num_bodies)),
        enable_capsules=False, enable_planes=False,
        bucket_caps=((1, 1, 96), (1, 2, 96), (2, 2, 48)),
    )

    lidar = None
    if lidar_rays:
        # horizontal ray fan (the standard planar range sensor)
        ang = np.linspace(0, 2 * np.pi, lidar_rays, endpoint=False)
        lidar = np.stack([np.cos(ang), np.zeros_like(ang), np.sin(ang)], -1)

    actor_slots = [4, 5]              # two dynamic bodies are the actors
    env = PhysicsEnv(
        config,
        lambda cfg, seed: scenes.bench_world(cfg, num_bodies=num_bodies - 4,
                                             seed=seed),
        actor_slots=actor_slots,
        num_worlds=num_worlds, substeps=substeps,
        lidar_dirs=lidar,
        chunk=chunk,
        # a policy consumes its actors' states (+ lidar), not all 64 slots;
        # materializing (T, B, 64, 13) observations was a measured share of
        # the round-3 rollout gap
        obs_slots=None if obs_mode == "all" else actor_slots,
    )
    state, obs = env.reset(seed=42)
    num_actors = env.num_actors

    key = jax.random.PRNGKey(0)
    action_seq = 0.5 * jax.random.normal(
        key, (horizon, num_worlds, num_actors, 6), jnp.float32)

    # warmup/compile
    state, traj = env.rollout(state, action_seq)
    leaf = traj[0] if isinstance(traj, tuple) else traj
    _ = np.asarray(leaf[0, 0, 0])

    t0 = time.perf_counter()
    for _ in range(repeats):
        state, traj = env.rollout(state, action_seq)
    leaf = traj[0] if isinstance(traj, tuple) else traj
    _ = np.asarray(leaf[0, 0, 0])
    jax.block_until_ready(state.pos)
    dt = time.perf_counter() - t0

    env_steps = num_worlds * horizon * repeats
    dynamic = num_bodies - 4
    # capacity honesty, same as bench.py: overflow is loud, assert zero
    overflow = int(np.asarray(state.overflow).sum())
    if overflow:
        raise RuntimeError(f"contact capacity overflow in rollout bench: "
                           f"{overflow} dropped rows")
    print(json.dumps({
        "metric": f"env-steps/sec ({num_worlds} worlds, horizon {horizon}, "
                  f"{substeps} substeps/env-step, {num_actors} actors, "
                  f"chunk {chunk}, lidar {lidar_rays} rays, "
                  f"obs ({env.num_obs_slots},13)"
                  f"{' + lidar' if lidar_rays else ''}, "
                  f"solver hb-{config.solver_iterations} "
                  f"omega={config.jacobi_omega} beta={config.jacobi_beta})",
        "value": env_steps / dt,
        "unit": "env-steps/sec",
        "body_steps_per_sec": env_steps * substeps * dynamic / dt,
    }))


if __name__ == "__main__":
    main()
