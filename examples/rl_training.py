"""End-to-end RL training ON the engine — the "rl" in rl-ode-physics.

Task: a dynamic sphere (the actor) starts at the arena center; the policy
pushes it with world-frame forces toward a target point. Observation: the
actor's position and linear velocity relative to the target (6 features).
Policy: linear map → planar force. Reward: negative final distance to the
target.

Trainer: antithetic evolution strategies (OpenAI-ES) — each candidate
parameter vector is evaluated by a full `PhysicsEnv.rollout` on its own
batch lane, so ONE jitted evaluation steps `population × horizon ×
substeps` physics substeps with zero host round-trips. This is the
batched-worlds use case BASELINE config 4 names, driven end to end:

    python examples/rl_training.py          # ~20 ES iterations, prints reward curve

The whole train step (perturb → rollout population → reward → gradient
estimate → update) is a single jitted function of (params, key).
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import jax
import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import BodyType
from rl_ode_physics_tpu.models.builder import WorldBuilder
from rl_ode_physics_tpu.models.env import PhysicsEnv

TARGET = jnp.asarray([3.0, 0.65, 2.0])
ACTOR = 4            # slot after the 4 arena geoms
OBS_DIM = 6          # (pos - target, linvel)
ACT_DIM = 2          # planar force (x, z)
FORCE_SCALE = 8.0


def scene(config: EngineConfig, seed: int):
    b = WorldBuilder(config, seed)
    b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (100.0, 1.0, 100.0))
    b.add_body_map((0.0, 2.0, -50.0), (0.0, 0.0, 0.0), (100.0, 4.0, 1.0))
    b.add_body_map((-50.0, 2.0, 0.0), (0.0, 0.0, 0.0), (1.0, 4.0, 100.0))
    b.add_body_map((50.0, 2.0, 0.0), (0.0, 0.0, 0.0), (1.0, 4.0, 100.0))
    # physical sphere inertia (2/5·m·r²): with the reference's ODE-default
    # identity inertia, the μ=∞ rolling constraint gives the 0.15 m sphere
    # an effective pushing mass of m + I/r² ≈ 45 — nearly unpushable
    r = 0.15
    i_sph = 0.4 * 1.0 * r * r
    b.add_body(BodyType.SPHERE, (0.0, 0.65, 0.0), (r, 0.0, 0.0),
               inertia=(i_sph, i_sph, i_sph))
    return b.finish()


def make_trainer(pop: int = 16, horizon: int = 25, sigma: float = 0.1,
                 lr: float = 0.3, substeps: int = 2, mesh=None):
    """Returns (init_params, train_step(params, key) -> (params, mean_r)).

    ``mesh``: optional ``jax.sharding.Mesh`` — the 2·pop evaluation worlds
    (the population) shard across it (parallel/mesh.py batch sharding), so
    the whole ES iteration runs SPMD over the chips: rollouts are local,
    the only collectives are the reward mean/std and the gradient-estimate
    reductions that GSPMD inserts. Multi-chip training of the namesake
    workload (validated on the virtual 8-device mesh,
    tests/test_sharded_training.py)."""
    config = EngineConfig(max_bodies=8, max_pair_candidates=32,
                          max_contacts=32, enable_capsules=False,
                          solver_iterations=8, jacobi_omega=1.3,
                          jacobi_beta=0.9)
    n_worlds = 2 * pop                   # antithetic pairs share the batch
    env = PhysicsEnv(config, scene, actor_slots=[ACTOR],
                     num_worlds=n_worlds, substeps=substeps)
    state0, _ = env.reset(seed=0)
    if mesh is not None:
        from rl_ode_physics_tpu.parallel.mesh import batch_sharding
        state0 = jax.device_put(state0, batch_sharding(mesh))

    def policy_action(params, obs_world):
        """obs (N, 13) of one world → (1, 6) actor force/torque action."""
        o = jnp.concatenate([obs_world[ACTOR, 0:3] - TARGET,
                             obs_world[ACTOR, 7:10]])        # (6,)
        w, b = params
        f_xz = jnp.tanh(o @ w + b) * FORCE_SCALE             # (2,)
        force = jnp.asarray([f_xz[0], 0.0, f_xz[1]])
        return jnp.concatenate([force, jnp.zeros(3)])[None, :]

    def rollout_reward(batch_params, state):
        """Evaluate (B, …) per-world params with ONE scanned rollout."""
        def body(s, _):
            obs = jnp.concatenate(
                [s.pos, s.quat, s.linvel, s.angvel], axis=-1)  # (B, N, 13)
            acts = jax.vmap(policy_action)(batch_params, obs)  # (B, 1, 6)
            s, _ = env.step(s, acts)
            return s, None
        final, _ = jax.lax.scan(body, state, None, length=horizon)
        dist = jnp.linalg.norm(
            final.pos[:, ACTOR, (0, 2)] - TARGET[(0, 2),], axis=-1)
        return -dist                                         # (B,)

    w0 = jnp.zeros((OBS_DIM, ACT_DIM))
    b0 = jnp.zeros((ACT_DIM,))

    @jax.jit
    def train_step(params, key):
        w, b = params
        kw, kb = jax.random.split(key)
        ew = jax.random.normal(kw, (pop,) + w.shape) * sigma
        eb = jax.random.normal(kb, (pop,) + b.shape) * sigma
        # antithetic population: [w + e; w - e]
        ws = jnp.concatenate([w + ew, w - ew])
        bs = jnp.concatenate([b + eb, b - eb])
        r = rollout_reward((ws, bs), state0)                 # (2·pop,)
        adv = (r - r.mean()) / jnp.maximum(r.std(), 1e-6)
        gw = jnp.einsum("p,pij->ij", adv[:pop] - adv[pop:], ew) / (2 * pop)
        gb = jnp.einsum("p,pj->j", adv[:pop] - adv[pop:], eb) / (2 * pop)
        new = (w + lr * gw / sigma, b + lr * gb / sigma)
        return new, r.mean()

    return (w0, b0), train_step


def main(iters: int = 20, horizon: int = 60):
    params, train_step = make_trainer(horizon=horizon)
    key = jax.random.PRNGKey(0)
    rewards = []
    for i in range(iters):
        key, sub = jax.random.split(key)
        params, mean_r = train_step(params, sub)
        rewards.append(float(mean_r))
        print(f"iter {i:3d}  mean reward {rewards[-1]:8.3f}  "
              f"(= -distance to target)")
    print(f"first {np.mean(rewards[:3]):.3f} → last "
          f"{np.mean(rewards[-3:]):.3f}")
    return rewards


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
