"""Batched RL environment wrapper — the "rl" in rl-ode-physics.

BASELINE config 4 frames the throughput workload as "batched RL-style env
throughput": thousands of vmapped worlds stepped in lockstep, each fed
per-step actions. This wrapper packages the physics core as a purely
functional, fully jittable environment:

    env = PhysicsEnv(config, scene_fn, actor_slots=[4, 5], num_worlds=8192,
                     chunk=128)
    state, obs = env.reset(seed=0)
    state, obs = env.step(state, actions)         # one 60 Hz control step
    final, traj = env.rollout(state, action_seq)  # lax.scan over steps

* actions: (num_worlds, num_actors, 6) — world-frame force (3) + torque (3)
  applied to the actor slots for the duration of the control step
  (the ``dBodyAddForce`` channel the reference left as a TODO,
  ``src/main.c:531-532``).
* observations: (num_worlds, S, 13) — pos(3) quat(4) linvel(3) angvel(3)
  per OBSERVED slot. ``obs_slots`` selects which body slots are observed
  (default: every slot, the round-3 behavior; a policy that only consumes
  its actors should pass ``obs_slots=actor_slots`` — materializing all 64
  slots across a rollout horizon was measured as a large share of the
  round-3 rollout gap, docs/BENCHMARKS.md §RL rollout). Rewards/
  termination are caller-defined (pure functions of state), keeping this
  layer task-agnostic.
* ``substeps`` physics substeps (120 Hz) per control step — the reference's
  2 substeps per 60 Hz broadcast.
* ``chunk``: step the world batch in sequential chunks of this size inside
  the launch (``lax.map``), exactly like ``parallel.batch.
  make_batched_step_fn`` — the same measured-optimal regime as the raw
  engine bench (chunk 128 keeps each chunk's collision/solver
  intermediates VMEM-resident; the round-3 rollout stepped all 8192
  worlds in ONE unchunked vmap and paid ~2x for it).
* optional ``lidar``: body-attached ray fans (``ops/raycast``) appended to
  the observation — (num_rays,) distances per actor, the standard RL
  range-sensor channel.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import WorldState
from rl_ode_physics_tpu.core.world import step as step_one
from rl_ode_physics_tpu.parallel.batch import replicate


def observe(state: WorldState, slots=None) -> jnp.ndarray:
    """(…, S, 13) observation tensor from a (possibly batched) state.

    ``slots``: optional static sequence of body slots to observe; None
    observes every slot (S = N)."""
    full = jnp.concatenate(
        [state.pos, state.quat, state.linvel, state.angvel], axis=-1
    )
    if slots is None:
        return full
    return full[..., tuple(slots), :]     # static take → slice, no gather


class PhysicsEnv:
    def __init__(self, config: EngineConfig,
                 scene_fn: Callable[[EngineConfig, int], WorldState],
                 actor_slots: Sequence[int] = (),
                 num_worlds: int = 1, substeps: int = 2,
                 trimesh=None, lidar_dirs=None, lidar_range: float = 50.0,
                 obs_slots: Optional[Sequence[int]] = None,
                 chunk: int = 0):
        """``lidar_dirs``: optional (R, 3) body-frame ray directions; each
        actor casts them from its position every step and the normalized
        hit distances (R,) are appended to the observation."""
        config.validate()
        if chunk and num_worlds % chunk:
            raise ValueError(
                f"num_worlds {num_worlds} not divisible by chunk {chunk}")
        self.config = config
        self.scene_fn = scene_fn
        self.actor_slots = jnp.asarray(list(actor_slots), jnp.int32)
        self.num_worlds = num_worlds
        self.substeps = substeps
        self.trimesh = trimesh
        self.lidar_dirs = (None if lidar_dirs is None
                           else jnp.asarray(lidar_dirs, jnp.float32))
        self.lidar_range = lidar_range
        self.obs_slots = (None if obs_slots is None
                          else tuple(int(s) for s in obs_slots))
        self.chunk = chunk
        self._step = self._build_step()

    @property
    def num_actors(self) -> int:
        return int(self.actor_slots.shape[0])

    @property
    def num_obs_slots(self) -> int:
        return (self.config.max_bodies if self.obs_slots is None
                else len(self.obs_slots))

    def reset(self, seed: int = 0) -> Tuple[WorldState, jnp.ndarray]:
        world = self.scene_fn(self.config, seed)
        batch = replicate(world, self.num_worlds)
        return batch, observe(batch, self.obs_slots)

    def _build_step(self):
        config = self.config
        actor_slots = self.actor_slots
        substeps = self.substeps
        trimesh = self.trimesh
        chunk = self.chunk
        obs_slots = self.obs_slots

        def single(state: WorldState, action: jnp.ndarray) -> WorldState:
            # apply actor forces/torques via one-hot projection (no scatter)
            if actor_slots.shape[0]:
                n = state.num_slots
                onehot = (actor_slots[:, None]
                          == jnp.arange(n, dtype=jnp.int32)[None, :]
                          ).astype(state.force.dtype)       # (A, N)
                force = jnp.einsum("an,ad->nd", onehot, action[:, 0:3])
                torque = jnp.einsum("an,ad->nd", onehot, action[:, 3:6])
            else:
                force = jnp.zeros_like(state.force)
                torque = jnp.zeros_like(state.torque)

            def body(s, _):
                # forces persist across the control step's substeps (the
                # integrator clears accumulators, so re-arm each substep)
                s = s.replace(force=s.force + force,
                              torque=s.torque + torque)
                return step_one(s, config, trimesh), None

            state, _ = jax.lax.scan(body, state, None, length=substeps)
            return state

        batched = jax.vmap(single)

        def stepped(state: WorldState, actions: jnp.ndarray) -> WorldState:
            if not chunk or state.pos.shape[0] <= chunk:
                return batched(state, actions)
            b_total = state.pos.shape[0]
            fold = lambda x: x.reshape(
                (b_total // chunk, chunk) + x.shape[1:])
            folded = (jax.tree_util.tree_map(fold, state), fold(actions))
            out = jax.lax.map(lambda sa: batched(*sa), folded)
            return jax.tree_util.tree_map(
                lambda x: x.reshape((b_total,) + x.shape[2:]), out)

        lidar_dirs = self.lidar_dirs
        lidar_range = self.lidar_range

        def sense(state: WorldState) -> jnp.ndarray:
            """(A, R) normalized lidar distances for one world (vmapped)."""
            from rl_ode_physics_tpu.ops.raycast import raycast
            from rl_ode_physics_tpu.utils import quat as quat_m

            r_mat = quat_m.to_matrix(state.quat[actor_slots])   # (A, 3, 3)
            dirs = jnp.einsum("aij,rj->ari", r_mat, lidar_dirs)  # (A, R, 3)
            origins = jnp.broadcast_to(
                state.pos[actor_slots][:, None, :], dirs.shape)
            rr = lidar_dirs.shape[0]
            hits = raycast(state, origins.reshape(-1, 3),
                           dirs.reshape(-1, 3), config,
                           max_dist=lidar_range)
            return hits.t.reshape(actor_slots.shape[0], rr) / lidar_range

        def observe_full(new_state: WorldState):
            obs = observe(new_state, obs_slots)
            if lidar_dirs is not None and actor_slots.shape[0]:
                lid = jax.vmap(sense)(new_state)        # (B, A, R)
                obs = (obs, lid)
            return obs

        @jax.jit
        def env_step(state: WorldState, actions: jnp.ndarray):
            new_state = stepped(state, actions)
            return new_state, observe_full(new_state)

        self._observe_full = observe_full
        self._batched = batched
        return env_step

    def step(self, state: WorldState, actions: jnp.ndarray):
        """One control step: (state, (B, A, 6) actions) → (state, obs)."""
        return self._step(state, actions)

    def rollout(self, state: WorldState, action_seq: jnp.ndarray):
        """``lax.scan`` over (T, B, A, 6) actions → (final_state, (T, B, S, 13)).

        When ``chunk`` is set, the world axis is chunked at the OUTERMOST
        level — ``lax.map`` over world chunks, each running the full
        horizon scan — rather than re-entering the chunk map every control
        step. Worlds are independent, so the two orders are semantically
        identical; the chunk-major order amortizes the chunk machinery
        over ``horizon × substeps`` physics substeps instead of
        ``substeps`` (measured 1.9× on the rollout bench — the raw-engine
        bench runs 96 substeps per chunk call for the same reason)."""
        step_fn = self._step
        batched, observe_full = self._batched, self._observe_full
        chunk, num_worlds = self.chunk, self.num_worlds

        if not hasattr(self, "_rollout"):
            @jax.jit
            def run(state, action_seq):
                def body(s, a):
                    s, obs = step_fn(s, a)
                    return s, obs
                return jax.lax.scan(body, state, action_seq)

            @jax.jit
            def run_chunked(state, action_seq):
                t, b_total = action_seq.shape[0], state.pos.shape[0]
                nc = b_total // chunk

                def chunk_body(sa):
                    s, acts = sa                      # (chunk, …), (T, chunk, A, 6)

                    def body(s, a):
                        s = batched(s, a)
                        return s, observe_full(s)

                    return jax.lax.scan(body, s, acts)

                fold = lambda x: x.reshape((nc, chunk) + x.shape[1:])
                acts = jnp.moveaxis(
                    action_seq.reshape((t, nc, chunk) + action_seq.shape[2:]),
                    1, 0)                             # (nc, T, chunk, A, 6)
                final, traj = jax.lax.map(
                    chunk_body, (jax.tree_util.tree_map(fold, state), acts))
                unfold_state = lambda x: x.reshape((b_total,) + x.shape[2:])
                # traj leaves are (nc, T, chunk, …) → (T, nc·chunk, …)
                unfold_traj = lambda x: jnp.moveaxis(x, 0, 1).reshape(
                    (t, b_total) + x.shape[3:])
                return (jax.tree_util.tree_map(unfold_state, final),
                        jax.tree_util.tree_map(unfold_traj, traj))

            self._rollout = (run_chunked if chunk and num_worlds > chunk
                             else run)

        return self._rollout(state, action_seq)
