"""Batched RL environment wrapper: reset/step/rollout, action forces,
device-side spawning inside jit."""

import numpy as np
import jax
import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import BodyType
from rl_ode_physics_tpu.models import scenes
from rl_ode_physics_tpu.models.env import PhysicsEnv, observe
import pytest

CFG = EngineConfig(max_bodies=8, max_pair_candidates=32, max_contacts=64)


def _scene(config, seed):
    return scenes.sphere_drop_world(config, height=1.0, seed=seed)


def test_reset_step_shapes():
    env = PhysicsEnv(CFG, _scene, actor_slots=[4], num_worlds=4, substeps=2)
    state, obs = env.reset()
    assert obs.shape == (4, 8, 13)
    actions = jnp.zeros((4, 1, 6))
    state, obs = env.step(state, actions)
    assert obs.shape == (4, 8, 13)
    assert int(state.tick[0]) == 2


def test_action_force_lifts_sphere():
    """Upward force > gravity on a 1 kg body accelerates it upward."""
    env = PhysicsEnv(CFG, _scene, actor_slots=[4], num_worlds=2, substeps=2)
    state, _ = env.reset()
    up = jnp.zeros((2, 1, 6)).at[:, 0, 1].set(30.0)    # +y force, m=1, g=9.8
    for _ in range(10):
        state, obs = env.step(state, up)
    assert float(state.linvel[0, 4, 1]) > 0.0
    assert float(state.pos[0, 4, 1]) > 1.0

    # zero action: falls
    state2, _ = env.reset()
    zero = jnp.zeros((2, 1, 6))
    for _ in range(10):
        state2, _ = env.step(state2, zero)
    assert float(state2.linvel[0, 4, 1]) < 0.0


@pytest.mark.slow
def test_rollout_scan():
    env = PhysicsEnv(CFG, _scene, actor_slots=[4], num_worlds=3, substeps=2)
    state, _ = env.reset()
    seq = jnp.zeros((20, 3, 1, 6))
    final, traj = env.rollout(state, seq)
    assert traj.shape == (20, 3, 8, 13)
    assert int(final.tick[0]) == 40
    # trajectory matches step-by-step execution bitwise
    state2, _ = env.reset()
    for t in range(20):
        state2, obs2 = env.step(state2, seq[t])
    assert np.array_equal(np.asarray(observe(state2)), np.asarray(traj[-1]))


def test_spawn_inside_jit():
    """add_body is jit-safe (argmax slot scan) — device-side spawning."""
    from rl_ode_physics_tpu.core.world import add_body, step

    @jax.jit
    def spawn_and_step(state, pos):
        state, slot = add_body(state, BodyType.SPHERE, pos, (0.2, 0.0, 0.0))
        return step(state, CFG), slot

    w = scenes.grass_plane_world(CFG)
    w, slot = spawn_and_step(w, jnp.asarray([0.0, 3.0, 0.0]))
    assert int(slot) == 4
    assert int(jnp.sum(w.active)) == 5
    # capacity exhaustion returns -1 (reference silently no-ops;
    # we surface it — SURVEY.md §2e)
    for i in range(CFG.max_bodies):
        w, slot = spawn_and_step(w, jnp.asarray([0.0, 3.0 + i, 0.0]))
    assert int(slot) == -1


@pytest.mark.slow
def test_chunked_env_matches_unchunked():
    """chunk=2 over 4 worlds must produce bitwise-identical states to the
    unchunked vmap (identical per-world program, different batching)."""
    env_u = PhysicsEnv(CFG, _scene, actor_slots=[4], num_worlds=4,
                       substeps=2)
    env_c = PhysicsEnv(CFG, _scene, actor_slots=[4], num_worlds=4,
                       substeps=2, chunk=2)
    s_u, o_u = env_u.reset()
    s_c, o_c = env_c.reset()
    key = jax.random.PRNGKey(0)
    acts = 0.3 * jax.random.normal(key, (5, 4, 1, 6), jnp.float32)
    for t in range(5):
        s_u, o_u = env_u.step(s_u, acts[t])
        s_c, o_c = env_c.step(s_c, acts[t])
    assert np.array_equal(np.asarray(s_u.pos), np.asarray(s_c.pos))
    assert np.array_equal(np.asarray(o_u), np.asarray(o_c))


@pytest.mark.slow
def test_chunked_rollout_matches_unchunked():
    """rollout's chunk-major order (lax.map over world chunks, each
    scanning the full horizon) must be bitwise-identical to the
    step-major unchunked scan — worlds are independent, so reordering
    the (chunk, time) loop nest cannot change any world's trajectory."""
    env_u = PhysicsEnv(CFG, _scene, actor_slots=[4], num_worlds=4,
                       substeps=2)
    env_c = PhysicsEnv(CFG, _scene, actor_slots=[4], num_worlds=4,
                       substeps=2, chunk=2)
    s_u, _ = env_u.reset()
    s_c, _ = env_c.reset()
    acts = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (5, 4, 1, 6),
                                   jnp.float32)
    f_u, traj_u = env_u.rollout(s_u, acts)
    f_c, traj_c = env_c.rollout(s_c, acts)
    assert traj_u.shape == traj_c.shape == (5, 4, 8, 13)
    assert np.array_equal(np.asarray(f_u.pos), np.asarray(f_c.pos))
    assert np.array_equal(np.asarray(traj_u), np.asarray(traj_c))


@pytest.mark.slow
def test_obs_slots_selects_actor_rows():
    env_all = PhysicsEnv(CFG, _scene, actor_slots=[4], num_worlds=2,
                         substeps=2)
    env_sel = PhysicsEnv(CFG, _scene, actor_slots=[4], num_worlds=2,
                         substeps=2, obs_slots=[4])
    s_a, o_a = env_all.reset()
    s_s, o_s = env_sel.reset()
    assert o_a.shape == (2, 8, 13)
    assert o_s.shape == (2, 1, 13)
    acts = jnp.ones((2, 1, 6)) * 0.5
    s_a, o_a = env_all.step(s_a, acts)
    s_s, o_s = env_sel.step(s_s, acts)
    # the selected observation IS the actor's row of the full observation
    assert np.array_equal(np.asarray(o_a[:, 4:5, :]), np.asarray(o_s))
    # rollout emits only the selected slots across the horizon
    seq = jnp.zeros((3, 2, 1, 6))
    _, traj = env_sel.rollout(s_s, seq)
    assert traj.shape == (3, 2, 1, 13)
