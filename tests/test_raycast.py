"""Ray queries (the dCreateRay surface): analytic hits per primitive,
nearest-of-many, misses, trimesh casts, vmap composition."""

import numpy as np
import jax
import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import BodyType
from rl_ode_physics_tpu.models.builder import WorldBuilder
from rl_ode_physics_tpu.ops import raycast as rc
from rl_ode_physics_tpu.ops import trimesh as tm
import pytest

CFG = EngineConfig(max_bodies=8, max_pair_candidates=32, max_contacts=32,
                   enable_capsules=True)


def _world(*bodies):
    b = WorldBuilder(CFG, 0)
    for bt, pos, size in bodies:
        b.add_body(bt, pos, size)
    return b.finish()


def test_ray_sphere_analytic():
    w = _world((BodyType.SPHERE, (0.0, 0.0, 5.0), (1.0, 0.0, 0.0)))
    hits = rc.raycast(w, [[0.0, 0.0, 0.0]], [[0.0, 0.0, 1.0]], CFG)
    assert bool(hits.hit[0])
    assert abs(float(hits.t[0]) - 4.0) < 1e-5
    np.testing.assert_allclose(np.asarray(hits.normal[0]), [0, 0, -1],
                               atol=1e-5)
    assert int(hits.body[0]) == 0


def test_ray_box_face_and_normal():
    w = _world((BodyType.BOX, (3.0, 0.0, 0.0), (2.0, 2.0, 2.0)))
    hits = rc.raycast(w, [[0.0, 0.2, 0.3]], [[1.0, 0.0, 0.0]], CFG)
    assert bool(hits.hit[0])
    assert abs(float(hits.t[0]) - 2.0) < 1e-5       # face at x = 2
    np.testing.assert_allclose(np.asarray(hits.normal[0]), [-1, 0, 0],
                               atol=1e-5)


def test_ray_capsule_side_and_cap():
    # capsule axis = local z, r=0.5, cylinder len 2 → caps at z=±1
    w = _world((BodyType.CAPSULE, (0.0, 0.0, 0.0), (0.5, 2.0, 0.0)))
    side = rc.raycast(w, [[5.0, 0.0, 0.3]], [[-1.0, 0.0, 0.0]], CFG)
    assert bool(side.hit[0]) and abs(float(side.t[0]) - 4.5) < 1e-4
    cap = rc.raycast(w, [[0.0, 0.0, 5.0]], [[0.0, 0.0, -1.0]], CFG)
    assert bool(cap.hit[0]) and abs(float(cap.t[0]) - 3.5) < 1e-4
    np.testing.assert_allclose(np.asarray(cap.normal[0]), [0, 0, 1],
                               atol=1e-4)


def test_ray_nearest_of_many_and_miss():
    w = _world((BodyType.SPHERE, (0.0, 0.0, 10.0), (1.0, 0.0, 0.0)),
               (BodyType.SPHERE, (0.0, 0.0, 4.0), (1.0, 0.0, 0.0)),
               (BodyType.BOX, (0.0, 0.0, 20.0), (2.0, 2.0, 2.0)))
    hits = rc.raycast(w,
                      [[0.0, 0.0, 0.0], [50.0, 50.0, 50.0]],
                      [[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]], CFG)
    assert bool(hits.hit[0]) and int(hits.body[0]) == 1
    assert abs(float(hits.t[0]) - 3.0) < 1e-5
    assert not bool(hits.hit[1]) and int(hits.body[1]) == -1


def test_ray_inside_volume_is_miss():
    w = _world((BodyType.SPHERE, (0.0, 0.0, 0.0), (2.0, 0.0, 0.0)))
    hits = rc.raycast(w, [[0.0, 0.0, 0.0]], [[0.0, 0.0, 1.0]], CFG)
    assert not bool(hits.hit[0])


def test_ray_max_dist_cutoff():
    w = _world((BodyType.SPHERE, (0.0, 0.0, 100.0), (1.0, 0.0, 0.0)))
    hits = rc.raycast(w, [[0.0, 0.0, 0.0]], [[0.0, 0.0, 1.0]], CFG,
                      max_dist=50.0)
    assert not bool(hits.hit[0])
    assert abs(float(hits.t[0]) - 50.0) < 1e-5


def test_raycast_mesh_floor_lidar():
    from tests.test_trimesh import grid_floor_mesh
    verts, tris = grid_floor_mesh(n=4, size=20.0, y=0.0)
    mesh = tm.build_trimesh(verts, tris, slot=3)
    # a downward 5-ray lidar from y=2 at different x
    xs = np.linspace(-5, 5, 5)
    origins = np.stack([xs, np.full(5, 2.0), np.zeros(5)], -1)
    dirs = np.tile([[0.0, -1.0, 0.0]], (5, 1))
    hits = rc.raycast_mesh(origins, dirs, mesh)
    assert bool(np.asarray(hits.hit).all())
    np.testing.assert_allclose(np.asarray(hits.t), 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hits.normal)[:, 1], 1.0, atol=1e-5)
    assert int(hits.body[0]) == 3


def test_raycast_under_jit_vmap():
    from rl_ode_physics_tpu.parallel.batch import replicate
    w = _world((BodyType.SPHERE, (0.0, 0.0, 5.0), (1.0, 0.0, 0.0)))
    batch = replicate(w, 4)
    origins = jnp.zeros((3, 3))
    dirs = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (3, 1))
    f = jax.jit(jax.vmap(lambda s: rc.raycast(s, origins, dirs, CFG)))
    hits = f(batch)
    assert hits.t.shape == (4, 3)
    assert bool(np.asarray(hits.hit).all())
    np.testing.assert_allclose(np.asarray(hits.t), 4.0, atol=1e-5)


@pytest.mark.slow
def test_env_lidar_channel():
    """PhysicsEnv with a lidar fan: the observation gains (B, A, R)
    normalized distances that see the floor below the actor."""
    from rl_ode_physics_tpu.models.env import PhysicsEnv
    from rl_ode_physics_tpu.models.builder import WorldBuilder

    def scene(cfg, seed):
        b = WorldBuilder(cfg, seed)
        b.add_body_map((0.0, -0.5, 0.0), (0.0, 0.0, 0.0), (40.0, 1.0, 40.0))
        b.add_body(BodyType.SPHERE, (0.0, 3.0, 0.0), (0.3, 0.0, 0.0))
        return b.finish()

    dirs = [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    env = PhysicsEnv(CFG, scene, actor_slots=[1], num_worlds=2,
                     substeps=1, lidar_dirs=dirs, lidar_range=20.0)
    state, _ = env.reset()
    actions = jnp.zeros((2, 1, 6))
    state, (obs, lidar) = env.step(state, actions)
    assert lidar.shape == (2, 1, 3)
    down = float(lidar[0, 0, 0]) * 20.0
    # sphere at ~3 falling a step; floor top at 0 → ray hits ~2.7-3.0 away
    assert 2.0 < down < 3.2
    # up-ray misses: normalized distance 1.0
    assert abs(float(lidar[0, 0, 2]) - 1.0) < 1e-5
