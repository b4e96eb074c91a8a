"""Trimesh narrowphase: closest-point math, mesh contacts, end-to-end
settling on a triangulated floor, teapot fixture (BASELINE config 3)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import BodyType
from rl_ode_physics_tpu.core.world import make_step_fn
from rl_ode_physics_tpu.models.builder import WorldBuilder
from rl_ode_physics_tpu.ops import trimesh as tm
from rl_ode_physics_tpu.utils.objloader import load_obj

TEAPOT = "/root/reference/res/teapot.obj"

CFG = EngineConfig(max_bodies=8, max_pair_candidates=32, max_contacts=64)


def grid_floor_mesh(n=8, size=10.0, y=0.0, slot=0):
    """Triangulated square floor: (n+1)² verts, 2n² tris."""
    xs = np.linspace(-size / 2, size / 2, n + 1)
    verts = np.array([[x, y, z] for z in xs for x in xs], np.float32)
    tris = []
    for r in range(n):
        for c in range(n):
            i = r * (n + 1) + c
            tris.append([i, i + 1, i + n + 1])
            tris.append([i + 1, i + n + 2, i + n + 1])
    return verts, np.array(tris, np.int32)


def test_closest_point_triangle_regions():
    v0 = jnp.array([0.0, 0.0, 0.0])
    e1 = jnp.array([1.0, 0.0, 0.0])
    e2 = jnp.array([0.0, 1.0, 0.0])
    cases = [
        ([0.25, 0.25, 1.0], [0.25, 0.25, 0.0]),   # interior
        ([-1.0, -1.0, 0.0], [0.0, 0.0, 0.0]),     # vertex A
        ([2.0, -0.5, 0.0], [1.0, 0.0, 0.0]),      # vertex B
        ([-0.5, 2.0, 0.0], [0.0, 1.0, 0.0]),      # vertex C
        ([0.5, -1.0, 0.0], [0.5, 0.0, 0.0]),      # edge AB
        ([-1.0, 0.5, 0.0], [0.0, 0.5, 0.0]),      # edge AC
        ([1.0, 1.0, 0.0], [0.5, 0.5, 0.0]),       # edge BC
    ]
    for p, expected in cases:
        got = tm.closest_point_triangle(
            jnp.asarray(p), v0[None], e1[None], e2[None])[0]
        assert np.allclose(np.asarray(got), expected, atol=1e-6), (p, got)


def test_sphere_mesh_contact_depth():
    verts, tris = grid_floor_mesh(n=4, size=8.0, y=0.0)
    mesh = tm.build_trimesh(verts, tris, slot=0)
    center = jnp.array([0.3, 0.4, 0.2])
    pts, nrm, dep, val = tm.sphere_mesh_contacts(center, 0.5, mesh, k=4)
    assert bool(val[0])
    assert abs(float(dep[0]) - 0.1) < 1e-5          # r - height
    assert np.allclose(np.asarray(nrm[0]), [0, -1, 0], atol=1e-5)


@pytest.mark.slow
def test_sphere_settles_on_mesh_floor():
    verts, tris = grid_floor_mesh(n=8, size=10.0, y=0.0)
    b = WorldBuilder(CFG, 0)
    slot = b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    b.body_type[slot] = int(BodyType.TRIMESH)
    b.add_body(BodyType.SPHERE, (0.2, 2.0, 0.3), (0.25, 0.0, 0.0))
    w = b.finish()
    mesh = tm.build_trimesh(verts, tris, slot=slot)
    stepf = make_step_fn(CFG, substeps=12, donate=False, trimesh=mesh)
    for _ in range(30):
        w = stepf(w)
    assert abs(float(w.pos[1, 1]) - 0.25) < 0.01
    assert abs(float(w.linvel[1, 1])) < 0.02


def test_box_rests_on_mesh_floor():
    verts, tris = grid_floor_mesh(n=8, size=10.0, y=0.0)
    b = WorldBuilder(CFG, 0)
    slot = b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    b.body_type[slot] = int(BodyType.TRIMESH)
    b.add_body(BodyType.BOX, (0.0, 1.5, 0.0), (0.8, 0.8, 0.8))
    w = b.finish()
    mesh = tm.build_trimesh(verts, tris, slot=slot)
    stepf = make_step_fn(CFG, substeps=12, donate=False, trimesh=mesh)
    for _ in range(40):
        w = stepf(w)
    # box corners probe with skin margin: rests at half-height ± margin
    assert abs(float(w.pos[1, 1]) - 0.4) < 0.05


@pytest.mark.skipif(not os.path.exists(TEAPOT), reason="teapot fixture absent")
def test_teapot_loads_and_collides():
    verts, tris = load_obj(TEAPOT)
    assert verts.shape[0] > 4000 and tris.shape[0] > 8000
    mesh = tm.build_trimesh(verts, tris, slot=0)
    assert mesh.num_tris % 128 == 0

    # probe sphere centered on an actual mesh vertex must contact (dist 0)
    center = jnp.asarray(verts[100], jnp.float32)
    pts, nrm, dep, val = tm.sphere_mesh_contacts(center, 0.3, mesh, k=4)
    assert bool(val[0]) and float(dep[0]) > 0.25


@pytest.mark.skipif(not os.path.exists(TEAPOT), reason="teapot fixture absent")
def test_sphere_settles_on_teapot():
    verts, tris = load_obj(TEAPOT)
    cfg = CFG
    b = WorldBuilder(cfg, 0)
    slot = b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    b.body_type[slot] = int(BodyType.TRIMESH)
    top = float(verts[:, 1].max())
    b.add_body(BodyType.SPHERE, (0.0, top + 1.0, 0.0), (0.3, 0.0, 0.0))
    w = b.finish()
    mesh = tm.build_trimesh(verts, tris, slot=slot)
    stepf = make_step_fn(cfg, substeps=12, donate=False, trimesh=mesh)
    y_prev = None
    for _ in range(40):
        w = stepf(w)
    y = float(w.pos[1, 1])
    # settled somewhere on the teapot (not fallen through, not stuck at start)
    assert y < top + 1.0
    assert y > -0.5
    assert abs(float(w.linvel[1, 1])) < 0.5


GRASSPLANE = "/root/reference/res/grassPlane.obj"


@pytest.mark.skipif(not os.path.exists(GRASSPLANE),
                    reason="grassPlane fixture absent")
def test_grassplane_mesh_loads_and_supports_sphere():
    """BASELINE names grassPlane.obj the conformance scene mesh."""
    verts, tris = load_obj(GRASSPLANE)
    assert tris.shape[0] > 0
    mesh = tm.build_trimesh(verts, tris, slot=0)
    # drop a sphere above the mesh's center; it must land on the surface
    cx = float(verts[:, 0].mean())
    cz = float(verts[:, 2].mean())
    top = float(verts[:, 1].max())
    b = WorldBuilder(CFG, 0)
    slot = b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0.0, 0.0, 0.0))
    b.body_type[slot] = int(BodyType.TRIMESH)
    b.add_body(BodyType.SPHERE, (cx, top + 2.0, cz), (0.3, 0.0, 0.0))
    w = b.finish()
    stepf = make_step_fn(CFG, substeps=12, donate=False, trimesh=mesh)
    for _ in range(40):
        w = stepf(w)
    y = float(w.pos[1, 1])
    assert y < top + 2.0          # fell
    assert y > float(verts[:, 1].min()) - 0.5   # did not tunnel through
    assert abs(float(w.linvel[1, 1])) < 0.5
