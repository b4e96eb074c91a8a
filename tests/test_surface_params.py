"""Per-body surface parameters (friction/restitution mixing) — beyond
parity: ODE sets dSurfaceParameters per contact in the NearCallback; here
bodies carry their own and pairs mix min(friction)/max(restitution) when
EngineConfig.per_body_surface is on."""

import dataclasses

import numpy as np
import jax

from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
from rl_ode_physics_tpu.core.state import BodyType
from rl_ode_physics_tpu.core.world import make_step_fn, set_body_surface
from rl_ode_physics_tpu.models.builder import WorldBuilder
import pytest

CFG = EngineConfig(max_bodies=8, max_pair_candidates=32, max_contacts=32,
                   per_body_surface=True)


def _floor_world(*bodies):
    b = WorldBuilder(CFG, 0)
    b.add_body_map((0.0, -0.5, 0.0), (0.0, 0.0, 0.0), (40.0, 1.0, 40.0))
    for bt, pos, size in bodies:
        b.add_body(bt, pos, size)
    return b.finish()


@pytest.mark.slow
def test_defaults_match_global_path():
    """per_body_surface=True with untouched fields reproduces the global
    path (fields initialize from config.mu/config.bounce)."""
    cfg_off = CFG.replace(per_body_surface=False)
    w = _floor_world((BodyType.SPHERE, (0.0, 2.0, 0.0), (0.5, 0.0, 0.0)),
                     (BodyType.BOX, (2.0, 1.5, 0.0), (0.8, 0.8, 0.8)))
    f_on = make_step_fn(CFG, substeps=8, donate=False)
    f_off = make_step_fn(cfg_off, substeps=8, donate=False)
    w_on = w_off = w
    for _ in range(30):
        w_on = f_on(w_on)
        w_off = f_off(w_off)
    np.testing.assert_allclose(np.asarray(w_on.pos), np.asarray(w_off.pos),
                               atol=1e-5)


@pytest.mark.slow
def test_per_body_restitution_controls_bounce():
    """Two identical spheres dropped together; the rubbery one (0.8)
    rebounds much higher than the dead one (0.0)."""
    w = _floor_world((BodyType.SPHERE, (-3.0, 2.0, 0.0), (0.5, 0.0, 0.0)),
                     (BodyType.SPHERE, (3.0, 2.0, 0.0), (0.5, 0.0, 0.0)))
    w = set_body_surface(w, 1, restitution=0.8)
    w = set_body_surface(w, 2, restitution=0.0)
    stepf = make_step_fn(CFG, substeps=4, donate=False)
    peak = [0.0, 0.0]
    bounced = [False, False]
    for i in range(120):
        w = stepf(w)
        for k, slot in enumerate((1, 2)):
            vy = float(w.linvel[slot, 1])
            y = float(w.pos[slot, 1])
            if vy > 0.05:
                bounced[k] = True
            if bounced[k]:
                peak[k] = max(peak[k], y)
    assert peak[0] > 1.0, f"rubber sphere barely bounced: {peak}"
    assert peak[1] < 0.75, f"dead sphere bounced: {peak}"


def test_per_body_friction_controls_sliding():
    """Boxes sliding with initial velocity: the frictionless one keeps
    going, the default (mu=inf) one stops almost immediately."""
    w = _floor_world((BodyType.BOX, (-5.0, 0.4, 0.0), (0.8, 0.8, 0.8)),
                     (BodyType.BOX, (5.0, 0.4, 0.0), (0.8, 0.8, 0.8)))
    w = w.replace(linvel=w.linvel.at[1, 0].set(4.0).at[2, 0].set(4.0))
    w = set_body_surface(w, 1, friction=0.0)
    stepf = make_step_fn(CFG, substeps=8, donate=False)
    for _ in range(15):
        w = stepf(w)
    v_free = float(w.linvel[1, 0])
    v_grip = float(w.linvel[2, 0])
    assert v_free > 3.0, f"frictionless box decelerated: {v_free}"
    assert v_grip < 0.5, f"inf-friction box kept sliding: {v_grip}"


@pytest.mark.slow
def test_pgs_honors_per_body_mu():
    cfg = CFG.replace(solver=SolverKind.PGS)
    w = _floor_world((BodyType.BOX, (0.0, 0.4, 0.0), (0.8, 0.8, 0.8)))
    w = w.replace(linvel=w.linvel.at[1, 0].set(4.0))
    w = set_body_surface(w, 1, friction=0.0)
    stepf = make_step_fn(cfg, substeps=8, donate=False)
    for _ in range(10):
        w = stepf(w)
    assert float(w.linvel[1, 0]) > 3.0


@pytest.mark.slow
def test_surface_params_compose_with_typed_buckets():
    """per_body_surface works through the typed-bucket narrowphase path."""
    cfg = CFG.replace(typed_buckets=True)
    w = _floor_world((BodyType.BOX, (0.0, 0.4, 0.0), (0.8, 0.8, 0.8)))
    w = w.replace(linvel=w.linvel.at[1, 0].set(4.0))
    w = set_body_surface(w, 1, friction=0.0)
    stepf = make_step_fn(cfg, substeps=8, donate=False)
    for _ in range(10):
        w = stepf(w)
    assert float(w.linvel[1, 0]) > 3.0


@pytest.mark.slow
def test_surface_params_compose_with_warmstart():
    import jax as _jax
    from rl_ode_physics_tpu.ops.warmstart import make_warm_step_fn, init_cache

    cfg = CFG
    w = _floor_world((BodyType.SPHERE, (0.0, 2.0, 0.0), (0.5, 0.0, 0.0)))
    w = set_body_surface(w, 1, restitution=0.0)
    stepf = _jax.jit(make_warm_step_fn(cfg))
    cache = init_cache(cfg)
    for _ in range(320):
        w, cache = stepf(w, cache)
    # dead sphere settles on the floor without residual bouncing
    assert abs(float(w.pos[1, 1]) - 0.5) < 0.03
    assert abs(float(w.linvel[1, 1])) < 0.05


@pytest.mark.slow
def test_surface_params_apply_to_trimesh_contacts():
    """VERDICT round-2 item 5b: per-body friction reaches MESH contact rows.

    Two identical boxes slide on a trimesh floor with the same initial
    velocity; one is made frictionless via set_body_surface. The slick box
    must keep (nearly) all its speed while the grippy one (mesh-slot
    friction mixes in as min(mu_box, mu_mesh)) stops. Exercises the
    gathered-feature mu mixing of ops/solver.py through mesh rows, whose
    ``b`` side is the mesh's world slot."""
    from rl_ode_physics_tpu.ops import trimesh as tm
    from tests.test_trimesh import grid_floor_mesh

    verts, tris = grid_floor_mesh(n=4, size=40.0, y=0.0)
    b = WorldBuilder(CFG, 0)
    mesh_slot = b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0),
                               (0.0, 0.0, 0.0))
    b.body_type[mesh_slot] = int(BodyType.TRIMESH)
    s1 = b.add_body(BodyType.BOX, (0.0, 0.4, -3.0), (0.8, 0.8, 0.8))
    s2 = b.add_body(BodyType.BOX, (0.0, 0.4, 3.0), (0.8, 0.8, 0.8))
    w = b.finish()
    mesh = tm.build_trimesh(verts, tris, slot=mesh_slot)

    w = w.replace(linvel=w.linvel.at[s1, 0].set(4.0).at[s2, 0].set(4.0))
    w = set_body_surface(w, s1, friction=0.0)     # slick box

    stepf = make_step_fn(CFG, substeps=8, donate=False, trimesh=mesh)
    for _ in range(10):
        w = stepf(w)
    v_slick = float(w.linvel[s1, 0])
    v_grippy = float(w.linvel[s2, 0])
    assert v_slick > 3.0, v_slick              # frictionless keeps sliding
    assert v_grippy < 0.5, v_grippy            # mu=inf via mesh slot stops it

    # and the mesh slot's own surface participates in the mixing: a slick
    # MESH makes the grippy box slide too (min rule)
    w2 = b.finish()
    w2 = w2.replace(linvel=w2.linvel.at[s2, 0].set(4.0))
    w2 = set_body_surface(w2, mesh_slot, friction=0.0)
    for _ in range(10):
        w2 = stepf(w2)
    assert float(w2.linvel[s2, 0]) > 3.0
