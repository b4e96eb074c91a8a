"""Cross-engine conformance (SURVEY.md §4 tier 2).

No ODE binding ships in this environment, so MuJoCo (same semi-implicit
Euler integrator family) is the independent referee for the dynamics that
are solver-agnostic, and analytic results check contact behavior:

* ballistic integration matches MuJoCo step-for-step (integrator
  convention check — both engines use v ← v+dt·g; x ← x+dt·v),
* resting contact heights are exact surface offsets,
* PGS and Jacobi solvers agree on equilibrium states,
* gyroscopic (Dzhanibekov-adjacent) stability: angular momentum of a
  torque-free spinning box is conserved in the world frame.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
from rl_ode_physics_tpu.core.state import BodyType
from rl_ode_physics_tpu.core.world import make_step_fn
from rl_ode_physics_tpu.models import scenes
from rl_ode_physics_tpu.models.builder import WorldBuilder

CFG = EngineConfig(max_bodies=8, max_pair_candidates=32, max_contacts=64)

mujoco = pytest.importorskip("mujoco")

BALLISTIC_XML = """
<mujoco>
  <option gravity="0 -9.8 0" timestep="{dt}" integrator="Euler"/>
  <worldbody>
    <body pos="0 5 0">
      <freejoint/>
      <geom type="sphere" size="0.15" mass="1"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_ballistic_matches_mujoco_step_for_step():
    m = mujoco.MjModel.from_xml_string(BALLISTIC_XML.format(dt=CFG.dt))
    d = mujoco.MjData(m)

    b = WorldBuilder(CFG, 0)
    b.add_body(BodyType.SPHERE, (0.0, 5.0, 0.0), (0.15, 0.0, 0.0))
    w = b.finish()
    stepf = make_step_fn(CFG, substeps=1, donate=False)

    for k in range(60):
        mujoco.mj_step(m, d)
        w = stepf(w)
        ours = float(w.pos[0, 1])
        theirs = float(d.qpos[1])
        assert abs(ours - theirs) < 1e-4, (k, ours, theirs)


def test_ballistic_with_initial_velocity_matches_mujoco():
    m = mujoco.MjModel.from_xml_string(BALLISTIC_XML.format(dt=CFG.dt))
    d = mujoco.MjData(m)
    d.qvel[0:3] = [1.5, 2.0, -0.7]

    b = WorldBuilder(CFG, 0)
    b.add_body(BodyType.SPHERE, (0.0, 5.0, 0.0), (0.15, 0.0, 0.0),
               linvel=(1.5, 2.0, -0.7))
    w = b.finish()
    stepf = make_step_fn(CFG, substeps=1, donate=False)

    for k in range(60):
        mujoco.mj_step(m, d)
        w = stepf(w)
        assert np.allclose(np.asarray(w.pos[0]), np.asarray(d.qpos[0:3]),
                           atol=1e-4), k


@pytest.mark.slow
def test_resting_height_on_plane_geom():
    """Sphere on an infinite plane settles at exactly r (both solvers)."""
    for solver in (SolverKind.JACOBI, SolverKind.PGS):
        cfg = CFG.replace(solver=solver)
        b = WorldBuilder(cfg, 0)
        i = b.add_body_map((0.0, 0.0, 0.0), (-np.pi / 2, 0.0, 0.0),
                           (0.0, 0.0, 0.0))
        # plane with +y world normal: local +z rotated onto +y
        b.body_type[i] = int(BodyType.PLANE)
        b.add_body(BodyType.SPHERE, (0.0, 1.0, 0.0), (0.25, 0.0, 0.0))
        w = b.finish()
        stepf = make_step_fn(cfg, substeps=12, donate=False)
        for _ in range(25):
            w = stepf(w)
        assert abs(float(w.pos[1, 1]) - 0.25) < 5e-3, solver


def test_angular_momentum_conserved_torque_free():
    """Spinning box, no gravity/contacts: world-frame angular momentum L is
    conserved by the gyroscopic integrator (‖ΔL‖/‖L‖ small over 2s)."""
    cfg = CFG.replace(gravity=(0.0, 0.0, 0.0))
    b = WorldBuilder(cfg, 0)
    b.add_body(BodyType.BOX, (0.0, 0.0, 0.0), (0.2, 1.0, 2.0),
               angvel=(3.0, 0.2, 0.1),
               inertia=(1.0 / 12 * (1 + 4), 1.0 / 12 * (0.04 + 4),
                        1.0 / 12 * (0.04 + 1)))
    w = b.finish()
    stepf = make_step_fn(cfg, substeps=8, donate=False)

    from rl_ode_physics_tpu.core.state import similarity_diag
    from rl_ode_physics_tpu.utils import quat as q

    def ang_mom(w):
        r = np.asarray(q.to_matrix(w.quat[0]))
        i_body = np.diag(1.0 / np.asarray(w.inv_inertia[0]))
        return r @ i_body @ r.T @ np.asarray(w.angvel[0])

    l0 = ang_mom(w)
    for _ in range(30):
        w = stepf(w)
    l1 = ang_mom(w)
    assert np.linalg.norm(l1 - l0) / np.linalg.norm(l0) < 0.02


def test_solvers_agree_on_stack_equilibrium():
    results = {}
    for solver in (SolverKind.JACOBI, SolverKind.PGS):
        cfg = CFG.replace(solver=solver)
        w = scenes.grass_plane_world(cfg)
        from rl_ode_physics_tpu.core.world import add_body
        for i in range(2):
            w, _ = add_body(w, BodyType.BOX, (0.0, 1.0 + i * 1.01, 0.0),
                            (1.0, 1.0, 1.0))
        stepf = make_step_fn(cfg, substeps=12, donate=False)
        for _ in range(30):
            w = stepf(w)
        results[solver] = [float(w.pos[4, 1]), float(w.pos[5, 1])]
    a, b = results[SolverKind.JACOBI], results[SolverKind.PGS]
    assert np.allclose(a, b, atol=0.02), results
    assert np.allclose(a, [1.0, 2.0], atol=0.05)
