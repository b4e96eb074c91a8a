"""VMEM-resident Pallas solver: equivalence with the jnp Jacobi spec.

Runs in interpret mode on the CPU test platform; on real TPU the compiled
kernel matches the jnp path bitwise (verified on hardware — see module
docstring of ops/solver_pallas.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.world import make_step_fn
from rl_ode_physics_tpu.models import scenes
from rl_ode_physics_tpu.ops import broadphase as bp
from rl_ode_physics_tpu.ops import integrator as integ
from rl_ode_physics_tpu.ops import narrowphase as nph
from rl_ode_physics_tpu.ops import solver as sol
from rl_ode_physics_tpu.ops import solver_pallas as sp

CFG = EngineConfig(max_bodies=16, max_pair_candidates=64, max_contacts=64,
                   max_contacts_per_pair=4)


def _contact_rich_world():
    w = scenes.bench_world(CFG, num_bodies=12)
    stepf = make_step_fn(CFG, substeps=12, donate=False)
    for _ in range(15):
        w = stepf(w)
    return w


def test_pallas_solve_matches_jnp_single():
    w = _contact_rich_world()
    cand = bp.broadphase(w, CFG)
    cont = nph.narrowphase(w, cand, CFG)
    w2 = integ.apply_external_forces(w, CFG)
    assert int(cont.count) > 5, "needs contacts to be meaningful"

    ref = sol.solve_jacobi(w2, cont, CFG)
    pal = sp.solve_jacobi_pallas(w2, cont, CFG, interpret=True)
    assert np.allclose(np.asarray(ref.linvel), np.asarray(pal.linvel),
                       atol=1e-6)
    assert np.allclose(np.asarray(ref.angvel), np.asarray(pal.angvel),
                       atol=1e-6)


def test_pallas_solve_batched():
    from rl_ode_physics_tpu.parallel.batch import replicate

    w = _contact_rich_world()
    batch = replicate(w, 3)
    cand = jax.vmap(lambda s: bp.broadphase(s, CFG))(batch)
    cont = jax.vmap(lambda s, c: nph.narrowphase(s, c, CFG))(batch, cand)
    b2 = jax.vmap(lambda s: integ.apply_external_forces(s, CFG))(batch)

    ref = jax.vmap(lambda s, c: sol.solve_jacobi(s, c, CFG))(b2, cont)
    pal = sp.solve_batched(b2, cont, CFG, interpret=True)
    assert np.allclose(np.asarray(ref.linvel), np.asarray(pal.linvel),
                       atol=1e-6)
