"""Capability-matrix contract (docs/API.md): every unsupported solver ×
feature composition errors at CONFIG time (EngineConfig.validate via
make_step_fn), never as a silent fallback or a mid-trace surprise; every
supported cell steps.

VERDICT round-2 item 6: the matrix previously had holes a user hit at
runtime (finite-mu DANTZIG raised mid-trace, FUSED silently fell back).
FUSED is retired (round 3); the remaining cells are enforced here.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
from rl_ode_physics_tpu.core.world import make_step_fn
from rl_ode_physics_tpu.models import scenes

SMALL = dict(max_bodies=8, max_pair_candidates=32, max_contacts=32)


def test_dantzig_finite_mu_ok_without_friction():
    cfg = EngineConfig(solver=SolverKind.DANTZIG, mu=1.0, friction=False,
                       **SMALL)
    w = scenes.sphere_drop_world(cfg, height=1.0)
    w = make_step_fn(cfg, donate=False)(w)
    assert np.isfinite(np.asarray(w.pos)).all()


def test_dantzig_per_body_surface_steps():
    """Round-5 capability close-out: per_body_surface under DANTZIG is a
    WORKS cell (boxed rows take the pair-mixed per-row mu, ops/lcp.py)."""
    cfg = EngineConfig(solver=SolverKind.DANTZIG, per_body_surface=True,
                       **SMALL)
    w = scenes.sphere_drop_world(cfg, height=1.0)
    stepf = make_step_fn(cfg, donate=False)
    for _ in range(5):
        w = stepf(w)
    assert np.isfinite(np.asarray(w.pos)).all()


def test_bf16_selectors_capped_at_256_bodies():
    cfg = EngineConfig(selector_dtype="bfloat16", max_bodies=512,
                       max_pair_candidates=512, max_contacts=256,
                       max_contacts_per_pair=4)
    with pytest.raises(ValueError, match="bfloat16"):
        make_step_fn(cfg, donate=False)


def test_warmstart_key_space_capped():
    cfg = EngineConfig(max_bodies=2048, max_pair_candidates=512,
                       max_contacts=256, max_contacts_per_pair=8)
    with pytest.raises(ValueError, match="2\\^24|exceeds"):
        make_step_fn(cfg, donate=False)


def test_dense_plus_typed_buckets_rejected():
    cfg = EngineConfig(dense_pipeline=True, typed_buckets=True, **SMALL)
    with pytest.raises(ValueError, match="mutually exclusive"):
        make_step_fn(cfg, donate=False)


def test_warmstart_rejects_dantzig():
    from rl_ode_physics_tpu.ops.warmstart import make_warm_step_fn
    cfg = EngineConfig(solver=SolverKind.DANTZIG, **SMALL)
    with pytest.raises(ValueError, match="PGS and JACOBI"):
        make_warm_step_fn(cfg)


@pytest.mark.parametrize("solver", [SolverKind.JACOBI, SolverKind.PGS,
                                    SolverKind.DANTZIG])
def test_finite_mu_iterative_solvers_step(solver):
    """Finite μ is a WORKS cell for EVERY solver (round 5 closed the
    DANTZIG hole with boxed-row pivoting): a sliding box on the floor
    decelerates under the pyramid bound but does not stop dead
    (μ=0.3 < the stiction needed at this speed)."""
    from rl_ode_physics_tpu.core.state import BodyType
    from rl_ode_physics_tpu.models.builder import WorldBuilder

    cfg = EngineConfig(solver=solver, mu=0.3, solver_iterations=20, **SMALL)
    b = WorldBuilder(cfg, 0)
    b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (100.0, 1.0, 100.0))
    slot = b.add_body(BodyType.BOX, (0.0, 0.751, 0.0), (0.5, 0.5, 0.5))
    w = b.finish()
    w = w.replace(linvel=w.linvel.at[slot, 0].set(4.0))
    stepf = make_step_fn(cfg, substeps=1, donate=False)
    v0 = float(w.linvel[slot, 0])
    for _ in range(30):
        w = stepf(w)
    v1 = float(w.linvel[slot, 0])
    assert 0.0 < v1 < v0 - 0.3, (v0, v1)  # decelerating, not stopped


# --- precision-policy profile constructors (docs/CONFORMANCE.md §2) -------

def test_throughput_profile_is_the_shipped_setting():
    """EngineConfig.throughput() IS the bench/production policy: heavy-ball
    Jacobi at its gated 8-sweep budget, typed buckets, K=4, TPU-default
    matmul precision. The conformance suite measures THIS config's
    trajectory error, so the constructor pins the two together."""
    t = EngineConfig.throughput(max_bodies=64)
    assert t.solver is SolverKind.JACOBI
    assert (t.solver_iterations, t.jacobi_omega, t.jacobi_beta) == (8, 1.3, 0.9)
    assert t.typed_buckets and t.max_contacts_per_pair == 4
    assert t.matmul_precision == "default"
    # bf16 selectors auto-picked when slot ids are bf16-exact...
    assert t.selector_dtype == "bfloat16"
    # ...and f32 above 256 slots (otherwise validate() would reject)
    assert EngineConfig.throughput(max_bodies=512).selector_dtype == "float32"
    # explicit override wins
    assert EngineConfig.throughput(
        max_bodies=64, selector_dtype="float32").selector_dtype == "float32"
    assert not t.is_fidelity_grade


def test_conformance_profile_is_fidelity_grade():
    c = EngineConfig.conformance()
    assert c.solver is SolverKind.PGS
    assert c.solver_iterations == 20 and c.sor_omega == 1.3
    assert c.exact_box_clip and not c.typed_buckets
    assert c.max_contacts_per_pair == 8
    assert c.is_fidelity_grade
    # the throughput default precision is NOT fidelity grade — the property
    # is what conformance tools assert on (tests/_traj_engine.py)
    assert not EngineConfig.throughput(max_bodies=64).is_fidelity_grade
    # profiles validate at construction: impossible compositions raise
    import pytest
    with pytest.raises(ValueError):
        EngineConfig.conformance(selector_dtype="bfloat16", max_bodies=512,
                                 max_pair_candidates=1024, max_contacts=512)


@pytest.mark.slow
def test_profiles_step(tiny_world_factory=None):
    """Both profiles actually step a world (no mid-trace surprises)."""
    import jax.numpy as jnp
    from rl_ode_physics_tpu.models import scenes
    from rl_ode_physics_tpu.core.world import make_step_fn
    for cfg in (EngineConfig.throughput(max_bodies=16,
                                        max_pair_candidates=64,
                                        max_contacts=64),
                EngineConfig.conformance(max_bodies=16,
                                         max_pair_candidates=64,
                                         max_contacts=64,
                                         solver_iterations=5)):
        w = scenes.sphere_drop_world(cfg, height=2.0)
        stepf = make_step_fn(cfg, substeps=2, donate=False)
        w = stepf(w)
        assert bool(jnp.all(jnp.isfinite(w.pos)))
