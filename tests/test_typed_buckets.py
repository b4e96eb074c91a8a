"""Typed-bucket narrowphase == classic narrowphase, as a contact SET.

Rows come out in bucket order instead of global pair order, so equality is
checked on the (key → depth/point/normal/a/b) mapping, not row-by-row.
Also: a Jacobi trajectory through the typed path stays within solver
tolerance of the classic path (order-independent math up to reduction
rounding).
"""

import jax
import jax.numpy as jnp
import numpy as np

from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
from rl_ode_physics_tpu.core.world import make_step_fn, step
from rl_ode_physics_tpu.models import scenes
from rl_ode_physics_tpu.ops import broadphase as bp
from rl_ode_physics_tpu.ops import narrowphase as nphase
import pytest

CFG = EngineConfig(max_bodies=16, max_pair_candidates=64, max_contacts=128,
                   max_contacts_per_pair=8)
TYPED = CFG.replace(typed_buckets=True)


def _settled(steps=200, num_bodies=10, capsule=False):
    cfg = CFG
    w = scenes.bench_world(cfg, num_bodies=num_bodies, seed=42)
    if capsule:
        from rl_ode_physics_tpu.core.world import add_body
        from rl_ode_physics_tpu.core.state import BodyType
        s = float(np.sin(np.pi / 4))
        w, _ = add_body(w, BodyType.CAPSULE, (2.5, 1.0, 0.0),
                        (0.25, 1.0, 0.0), quat=(s, 0.0, s, 0.0))
    stepf = make_step_fn(cfg, substeps=1, donate=False)
    for _ in range(steps):
        w = stepf(w)
    return w


def _contact_map(contacts):
    out = {}
    valid = np.asarray(contacts.valid)
    for i in np.nonzero(valid)[0]:
        out[int(contacts.key[i])] = (
            int(contacts.a[i]), int(contacts.b[i]),
            float(contacts.depth[i]),
            np.asarray(contacts.point[i]), np.asarray(contacts.normal[i]),
        )
    return out


def test_typed_equals_classic_contact_set():
    w = _settled(capsule=True)
    classic = nphase.narrowphase(w, bp.broadphase(w, CFG), CFG)
    typed, num_pairs = nphase.narrowphase_typed(w, TYPED)

    m_c = _contact_map(classic)
    m_t = _contact_map(typed)
    assert len(m_c) >= 8
    assert set(m_c) == set(m_t)
    assert int(num_pairs) >= 6
    for key, (a, b, d, p, n) in m_c.items():
        at, bt, dt, pt, nt = m_t[key]
        assert (a, b) == (at, bt)
        np.testing.assert_allclose(d, dt, atol=1e-6)
        np.testing.assert_allclose(p, pt, atol=1e-6)
        np.testing.assert_allclose(n, nt, atol=1e-6)


def test_typed_trajectory_matches_classic_jacobi():
    w0 = _settled(steps=150)
    fa = make_step_fn(CFG, substeps=1, donate=False)
    fb = make_step_fn(TYPED, substeps=1, donate=False)
    wa = wb = w0
    for _ in range(100):
        wa = fa(wa)
        wb = fb(wb)
    # same contact set, order-independent Jacobi: only reduction-order
    # rounding differs -> tight tolerance over 100 steps
    np.testing.assert_allclose(np.asarray(wa.pos), np.asarray(wb.pos),
                               atol=5e-4)


def test_typed_bucket_cap_override_and_overflow():
    cfg = TYPED.replace(bucket_caps=((1, 1, 2),))   # sphere-sphere cap 2
    w = _settled()
    typed, _ = nphase.narrowphase_typed(w, cfg)
    # engine still runs; dropped pairs surface in the overflow counter
    assert int(typed.overflow) >= 0
    s = step(w, cfg)
    assert np.isfinite(np.asarray(s.pos)).all()


@pytest.mark.slow
def test_solver_cm_matches_row_major():
    """config.solver_cm (component-major JACOBI loop — contacts in lanes)
    vs the row-major loop on a contact-rich settled bench state: identical
    math, f32-roundoff agreement (the two matmul forms sum in different
    orders). The CM loop is an A/B lever kept with a measured NEGATIVE
    end-to-end result on TPU (60.4M vs 60.9M body-steps/sec, round 4 —
    the once-per-substep plane transposes cost more than the full-lane
    elementwise ops save at chunk 256; docs/BENCHMARKS.md)."""
    import jax
    from rl_ode_physics_tpu.core.world import make_step_fn
    from rl_ode_physics_tpu.models import scenes
    from rl_ode_physics_tpu.ops import integrator as integ
    from rl_ode_physics_tpu.ops import narrowphase as nph
    from rl_ode_physics_tpu.ops import solver as sol

    base = EngineConfig.throughput(max_bodies=64, max_pair_candidates=256,
                                   max_contacts=64)
    w = scenes.bench_world(base, num_bodies=60)
    stepf = make_step_fn(base, substeps=12, donate=False)
    for _ in range(10):
        w = stepf(w)
    cont, _ = jax.jit(lambda s: nph.narrowphase_typed(s, base))(w)
    assert int(cont.count) > 20, "settled state should be contact-rich"
    w2 = jax.jit(lambda s: integ.apply_external_forces(s, base))(w)

    r_rm = jax.jit(lambda s, c: sol.solve(s, c, base))(w2, cont)
    r_cm = jax.jit(
        lambda s, c: sol.solve(s, c, base.replace(solver_cm=True)))(w2, cont)
    np.testing.assert_allclose(np.asarray(r_rm.linvel),
                               np.asarray(r_cm.linvel), atol=2e-5)
    np.testing.assert_allclose(np.asarray(r_rm.angvel),
                               np.asarray(r_cm.angvel), atol=2e-5)
