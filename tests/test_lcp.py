"""SolverKind.DANTZIG — the direct dWorldStep-semantics LCP solver.

Three levels of validation:

1. analytic: a single head-on sphere-sphere contact has a closed-form
   impulse under the CFM-regularized system — the solver must hit it;
2. limit-point: QuickStep (PGS) with CFM softening converges to the unique
   solution of (A + cfm/h·I)λ = rhs as iterations grow — DANTZIG must be
   that limit, and must be *closer* to it than a 20-iteration PGS solve
   (the "tighter than PGS" criterion of VERDICT item 3);
3. trajectory: 1k-step sphere-drop conformance vs the independent NumPy
   referee's direct mode (tests/_traj_engine.py + testing/referee.py) —
   the regularized LCP solution is unique, so two independent direct
   implementations must track at machine precision.
"""

import pathlib
import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
from rl_ode_physics_tpu.core.state import BodyType
from rl_ode_physics_tpu.core.world import make_step_fn
from rl_ode_physics_tpu.models import scenes
from rl_ode_physics_tpu.models.builder import WorldBuilder
from rl_ode_physics_tpu.ops import broadphase as bp
from rl_ode_physics_tpu.ops import narrowphase as nphase
from rl_ode_physics_tpu.ops import integrator
from rl_ode_physics_tpu.ops.lcp import solve_dantzig
from rl_ode_physics_tpu.ops.solver import solve_pgs

REPO = pathlib.Path(__file__).resolve().parent.parent

CFG = EngineConfig(max_bodies=16, max_pair_candidates=64, max_contacts=64)


def _contact_state(num_bodies=10, seed=42, settle=300):
    """A settled, contact-rich state plus its contact rows (post-gravity)."""
    w = scenes.bench_world(CFG, num_bodies=num_bodies, seed=seed)
    stepf = make_step_fn(CFG, substeps=1, donate=False)
    for _ in range(settle):
        w = stepf(w)
    cand = bp.broadphase(w, CFG)
    contacts = nphase.narrowphase(w, cand, CFG)
    w = integrator.apply_external_forces(w, CFG)
    return w, contacts


@pytest.mark.slow
def test_dantzig_analytic_single_contact():
    """Head-on overlapping spheres, no friction: λ = (target − v_n)/
    (m_a⁻¹ + m_b⁻¹ + cfm/h) exactly (single-row LCP)."""
    cfg = CFG.replace(friction=False, bounce=0.0)
    b = WorldBuilder(cfg, 0)
    b.add_body(BodyType.SPHERE, (0.0, 0.0, 0.0), (0.5, 0.0, 0.0),
               linvel=(1.0, 0.0, 0.0))
    b.add_body(BodyType.SPHERE, (0.9, 0.0, 0.0), (0.5, 0.0, 0.0),
               linvel=(-1.0, 0.0, 0.0))
    w = b.finish()
    # gravity off for the analytic check
    cfg = cfg.replace(gravity=(0.0, 0.0, 0.0))

    cand = bp.broadphase(w, cfg)
    contacts = nphase.narrowphase(w, cand, cfg)
    assert int(contacts.count) == 1
    depth = float(contacts.depth[0])
    assert abs(depth - 0.1) < 1e-6

    out = solve_dantzig(w, contacts, cfg)

    cfm_term = cfg.cfm / cfg.dt
    target = min(cfg.erp * depth / cfg.dt, cfg.max_correcting_vel)
    v_n0 = -2.0                                     # closing speed along +x
    lam = (target - v_n0) / (2.0 + cfm_term)        # unit masses
    # body a gets −λ·n with n = +x
    assert abs(float(out.linvel[0, 0]) - (1.0 - lam)) < 1e-5
    assert abs(float(out.linvel[1, 0]) - (-1.0 + lam)) < 1e-5


def test_dantzig_is_the_quickstep_limit():
    """DANTZIG equals many-iteration PGS (unique regularized solution) and
    is tighter than the default 20-iteration PGS solve."""
    w, contacts = _contact_state()
    assert int(contacts.count) >= 4

    d = solve_dantzig(w, contacts, CFG)
    pgs_20 = solve_pgs(w, contacts, CFG)
    pgs_400 = solve_pgs(w, contacts, CFG.replace(solver_iterations=400))

    def dist(a, b):
        return float(jnp.max(jnp.abs(
            jnp.concatenate([a.linvel - b.linvel, a.angvel - b.angvel], -1))))

    err_20 = dist(pgs_20, d)
    err_400 = dist(pgs_400, d)
    # PGS converges toward the direct answer...
    assert err_400 < err_20
    # ...and gets numerically close to it (f32 + 400 sweeps)
    assert err_400 < 5e-4, (err_20, err_400)
    assert err_20 > 5 * err_400


def test_dantzig_no_friction_complementarity():
    """Without friction the pure normal LCP must satisfy complementarity of
    the regularized system: λ ≥ 0, w = Aλ + b ≥ 0, λ·w ≈ 0."""
    cfg = CFG.replace(friction=False)
    w, contacts = _contact_state()
    out = solve_dantzig(w, contacts, cfg)

    from rl_ode_physics_tpu.ops import lcp as lcp_m
    jw, a_mat, b, valid, is_normal, _mu = lcp_m._build_lcp(w, contacts, cfg)
    lam = lcp_m._pivot_solve(a_mat, b, valid & is_normal, is_normal, False)
    wv = a_mat @ lam + b
    lam_n = np.asarray(lam)[np.asarray(valid & is_normal)]
    w_n = np.asarray(wv)[np.asarray(valid & is_normal)]
    assert lam_n.min() >= -1e-6
    assert w_n.min() >= -1e-4
    assert np.abs(lam_n * w_n).max() < 1e-4


def test_dantzig_finite_mu_is_the_quickstep_limit():
    """Finite-μ boxed rows (round-5 capability close-out): DANTZIG with the
    findex bound coupling must be the many-iteration PGS fixed point (PGS
    uses the identical mu·λ_n bound, ops/solver.py), and every friction
    impulse must respect its box |λ_t| ≤ μ·λ_n."""
    cfg = CFG.replace(mu=0.4)
    w, contacts = _contact_state()
    assert int(contacts.count) >= 4

    d = solve_dantzig(w, contacts, cfg)
    pgs_40 = solve_pgs(w, contacts, cfg.replace(solver_iterations=40))
    pgs_800 = solve_pgs(w, contacts, cfg.replace(solver_iterations=800))

    def dist(a, b):
        return float(jnp.max(jnp.abs(
            jnp.concatenate([a.linvel - b.linvel, a.angvel - b.angvel], -1))))

    err_40 = dist(pgs_40, d)
    err_800 = dist(pgs_800, d)
    assert err_800 < err_40
    assert err_800 < 1e-3, (err_40, err_800)

    # box feasibility of the direct λ
    from rl_ode_physics_tpu.ops import lcp as lcp_m
    jw, a_mat, b, valid, is_normal, mu_row = lcp_m._build_lcp(
        w, contacts, cfg)
    lam = lcp_m._pivot_solve(a_mat, b, valid, is_normal, True, mu_row)
    c = contacts.a.shape[0]
    lam = np.asarray(lam)
    lam_n = lam[:c]
    v = np.asarray(contacts.valid)
    assert lam_n[v].min() >= -1e-6
    bound = np.asarray(mu_row) * np.maximum(lam_n, 0.0) + 1e-5
    assert (np.abs(lam[c:2 * c]) <= bound)[v].all()
    assert (np.abs(lam[2 * c:]) <= bound)[v].all()


def test_dantzig_finite_mu_sliding_clamp_binds():
    """A fast-sliding box on the floor: the tangential rows must clamp AT
    the friction-pyramid bound (|λ_t| = μ·λ_n for the motion axis) and the
    impulse must oppose the slide."""
    from rl_ode_physics_tpu.models.builder import WorldBuilder
    from rl_ode_physics_tpu.ops import lcp as lcp_m

    cfg = CFG.replace(mu=0.3)
    b = WorldBuilder(cfg, 0)
    b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (100.0, 1.0, 100.0))
    slot = b.add_body(BodyType.BOX, (0.0, 0.749, 0.0), (0.5, 0.5, 0.5))
    w = b.finish()
    w = w.replace(linvel=w.linvel.at[slot, 0].set(6.0))

    cand = bp.broadphase(w, cfg)
    contacts = nphase.narrowphase(w, cand, cfg)
    w = integrator.apply_external_forces(w, cfg)
    assert int(contacts.count) >= 1

    jw, a_mat, bb, valid, is_normal, mu_row = lcp_m._build_lcp(
        w, contacts, cfg)
    lam = np.asarray(lcp_m._pivot_solve(a_mat, bb, valid, is_normal, True,
                                        mu_row))
    c = contacts.a.shape[0]
    v = np.asarray(contacts.valid)
    lam_n = lam[:c]
    # at 6 m/s the stiction impulse would exceed μ·λ_n: friction clamps
    # PER AXIS (ODE's friction pyramid — PGS clips each tangent row at
    # ±μ·λ_n independently, ops/solver.py); the dominant axis must sit
    # exactly on its bound and no axis may exceed it
    t1_mag, t2_mag = np.abs(lam[c:2 * c]), np.abs(lam[2 * c:])
    bound = 0.3 * lam_n
    on = v & (lam_n > 1e-6)
    assert on.any()
    assert (t1_mag[on] <= bound[on] * (1 + 1e-4)).all()
    assert (t2_mag[on] <= bound[on] * (1 + 1e-4)).all()
    assert np.allclose(np.maximum(t1_mag, t2_mag)[on], bound[on], rtol=1e-3)
    # and the solved state decelerates the slide without reversing it
    out = solve_dantzig(w, contacts, cfg)
    vx = float(out.linvel[slot, 0])
    assert 0.0 < vx < 6.0


def test_dantzig_per_body_surface_is_the_pgs_limit():
    """per_body_surface under DANTZIG (round-5 close-out): pair-mixed
    per-row μ rides the boxed rows; the direct solve is the PGS limit."""
    from rl_ode_physics_tpu.models.builder import WorldBuilder

    cfg = CFG.replace(per_body_surface=True)
    b = WorldBuilder(cfg, 0)
    b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (100.0, 1.0, 100.0))
    s1 = b.add_body(BodyType.BOX, (0.0, 0.749, 0.0), (0.5, 0.5, 0.5))
    s2 = b.add_body(BodyType.SPHERE, (2.0, 0.4, 0.0), (0.4, 0.0, 0.0))
    w = b.finish()
    from rl_ode_physics_tpu.core.world import set_body_surface
    w = set_body_surface(w, s1, friction=0.25)
    w = set_body_surface(w, s2, friction=2.0)
    w = w.replace(linvel=w.linvel.at[s1, 0].set(4.0).at[s2, 0].set(4.0))
    stepf = make_step_fn(cfg, substeps=1, donate=False)
    for _ in range(20):
        w = stepf(w)

    cand = bp.broadphase(w, cfg)
    contacts = nphase.narrowphase(w, cand, cfg)
    w2 = integrator.apply_external_forces(w, cfg)
    d = solve_dantzig(w2, contacts, cfg)
    pgs_800 = solve_pgs(w2, contacts, cfg.replace(solver_iterations=800))
    err = float(jnp.max(jnp.abs(jnp.concatenate(
        [d.linvel - pgs_800.linvel, d.angvel - pgs_800.angvel], -1))))
    assert err < 1e-3, err


@pytest.mark.slow
def test_dantzig_trajectory_vs_referee_direct(tmp_path):
    """1k-step sphere-drop: engine DANTZIG vs the referee's independent
    direct solve — unique solution ⇒ machine-precision tracking."""
    from rl_ode_physics_tpu.testing.referee import RefereeConfig, referee_step

    out = tmp_path / "dantzig.npz"
    r = subprocess.run(
        [sys.executable, str(REPO / "tests" / "_traj_engine.py"),
         "sphere_drop", str(out), "1000", "dantzig"],
        capture_output=True, text=True, timeout=1800, cwd=str(REPO))
    assert r.returncode == 0, r.stderr[-3000:]
    data = np.load(out)
    init = {k[5:]: data[k] for k in data.files if k.startswith("init_")}

    cfg = RefereeConfig(solver="dantzig")
    w = dict(init)
    errs = []
    for t in range(1000):
        w = referee_step(w, cfg)
        errs.append(np.abs(data["pos"][t] - w["pos"]).max())
    err = max(errs)
    print(f"[conformance:sphere_drop:dantzig] max abs pos err = {err:.3e}")
    assert err <= 1e-5
