"""Iteration-count vs solve-error curve, cold start vs warm start.

For each iteration count: builds the impulse cache over 8 warm steps on a
settled resting scene, then measures — from the SAME state and contact
rows — the distance of one cold solve and one warm solve to the converged
(400-iteration) impulse field. Results table + the honest conclusion live
in docs/CONFORMANCE.md (warm starting does not pay at ≥5 iterations for
these solvers; cold start stays the default).

Run: ``python benchmarks/warmstart_curve.py``
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
    from rl_ode_physics_tpu.core.world import make_step_fn
    from rl_ode_physics_tpu.models import scenes
    from rl_ode_physics_tpu.ops import warmstart
    from rl_ode_physics_tpu.ops import broadphase as bp
    from rl_ode_physics_tpu.ops import narrowphase as nph
    from rl_ode_physics_tpu.ops import integrator
    from rl_ode_physics_tpu.ops import solver as so

    for kind in (SolverKind.PGS, SolverKind.JACOBI):
        cfg = EngineConfig(max_bodies=16, max_pair_candidates=64,
                           max_contacts=64, solver=kind)
        w0 = scenes.bench_world(cfg, num_bodies=10, seed=42)
        stepf = make_step_fn(cfg, substeps=1, donate=False)
        for _ in range(244):
            w0 = stepf(w0)
        solve = (so.solve_pgs if kind is SolverKind.PGS else so.solve_jacobi)

        print(f"{kind}:")
        print(f"{'iters':>6} {'cold |dlam|':>13} {'warm |dlam|':>13} {'ratio':>7}")
        for iters in (1, 2, 3, 5, 10, 20):
            c = cfg.replace(solver_iterations=iters)
            warm_fn = jax.jit(warmstart.make_warm_step_fn(c))
            cache = warmstart.init_cache(c)
            w = w0
            for _ in range(8):
                w, cache = warm_fn(w, cache)

            cand = bp.broadphase(w, c)
            contacts = nph.narrowphase(w, cand, c)
            wf = integrator.apply_external_forces(w, c)
            _, lam_star = solve(wf, contacts,
                                c.replace(solver_iterations=400),
                                return_lam=True)
            _, lam_cold = solve(wf, contacts, c, return_lam=True)
            lam0 = warmstart.match_lam(cache, contacts)
            _, lam_warm = solve(wf, contacts, c, lam0=lam0, return_lam=True)

            e_cold = float(np.abs(np.asarray(lam_cold - lam_star)).max())
            e_warm = float(np.abs(np.asarray(lam_warm - lam_star)).max())
            print(f"{iters:>6} {e_cold:>13.3e} {e_warm:>13.3e} "
                  f"{e_cold / max(e_warm, 1e-12):>7.1f}")


if __name__ == "__main__":
    main()
