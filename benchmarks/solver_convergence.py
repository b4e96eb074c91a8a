"""Convergence of the mass-splitting Jacobi solver: plain vs heavy-ball.

Question answered: how many momentum-accelerated sweeps match plain Jacobi
at ODE's default 20 iterations? "Match" is measured in SOLUTION space, not
residual space: error of the post-solve velocity state against a
quasi-converged reference solve (plain Jacobi at 400 iterations) on
contact-rich bench-scene states.

    python benchmarks/solver_convergence.py          # CPU, fast

The winning (beta, iters) pair feeds bench.py's solver setting; the quoted
table goes to docs/BENCHMARKS.md.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses
import numpy as np
import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
from rl_ode_physics_tpu.core.world import make_step_fn
from rl_ode_physics_tpu.models import scenes
from rl_ode_physics_tpu.ops import broadphase as bp
from rl_ode_physics_tpu.ops import narrowphase as nph
from rl_ode_physics_tpu.ops import integrator as integ
from rl_ode_physics_tpu.ops import solver as sol


def contact_rich_states(cfg, seeds=(42, 7, 123), settle_steps=25):
    """Bench-scene worlds stepped into resting-stack steady state, plus the
    early settling burst (step 5) where impacts are violent."""
    stepf = make_step_fn(cfg, substeps=8, donate=False)
    states = []
    for seed in seeds:
        w = scenes.bench_world(cfg, num_bodies=60, seed=seed)
        for i in range(settle_steps):
            w = stepf(w)
            if i in (4, settle_steps - 1):
                states.append(w)
    return states


def solve_err(state, contacts, cfg, ref_vel):
    out = sol.solve_jacobi(state, contacts, cfg)
    dv = jnp.concatenate([out.linvel - ref_vel[0], out.angvel - ref_vel[1]],
                         axis=-1)
    return float(jnp.max(jnp.abs(dv)))


def main():
    cfg = EngineConfig(solver=SolverKind.JACOBI, max_bodies=64,
                       max_pair_candidates=256, max_contacts=128,
                       max_contacts_per_pair=4,
                       enable_capsules=False, enable_planes=False)
    states = contact_rich_states(cfg)
    print(f"{len(states)} contact-rich states")

    # (omega, beta, iters); round-3 bench setting = (1.3, 0.9, 8).
    # CAUTION (round-3 lesson, docs/BENCHMARKS.md): this single-solve table
    # is necessary but NOT sufficient — settings that win here can blow up
    # in trajectory (omega 1.3 beta 0.95 @7: KE 1818 after 500 substeps).
    # Gate any change on the multi-seed end-to-end stability run too.
    cases = [(1.0, 0.0, it) for it in (10, 15, 20, 30, 40)] + [
        (om, b, it)
        for om in (1.0, 1.2, 1.3)
        for b in (0.45, 0.9, 0.95)
        for it in (7, 8, 10, 15)
    ]

    rows = {}
    for state in states:
        cand = bp.broadphase(state, cfg)
        contacts = nph.narrowphase(state, cand, cfg)
        s2 = integ.apply_external_forces(state, cfg)

        ref_cfg = dataclasses.replace(cfg, solver_iterations=400)
        ref = sol.solve_jacobi(s2, contacts, ref_cfg)
        ref_vel = (ref.linvel, ref.angvel)

        for omega, beta, iters in cases:
            c2 = dataclasses.replace(cfg, jacobi_omega=omega,
                                     jacobi_beta=beta,
                                     solver_iterations=iters)
            err = solve_err(s2, contacts, c2, ref_vel)
            rows.setdefault((omega, beta, iters), []).append(err)

    print(f"{'omega':>6} {'beta':>5} {'iters':>5}  {'max err':>10}  "
          f"{'mean err':>10}   (velocity vs 400-iteration solve)")
    for (omega, beta, iters), errs in sorted(rows.items(),
                                             key=lambda kv: max(kv[1])):
        print(f"{omega:6.2f} {beta:5.2f} {iters:5d}  {max(errs):10.2e}  "
              f"{np.mean(errs):10.2e}")


if __name__ == "__main__":
    main()
