"""Capacity-honesty audit: measured live-contact peaks vs the bench caps.

The bench's buffer capacities are HONESTY-SENSITIVE knobs: every
per-contact cost scales with them, so they must be sized to measured
peaks with documented headroom, never tuned below what the workload can
produce (overflow silently drops contacts — the loud counters exist, but
the driver bench must never rely on them firing).

    python benchmarks/capacity_audit.py

Runs the exact bench scene at BOTH solver settings the bench reports
(tuned hb-8 headline and the plain-20 ODE-parity line) across 4 seeds x
500 substeps, printing per-seed live-contact peaks, PER-BUCKET candidate
pair peaks, and cumulative overflow. Round-3 measurements (the numbers
behind bench.py's capacity comments):

    plain-20: peak contacts 87-89, bucket pairs ss 75 / sb 72 / bb 31
              -> parity config max_contacts = 128
    hb-8    : peak contacts 49-56, bucket pairs ss 75 / sb 89 / bb 34
              -> headline max_contacts = 64 (round 4: 2C = 128 exact lane
                 tile measured +21%; 14% headroom over the worst seed peak),
                 bucket_caps ss 96 / sb 96 / bb 48 (M = 384 = 3x128)

(overflow 0 on every audited seed). The hb settings settle stacks
tighter (fewer live contacts) but into MORE sphere-box candidate pairs
than plain-20, leaving the sb cap only 8% of headroom — a rebalanced
(96, 112, 44) layout with uniform 26% headroom measured 6% slower at the
same M, so the thin-but-audited margin ships, guarded by the loud
overflow counter. Re-run this audit whenever the shipped solver setting
or the scene changes.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
from rl_ode_physics_tpu.core.world import step_with_diagnostics
from rl_ode_physics_tpu.models import scenes


def _bucket_counts(state):
    """Per-type eligible-pair counts (ss, sb, bb) for one state."""
    import jax.numpy as jnp
    from rl_ode_physics_tpu.ops.narrowphase import _pair_eligibility
    hit, tmin, tmax = _pair_eligibility(state)
    return jnp.stack([jnp.sum(hit & (tmin == t1) & (tmax == t2))
                      for (t1, t2) in ((1, 1), (1, 2), (2, 2))])


def main(steps: int = 500,
         seeds=(42, 7, 123, 999, 5, 17, 314, 2718)):
    import jax.numpy as jnp  # noqa: F401 (jit below)

    bcounts = jax.jit(_bucket_counts)
    for label, iters, om, beta, cap in (
            ("parity plain-20", 20, 1.0, 0.0, 128),
            ("headline hb-8", 8, 1.3, 0.9, 64)):
        cfg = EngineConfig(
            solver=SolverKind.JACOBI, solver_iterations=iters,
            jacobi_omega=om, jacobi_beta=beta, max_bodies=64,
            max_pair_candidates=256, max_contacts=cap,
            max_contacts_per_pair=4, enable_capsules=False,
            enable_planes=False, selector_dtype="bfloat16",
            typed_buckets=True,
            bucket_caps=((1, 1, 96), (1, 2, 96), (2, 2, 48)))
        stepf = jax.jit(lambda s, _cfg=cfg: step_with_diagnostics(s, _cfg))
        for seed in seeds:
            w = scenes.bench_world(cfg, num_bodies=60, seed=seed)
            peak_c = 0
            peak_b = np.zeros(3, np.int64)
            for _ in range(steps):
                w, m = stepf(w)
                peak_c = max(peak_c, int(m["num_contacts"]))
                peak_b = np.maximum(peak_b, np.asarray(bcounts(w)))
            ovf = int(np.asarray(w.overflow))
            flag = "" if ovf == 0 else "  *** OVERFLOW ***"
            print(f"{label}: seed {seed}: peak contacts {peak_c}/{cap}, "
                  f"bucket pair peaks ss={peak_b[0]}/96 sb={peak_b[1]}/96 "
                  f"bb={peak_b[2]}/48, overflow {ovf}{flag}")
            assert ovf == 0, f"{label} seed {seed} dropped contacts"


if __name__ == "__main__":
    main()
