"""Throughput benchmark: body-steps/sec on the BASELINE config 4 workload.

Workload (BASELINE.md): 8192 vmapped worlds × 64 bodies each (the grassPlane
arena + 60 dynamic stacked bodies per world), fixed contact buffers, 120 Hz
substeps batched per launch. Prints ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": "body-steps/sec", "vs_baseline": N}
vs_baseline is value / 50e6 (the ≥50M body-steps/sec target; the reference
publishes no numbers of its own — BASELINE.md).

DUAL REPORT (round-3 VERDICT item 7): after the tuned headline run, the
same workload re-runs at the ODE-parity solver setting (plain Jacobi
ω=1.0, β=0, 20 iterations — QuickStep's default budget) and that number is
printed to stderr as a second labeled JSON line, so cross-round and
cross-engine comparisons never depend on the hb-10 convergence argument
(benchmarks/solver_convergence.py). Disable with BENCH_PARITY=0.

Env overrides: BENCH_WORLDS, BENCH_BODIES, BENCH_STEPS, BENCH_SUBSTEPS,
BENCH_CHUNK, BENCH_SOLVER, BENCH_ITERS, BENCH_OMEGA, BENCH_BETA,
BENCH_MM_DTYPE, BENCH_SEL_DTYPE, BENCH_TYPED, BENCH_UNROLL, BENCH_PARITY,
BENCH_CM.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def _measure(config, num_worlds, num_bodies, substeps, launches, chunk,
             unroll):
    """Run the workload under ``config``; return (value, dt, num_dynamic)."""
    import numpy as np
    from rl_ode_physics_tpu.models import scenes
    from rl_ode_physics_tpu.parallel.batch import replicate, \
        make_batched_step_fn

    world = scenes.bench_world(config, num_bodies=num_bodies - 4)
    batch = replicate(world, num_worlds)
    batch = jax.device_put(batch)

    step_fn = make_batched_step_fn(config, substeps=substeps, donate=True,
                                   chunk=chunk, unroll=unroll)

    # warmup: compile + let stacks reach contact-rich steady state
    for _ in range(3):
        batch = step_fn(batch)
    jax.block_until_ready(batch.pos)

    _ = np.asarray(batch.pos[0, 0])   # hard sync through the transport layer
    t0 = time.perf_counter()
    for _ in range(launches):
        batch = step_fn(batch)
    jax.block_until_ready(batch.pos)
    _ = np.asarray(batch.pos[0, 0])   # force completion, not just dispatch
    dt = time.perf_counter() - t0

    total_steps = launches * substeps
    # honesty: count only DYNAMIC bodies (the 4 static arena geoms are not
    # integrated/solved as bodies — 60 of the 64 slots are dynamic)
    num_dynamic = int(np.asarray((world.inv_mass > 0).sum()))
    # capacity honesty: max_contacts/bucket_caps are sized to measured
    # peaks — a config override (e.g. BENCH_ITERS without BENCH_CONTACTS)
    # that overflows them would silently benchmark a physically wrong
    # workload. WorldState.overflow accumulates every dropped row; fail.
    total_overflow = int(np.asarray(batch.overflow).sum())
    if total_overflow:
        raise RuntimeError(
            f"contact capacity overflow during the bench: {total_overflow} "
            f"dropped rows across {num_worlds} worlds — max_contacts/"
            f"bucket_caps are under-sized for this solver setting; re-run "
            f"benchmarks/capacity_audit.py and raise BENCH_CONTACTS")
    return num_worlds * num_dynamic * total_steps / dt, dt, num_dynamic


def _result(config, value, dt, num_worlds, num_bodies, num_dynamic,
            total_steps, note=""):
    return {
        "metric": f"body-steps/sec ({num_worlds} worlds x {num_dynamic} "
                  f"dynamic bodies (of {num_bodies} slots), "
                  f"{total_steps} substeps in {dt:.3f}s, "
                  f"{config.solver_iterations} solver iters "
                  f"(omega={config.jacobi_omega}, hb beta={config.jacobi_beta}"
                  f"{note}), solver={config.solver.value}, "
                  f"xla matmul precision={config.matmul_precision})",
        "value": value,
        "unit": "body-steps/sec",
        "vs_baseline": value / 50e6,
    }


def _bucket_caps(num_bodies: int):
    """Typed-bucket pair caps for the bench shapes (audited peaks in the
    config comment below; BENCH_CAPS='ss,sb,bb' overrides)."""
    env = os.environ.get("BENCH_CAPS")
    if env:
        ss, sb, bb = (int(x) for x in env.split(","))
    elif num_bodies <= 64:
        ss, sb, bb = 96, 96, 48
    elif num_bodies == 512:
        # deep-settle peaks (700 substeps x 3 seeds, /tmp probe recorded
        # in docs/BENCHMARKS.md): ss<=411, sb<=619, bb<=785 — the 512
        # piles keep densifying far past the 64-slot scene's settling
        # horizon, so caps cover the FULL default bench schedule (576
        # substeps) with headroom; M = 512+768+4*896 = 4864 = 38*128
        ss, sb, bb = 512, 768, 896
    else:
        ss = sb = 2 * num_bodies
        bb = num_bodies
    return ((1, 1, ss), (1, 2, sb), (2, 2, bb))


def bench_config(num_bodies: int, parity: bool = False):
    """The exact config bench runs for this shape (env overrides apply).

    Shared with ``benchmarks/capacity_audit.py`` — the audit signs off
    the capacity signature of THIS resolved config, and ``main`` refuses
    non-default shapes whose signature has no sign-off (round-5 VERDICT
    item 7). ``parity=True`` returns the ODE-parity plain-20 variant.
    """
    from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind

    solver = SolverKind[os.environ.get("BENCH_SOLVER", "jacobi").upper()]

    # base: the SHIPPED throughput policy (EngineConfig.throughput — the
    # single source of truth for solver/numerics; the conformance suite
    # measures trajectory error of THIS setting) + bench capacities and
    # env overrides
    config = EngineConfig.throughput(
        solver=solver,
        # heavy-ball-accelerated Jacobi at 8 sweeps (omega=1.3, beta=0.9):
        # measured strictly MORE converged than plain Jacobi at ODE's
        # default 20 on the bench workload (velocity error vs a
        # 400-iteration solve: 1.15 vs 1.58 max) AND end-to-end stable
        # across seeds {42,7,123}: late-steady penetration <=0.023 vs
        # plain-20's 0.034, resting heights identical, no KE inflation
        # (benchmarks/solver_convergence.py + the round-3 stability sweep
        # in docs/BENCHMARKS.md; more aggressive settings that win the
        # single-solve table — e.g. omega 1.3 beta 0.95 @7 — BLOW UP in
        # trajectory, so both gates are required). Plain omega=1/beta=0
        # @ 20 iters stays the engine-wide ODE-parity default and is
        # re-measured every round as the parity line below.
        solver_iterations=int(os.environ.get("BENCH_ITERS", 8)),
        jacobi_omega=float(os.environ.get("BENCH_OMEGA", 1.3)),
        jacobi_beta=float(os.environ.get("BENCH_BETA", 0.9)),
        solver_loop_unroll=int(os.environ.get("BENCH_SOLVER_UNROLL", 1)),
        friction=os.environ.get("BENCH_FRICTION", "1") != "0",
        max_bodies=num_bodies,
        max_pair_candidates=4 * num_bodies,
        # capacity sized to the MEASURED contact peak of THIS solver
        # setting (benchmarks/capacity_audit.py): hb-8 settles stacks
        # tighter than plain-20, so its live-contact peak is 49-56 across
        # seeds {42,7,123,999} x 500 substeps (vs 87-89 for plain-20 —
        # the parity config below keeps 2N=128 for the same reason, 44%
        # headroom). C=64 puts 2C=128 on an EXACT lane tile: every
        # (2C, 8) solver plane and (2C, 16) half-operator lands on whole
        # (8, 128) tiles, measured +21% end-to-end over C=80 (C=72, not
        # tile-aligned, measured NEUTRAL — it is the alignment, not the
        # 20% less work). Headroom over the worst audited seed peak (58,
        # 8 seeds x 500 substeps) is 10% — audited-thin ships (same
        # policy as the sb bucket cap),
        # and overflow is LOUD: WorldState.overflow accumulates dropped
        # rows, the audit asserts 0 on every seed, and _measure raises.
        max_contacts=int(os.environ.get(
            "BENCH_CONTACTS",
            # 512-slot deep-settle contact peak is 658 (same probe) ->
            # 768 = 6 lane tiles, 17% headroom
            64 if num_bodies == 64
            else 768 if num_bodies == 512 else 2 * num_bodies)),
        # K=4 with deterministic fold-merge manifolds (no per-pair top-k)
        # halves the contact-compaction sort width; stacking verified stable
        max_contacts_per_pair=4,
        # the workload is spheres+boxes (the reference's body types,
        # inc/body.h:14-18): prune unused pair kernels from the program
        enable_capsules=False,
        enable_planes=False,
        solver_matmul_dtype=os.environ.get("BENCH_MM_DTYPE", "float32"),
        # bf16 narrowphase/compaction selectors: numerically identical to
        # f32 at TPU default matmul precision (the MXU rounds f32 operands
        # to bf16 per pass anyway) at half the one-hot HBM bytes
        # (bf16 selectors carry body slot ids, exact only to 256 — the
        # 512-slot run must use f32; EngineConfig.validate enforces it)
        selector_dtype=os.environ.get(
            "BENCH_SEL_DTYPE", "bfloat16" if num_bodies <= 256
            else "float32"),
        # typed-bucket narrowphase: each pair type runs ONLY its kernel
        # at its intrinsic manifold size. Measured per-bucket pair peaks
        # at the shipped hb-8 setting (8 seeds x 500 substeps,
        # benchmarks/capacity_audit.py): ss 75/96, sb 89/96, bb 34/48 —
        # sb headroom is 8% (hb-8 settles into more sphere-box pairs than
        # plain-20's 72), verified ZERO overflow on every audited seed;
        # the loud overflow counter guards production. A rebalanced
        # (96, 112, 44) layout with uniform 26% headroom measured 6%
        # SLOWER at the same M=384, so the thin-but-audited margin ships.
        typed_buckets=os.environ.get("BENCH_TYPED", "1") != "0",
        # KEEP the flattened manifold width M = ss + sb + 4*bb a multiple
        # of 128 lanes: a misaligned M (352) measured 3.5% SLOWER despite
        # less work - lane padding of the (*, M) compaction arrays eats
        # the savings. 64-slot default M = 96+96+4*48 = 384; the 512-slot
        # (reference MAX_BODIES, inc/body.h:6) caps are sized to measured
        # peaks at that shape (3 seeds x 400 substeps: ss<=416, sb<=512,
        # bb<=704 pairs) -> (512, 640, 768), M = 4224 = 33*128.
        # BENCH_CAPS="ss,sb,bb" overrides.
        bucket_caps=_bucket_caps(num_bodies),
        pallas_compaction=os.environ.get("BENCH_PALLAS_COMPACT", "0") != "0",
        # round-4 component-major narrowphase (pairs-in-lanes); BENCH_CM=0
        # re-measures the row-major layout (the A/B lever)
        cm_narrowphase=os.environ.get("BENCH_CM", "1") != "0",
        # round-4 component-major solver loop A/B (config.solver_cm)
        solver_cm=os.environ.get("BENCH_SOLVER_CM", "0") != "0",
        # round-4 windowed sweep-and-prune pair phase (config.sap_window;
        # answers SURVEY §7's all-pairs question at the 512-slot
        # reference capacity — loud window-miss counter, docs/BENCHMARKS)
        sap_window=int(os.environ.get("BENCH_SAP", 0)),
    )
    if parity:
        # ODE QuickStep parity setting: plain Jacobi omega=1, beta=0, 20
        # iterations; plain-20 peaks at 87-89 live contacts at 64 slots
        # (44% headroom at 2N=128; 80 would drop)
        config = config.replace(
            solver_iterations=20, jacobi_omega=1.0, jacobi_beta=0.0,
            max_contacts=2 * num_bodies)
    return config


def require_audit(config, num_bodies: int, total_substeps: int):
    """Refuse unaudited capacity configurations at non-default shapes.

    The round-4 incident: a 512-slot run with under-sized caps produced
    a bogus 5.4M headline, caught only when the schedule deepened and
    the overflow counter fired. Contact/pair peaks DEEPEN with schedule
    (piles densify), so a valid sign-off must (a) exist for this exact
    capacity signature and (b) have audited at least as many substeps as
    the bench is about to run. BENCH_ALLOW_UNAUDITED=1 bypasses for
    exploratory sweeps — the overflow counter still hard-fails on drops.

    This applies to the DEFAULT shape too: the round-5 on-chip audit
    found the 64-slot hb-8 bb bucket cap (48) exceeded (peak 53, 21
    dropped rows) by substep ~700 on seed 123 — PAST the bench's own
    576-substep schedule, so the 64-slot sign-off is recorded at a
    600-substep horizon and deeper schedules refuse until re-audited.
    """
    if os.environ.get("BENCH_ALLOW_UNAUDITED") == "1":
        print("# WARNING: BENCH_ALLOW_UNAUDITED=1 — capacity signature "
              "not checked; overflow counter is the only guard",
              file=sys.stderr)
        return
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "benchmarks"))
    from capacity_audit import capacity_signature, load_registry
    sig = capacity_signature(config, num_bodies)
    entry = load_registry().get(sig)
    if entry is None:
        raise RuntimeError(
            f"UNAUDITED capacity configuration: no sign-off for\n  {sig}\n"
            f"in benchmarks/audited_capacities.json. Run\n  python "
            f"benchmarks/capacity_audit.py --bodies {num_bodies} "
            f"--steps {max(total_substeps, 500)} --sign\n(or set "
            f"BENCH_ALLOW_UNAUDITED=1 for an exploratory sweep).")
    if entry["steps"] < total_substeps:
        raise RuntimeError(
            f"audit horizon too shallow for this schedule: signed off at "
            f"{entry['steps']} substeps, bench runs {total_substeps} "
            f"(peaks deepen as piles densify). Re-run capacity_audit.py "
            f"--bodies {num_bodies} --steps {total_substeps} --sign.")


def main():
    from rl_ode_physics_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    from rl_ode_physics_tpu.core.config import SolverKind

    num_worlds = int(os.environ.get("BENCH_WORLDS", 8192))
    num_bodies = int(os.environ.get("BENCH_BODIES", 64))
    # 96 substeps per launch (0.8 s of 120 Hz sim per device launch, 3
    # timed launches): the round-4 sweep at C=64 measured 55.6M @8,
    # 57.3M @16, 59.7M @32, 60.8M @96, 61.0M @192 substeps/launch —
    # deeper in-launch scans amortize dispatch; cost is shape-bound
    # (fixed buffers), so settling depth cannot make the work cheaper.
    substeps = int(os.environ.get("BENCH_SUBSTEPS", 96))
    launches = int(os.environ.get("BENCH_STEPS", 3))
    # chunk=256 measured optimal with the round-4 component-major
    # narrowphase (45.5M vs 44.4M @128, 42.6M @512, 30.1M @64 — the CM
    # layout shrank the per-chunk working set, moving the optimum up from
    # the round-3 chunk 128; sweep in docs/BENCHMARKS.md)
    chunk = int(os.environ.get("BENCH_CHUNK", 256))
    unroll = int(os.environ.get("BENCH_UNROLL", 4))
    if num_worlds <= chunk or num_worlds % chunk:
        chunk = 0

    config = bench_config(num_bodies)
    solver = config.solver

    # BENCH_ONLY=parity: measure ONLY the ODE-parity line (for parity
    # tuning sweeps — the headline run would double every experiment's
    # chip time). The parity JSON goes to stdout in this mode.
    if os.environ.get("BENCH_ONLY") == "parity":
        parity_cfg = bench_config(num_bodies, parity=True)
        require_audit(parity_cfg, num_bodies, (launches + 3) * substeps)
        p_value, p_dt, num_dynamic = _measure(
            parity_cfg, num_worlds, num_bodies, substeps, launches, chunk,
            unroll)
        print(json.dumps(_result(
            parity_cfg, p_value, p_dt, num_worlds, num_bodies, num_dynamic,
            launches * substeps, note="; ODE QuickStep parity setting")))
        return

    # warmup (3 launches) + timed launches all count toward the audited
    # horizon — peaks deepen monotonically with settling depth
    require_audit(config, num_bodies, (launches + 3) * substeps)

    value, dt, num_dynamic = _measure(
        config, num_worlds, num_bodies, substeps, launches, chunk, unroll)
    total_steps = launches * substeps

    # FLOP accounting for cross-round/roofline comparability (stderr; the
    # driver parses the single stdout JSON line). Dominant cost: the solver's
    # two (2C, N)x(N, 8) selector matmuls per iteration per world.
    c_rows = config.max_contacts
    n = config.max_bodies
    it = config.solver_iterations
    solver_flops = 2 * (2 * c_rows) * n * 8 * 2 * it   # per world per substep
    total_solver_tflops = solver_flops * num_worlds * total_steps / dt / 1e12
    print(f"# aux: {num_dynamic} dynamic bodies/world; solver selector-matmul "
          f"throughput ~{total_solver_tflops:.2f} TFLOP/s sustained "
          f"({solver_flops/1e6:.2f} MFLOP/world/substep at C={c_rows}, N={n}, "
          f"{it} iters); slot-steps/sec (all {num_bodies} slots) = "
          f"{num_worlds * num_bodies * total_steps / dt:.3g}", file=sys.stderr)

    headline = _result(
        config, value, dt, num_worlds, num_bodies, num_dynamic, total_steps,
        note="; >= plain-20-iter convergence, see "
             "benchmarks/solver_convergence.py")

    # ODE-parity dual report: plain Jacobi omega=1, beta=0, 20 iterations
    # (QuickStep's default budget) on the SAME workload — stderr, labeled.
    if (os.environ.get("BENCH_PARITY", "1") != "0"
            and solver is SolverKind.JACOBI):
        parity_cfg = bench_config(num_bodies, parity=True)
        require_audit(parity_cfg, num_bodies, (launches + 3) * substeps)
        p_value, p_dt, _ = _measure(parity_cfg, num_worlds, num_bodies,
                                    substeps, launches, chunk, unroll)
        p = _result(parity_cfg, p_value, p_dt, num_worlds, num_bodies,
                    num_dynamic, total_steps, note="; ODE QuickStep parity "
                    "setting")
        print("# parity: " + json.dumps(p), file=sys.stderr)

    print(json.dumps(headline))


if __name__ == "__main__":
    main()
