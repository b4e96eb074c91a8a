"""Capacity-honesty audit: measured live-contact peaks vs the bench caps.

The bench's buffer capacities are HONESTY-SENSITIVE knobs: every
per-contact cost scales with them, so they must be sized to measured
peaks with documented headroom, never tuned below what the workload can
produce (overflow silently drops contacts — the loud counters exist, but
the driver bench must never rely on them firing).

    python benchmarks/capacity_audit.py                     # 64-slot dual audit
    python benchmarks/capacity_audit.py --bodies 512 --steps 700 --sign
    python benchmarks/capacity_audit.py --platform tpu ...  # audit on-chip

Runs the exact bench scene at BOTH solver settings the bench reports
(tuned hb-8 headline and the plain-20 ODE-parity line) with the exact
capacities bench.py resolves for that shape (single source of truth:
``bench.resolve_capacities``), across seeds x steps, printing per-seed
live-contact peaks, PER-BUCKET candidate pair peaks, and cumulative
overflow.

``--sign`` (round-5 VERDICT item 7) records a clean audit into
``benchmarks/audited_capacities.json``, keyed by the capacity-relevant
configuration signature. ``bench.py`` REFUSES to run any
``BENCH_BODIES != 64`` shape whose signature has no sign-off, or whose
schedule runs deeper than the audited horizon — the round-4 under-sized
-caps incident (a bogus 5.4M caught only when the schedule deepened)
is the motivating failure. The 64-slot default stays inline-documented
(the numbers below) and is additionally signed off like any other shape.

Round-3 measurements (the numbers behind bench.py's capacity comments):

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

import argparse
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

REGISTRY = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "audited_capacities.json")


def capacity_signature(config, num_bodies: int) -> str:
    """The capacity-relevant configuration key. Everything that changes
    how many contacts/pairs the workload can produce OR how many the
    buffers can hold is in here; throughput-only knobs (chunk, substeps
    per launch, selector dtype, cm layout, sap_window — window misses
    are overflow-guarded) are not."""
    caps = ",".join(f"{a}{b}:{c}" for a, b, c in config.bucket_caps) \
        if config.typed_buckets else "classic"
    return (f"bodies={num_bodies}|solver={config.solver.value}"
            f"|iters={config.solver_iterations}"
            f"|omega={config.jacobi_omega}|beta={config.jacobi_beta}"
            f"|C={config.max_contacts}|K={config.max_contacts_per_pair}"
            f"|caps={caps}|friction={config.friction}")


def load_registry() -> dict:
    if os.path.exists(REGISTRY):
        with open(REGISTRY) as fh:
            return json.load(fh)
    return {}


def audit_config(config, num_bodies: int, steps: int, seeds, chunk: int = 50):
    """Run the bench scene under ``config``; return the measured peaks.

    Peak tracking is device-side (a lax.scan over ``chunk`` substeps
    carries running maxima), so the audit runs at full speed on either
    platform — the host loop only reduces across chunks.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rl_ode_physics_tpu.core.world import step_with_diagnostics
    from rl_ode_physics_tpu.models import scenes
    from rl_ode_physics_tpu.ops.narrowphase import _pair_eligibility

    def bucket_counts(state):
        hit, tmin, tmax = _pair_eligibility(state)
        return jnp.stack([jnp.sum(hit & (tmin == t1) & (tmax == t2))
                          for (t1, t2) in ((1, 1), (1, 2), (2, 2))])

    @jax.jit
    def run_chunk(w):
        def body(carry, _):
            w, pc, pb = carry
            w2, m = step_with_diagnostics(w, config)
            pc = jnp.maximum(pc, m["num_contacts"].astype(jnp.int32))
            pb = jnp.maximum(pb, bucket_counts(w2).astype(jnp.int32))
            return (w2, pc, pb), None
        (w, pc, pb), _ = jax.lax.scan(
            body, (w, jnp.int32(0), jnp.zeros(3, jnp.int32)),
            None, length=chunk)
        return w, pc, pb

    results = []
    for seed in seeds:
        w = scenes.bench_world(config, num_bodies=num_bodies - 4, seed=seed)
        peak_c, peak_b = 0, np.zeros(3, np.int64)
        for _ in range((steps + chunk - 1) // chunk):
            w, pc, pb = run_chunk(w)
            peak_c = max(peak_c, int(pc))
            peak_b = np.maximum(peak_b, np.asarray(pb))
        ovf = int(np.asarray(w.overflow))
        results.append((seed, peak_c, peak_b, ovf))
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--bodies", type=int, default=64)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--seeds", default="42,7,123,999,5,17,314,2718")
    ap.add_argument("--platform", default="cpu",
                    help="cpu (default: deterministic, exact-f32) or the "
                         "TPU backend name — audit under the platform the "
                         "bench runs when rounding changes trajectories")
    ap.add_argument("--sign", action="store_true",
                    help="record a clean audit into audited_capacities.json")
    args = ap.parse_args(argv)

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # resolve the EXACT configs bench.py runs for this shape (single
    # source of truth for capacities and solver settings)
    import bench
    seeds = tuple(int(s) for s in args.seeds.split(","))
    registry = load_registry()
    for parity in (False, True):
        config = bench.bench_config(args.bodies, parity=parity)
        label = "parity plain-20" if parity else "headline hb-8"
        sig = capacity_signature(config, args.bodies)
        caps = {f"{a}{b}": c for a, b, c in config.bucket_caps}
        print(f"== {label}: C={config.max_contacts} caps={caps} "
              f"({args.steps} steps x {len(seeds)} seeds, "
              f"platform={jax.default_backend()})")
        results = audit_config(config, args.bodies, args.steps, seeds)
        worst_c, worst_b = 0, [0, 0, 0]
        clean = True
        for seed, pc, pb, ovf in results:
            flag = "" if ovf == 0 else "  *** OVERFLOW ***"
            clean &= ovf == 0
            worst_c = max(worst_c, pc)
            worst_b = [max(a, int(b)) for a, b in zip(worst_b, pb)]
            print(f"{label}: seed {seed}: peak contacts "
                  f"{pc}/{config.max_contacts}, bucket pair peaks "
                  f"ss={pb[0]}/{caps['11']} sb={pb[1]}/{caps['12']} "
                  f"bb={pb[2]}/{caps['22']}, overflow {ovf}{flag}")
        assert clean, f"{label} dropped contacts — caps under-sized"
        if args.sign:
            registry[sig] = {
                "steps": args.steps, "seeds": list(seeds),
                "platform": jax.default_backend(),
                "peak_contacts": worst_c,
                "peak_pairs": {"ss": worst_b[0], "sb": worst_b[1],
                               "bb": worst_b[2]},
                "max_contacts": config.max_contacts, "caps": caps,
            }
            with open(REGISTRY, "w") as fh:
                json.dump(registry, fh, indent=1, sort_keys=True)
            print(f"signed off: {sig}")


if __name__ == "__main__":
    main()
