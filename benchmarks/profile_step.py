"""Profile the substep: device trace → source-mapped hot-op table.

The tool behind round 1's optimization loop (docs/BENCHMARKS.md): captures a
jax.profiler trace of the batched substep, attributes the hottest XLA ops to
framework source lines via the compiled HLO metadata, and prints a table.

    python benchmarks/profile_step.py [num_worlds] [substeps]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(num_worlds: int = 2048, substeps: int = 8):
    import os

    from rl_ode_physics_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import numpy as np
    from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
    from rl_ode_physics_tpu.models import scenes
    from rl_ode_physics_tpu.parallel.batch import (
        replicate, make_batched_step_fn, batched_step,
    )

    solver = SolverKind[os.environ.get("BENCH_SOLVER", "jacobi").upper()]
    cfg = EngineConfig(max_bodies=64, max_pair_candidates=256,
                       max_contacts=int(os.environ.get("BENCH_CONTACTS", 128)),
                       max_contacts_per_pair=4,
                       solver=solver,
                       solver_iterations=int(os.environ.get("BENCH_ITERS", 10)),
                       jacobi_omega=float(os.environ.get("BENCH_OMEGA", 1.2)),
                       jacobi_beta=float(os.environ.get("BENCH_BETA", 0.9)),
                       typed_buckets=os.environ.get("BENCH_TYPED", "0") != "0",
                       selector_dtype=os.environ.get("BENCH_SEL_DTYPE",
                                                     "float32"),
                       bucket_caps=((1, 1, 96), (1, 2, 96), (2, 2, 48)),
                       cm_narrowphase=os.environ.get("BENCH_CM", "1") != "0",
                       enable_capsules=False, enable_planes=False)
    w = scenes.bench_world(cfg, num_bodies=60)
    batch = replicate(w, num_worlds)
    chunk = int(os.environ.get("BENCH_CHUNK", 0))
    f = make_batched_step_fn(cfg, substeps=substeps, donate=False, unroll=2,
                             chunk=chunk if num_worlds > chunk else 0)
    r = f(batch)
    _ = np.asarray(r.pos[0, 0])

    tracedir = tempfile.mkdtemp(prefix="rl_ode_trace_")
    jax.profiler.start_trace(tracedir)
    r = f(r)
    _ = np.asarray(r.pos[0, 0])
    jax.profiler.stop_trace()

    hlo = f.lower(batch).compile().as_text()

    path = glob.glob(f"{tracedir}/plugins/profile/*/*.trace.json.gz")[0]
    with gzip.open(path) as fgz:
        trace = json.load(fgz)
    durs = collections.Counter()
    counts = collections.Counter()
    for e in trace.get("traceEvents", []):
        if e.get("ph") == "X" and "dur" in e:
            name = e.get("name", "?")
            if (name.startswith("$") or "asarray" in name or "jit" in name
                    or "trace" in name or name.startswith("while")):
                continue
            durs[name] += e["dur"]
            counts[name] += 1

    total = sum(durs.values())
    print(f"device total: {total / substeps / 1e3:.2f} ms/substep "
          f"@{num_worlds} worlds")
    print(f"{'ms/substep':>10}  {'calls':>5}  {'op':<38} source")
    by_file = collections.Counter()
    srcs = {}
    for name in durs:
        m = re.search(
            rf'%{re.escape(name)} = \S+ [a-z-]+\(.*?source_file="([^"]*)" '
            rf'source_line=(\d+)', hlo)
        srcs[name] = (m.group(1).split("/")[-1] + ":" + m.group(2)) if m \
            else "?"
        by_file[srcs[name].split(":")[0]] += durs[name]
    for name, d in durs.most_common(60):
        print(f"{d / substeps / 1e3:10.3f}  {counts[name]:5d}  "
              f"{name[:38]:<38} {srcs[name]}")
    print("\nper-file totals (unattributed ops under '?'):")
    for fname, d in by_file.most_common():
        print(f"{d / substeps / 1e3:10.3f}  {fname}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2048,
         int(sys.argv[2]) if len(sys.argv) > 2 else 8)
