"""Name what dominates the banded SAP's loss at 512 slots (round 5).

Compiles the EXACT production chunk program (chunk worlds × substeps scan)
for the dense all-pairs and banded-SAP pair phases and compares XLA's own
cost analysis (flops / bytes accessed) plus an HLO op census (sort,
dynamic-slice/copy, compare counts). This is the measured evidence behind
docs/BENCHMARKS.md's round-5 SAP verdict — the gathers are gone from the
banded formulation, so the remaining deficit must show up as added
bytes/ops, not gather lowering.

    BENCH_BODIES=512 python benchmarks/sap_cost_analysis.py
"""

from __future__ import annotations

import collections
import json
import os
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def op_census(hlo_text: str):
    """Count HLO instructions by opcode (rough but lowering-faithful)."""
    counts = collections.Counter()
    for line in hlo_text.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.\-]+ = \S+ ([a-z\-]+)\(", line)
        if m:
            counts[m.group(1)] += 1
    return counts


def main():
    from rl_ode_physics_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import bench
    from rl_ode_physics_tpu.models import scenes
    from rl_ode_physics_tpu.parallel.batch import (replicate,
                                                   make_batched_step_fn)

    num_bodies = int(os.environ.get("BENCH_BODIES", 512))
    chunk = int(os.environ.get("BENCH_CHUNK", 16))
    substeps = int(os.environ.get("BENCH_SUBSTEPS", 24))
    sap_w = int(os.environ.get("BENCH_SAP_W", 160))

    results = {}
    for label, sap in (("dense", 0), ("sap", sap_w)):
        os.environ["BENCH_SAP"] = str(sap)
        cfg = bench.bench_config(num_bodies)
        world = scenes.bench_world(cfg, num_bodies=num_bodies - 4)
        step = make_batched_step_fn(cfg, substeps=substeps, donate=False,
                                    unroll=1, chunk=0)
        batch = replicate(world, chunk)
        compiled = jax.jit(step).lower(batch).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        hlo = compiled.as_text()
        census = op_census(hlo)
        results[label] = {
            "flops/substep": float(ca.get("flops", 0.0)) / substeps,
            "bytes/substep": float(ca.get("bytes accessed", 0.0)) / substeps,
            "hlo_instructions": sum(census.values()),
            "top_ops": census.most_common(12),
            "sort": census.get("sort", 0),
            "copy": census.get("copy", 0),
            "fusion": census.get("fusion", 0),
        }
        print(label, json.dumps(results[label], indent=1), flush=True)

    d, s = results["dense"], results["sap"]
    print(json.dumps({
        "bytes_ratio_sap_over_dense": s["bytes/substep"] / d["bytes/substep"],
        "flops_ratio": s["flops/substep"] / max(d["flops/substep"], 1.0),
        "instr_delta": s["hlo_instructions"] - d["hlo_instructions"],
        "sort_delta": s["sort"] - d["sort"],
        "copy_delta": s["copy"] - d["copy"],
    }, indent=1))


if __name__ == "__main__":
    main()
