"""Roofline model for the bench substep: where is the ceiling, per config?

Round-5 VERDICT item 2: the perf story needs a model-implied ceiling for
BOTH bench configurations (tuned hb-8 headline and the plain-20
ODE-parity line), stating which resource binds:

* **HBM bytes** — XLA's own cost analysis of the compiled chunk program
  (`compiled.cost_analysis()['bytes accessed']`), divided by the probed
  sustained HBM bandwidth (`benchmarks/device_probe.py`).
* **MXU flops** — same source, divided by the probed matmul rate.
* **Op/kernel floor** — measured EMPIRICALLY, not modeled: the identical
  program launched at a tiny world count (8) has negligible bytes/flops,
  so its per-substep time IS the fixed per-kernel overhead of the
  program structure (on-device kernel launch + loop machinery).

Every timing here is a **two-depth slope**: the program is compiled at
S and 2·S substeps per launch and the per-substep time is
(t(2S) − t(S)) / S. A single-launch measurement on this tunneled backend
is contaminated by the ~30 ms host round-trip (device_probe measured it;
a first roofline attempt without the slope produced a "ceiling" BELOW
the production bench's measured rate, which is impossible) — the slope
cancels every per-launch cost, leaving pure on-device per-substep time.

Model: the production launch runs `chunks` sequential chunk programs per
substep, so

    t_substep >= floor_substep + max(bytes/BW, flops/MXU)
    ceiling   = worlds × dynamic / (t_substep × chunks)

(The floor ADDS to the streaming time to first order: the tiny-batch
probe shows the fixed cost is serial prologue/epilogue per fusion, not
overlapped with the streaming of other fusions.)

    python benchmarks/roofline.py            # both configs, chunk 256
    BENCH_BW_GBS=..., BENCH_MXU_TFLOPS=...   # override probe constants

Numbers land in docs/BENCHMARKS.md §Roofline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _sync(out):
    """On the tunneled axon platform block_until_ready does not wait;
    pull one scalar through the transfer layer instead."""
    import numpy as np
    leaf = out.pos
    np.asarray(leaf[(0,) * leaf.ndim])


def _timed(fn, b, reps=3):
    out = fn(b)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(b)
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def _slope_per_substep(config, batch, substeps):
    """On-device seconds per substep via the two-depth slope
    (t(2S) − t(S)) / S — cancels the per-launch host round-trip."""
    from rl_ode_physics_tpu.parallel.batch import make_batched_step_fn
    t = {}
    for s in (substeps, 2 * substeps):
        step = make_batched_step_fn(config, substeps=s, donate=False,
                                    unroll=4, chunk=0)
        t[s] = _timed(step, batch)
    return (t[2 * substeps] - t[substeps]) / substeps, t[substeps]


def measure_config(label: str, config, num_bodies: int, chunk: int,
                   substeps: int, bw_gbs: float, mxu_tflops: float,
                   worlds: int):
    import jax
    from rl_ode_physics_tpu.models import scenes
    from rl_ode_physics_tpu.parallel.batch import (replicate,
                                                   make_batched_step_fn)

    world = scenes.bench_world(config, num_bodies=num_bodies - 4)

    # ---- cost analysis of the chunk program ----
    step = make_batched_step_fn(config, substeps=substeps, donate=False,
                                unroll=4, chunk=0)
    batch = replicate(world, chunk)
    compiled = jax.jit(step).lower(batch).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    bytes_sub = float(ca.get("bytes accessed", 0.0)) / substeps
    flops_sub = float(ca.get("flops", 0.0)) / substeps

    # ---- slope timings: chunk worlds and the 8-world op floor ----
    t_sub, t_launch = _slope_per_substep(config, batch, substeps)
    floor_sub, _ = _slope_per_substep(config, replicate(world, 8), substeps)

    t_bytes = bytes_sub / (bw_gbs * 1e9)
    t_flops = flops_sub / (mxu_tflops * 1e12)
    t_stream = max(t_bytes, t_flops)
    t_model = t_stream + floor_sub

    chunks = worlds // chunk
    dynamic = num_bodies - 4
    out = {
        "config": label,
        "chunk": chunk, "substeps": substeps,
        "bytes/substep/chunk": bytes_sub,
        "flops/substep/chunk": flops_sub,
        "t_bytes_ms": t_bytes * 1e3,
        "t_flops_ms": t_flops * 1e3,
        "t_floor_ms": floor_sub * 1e3,          # 8-world slope
        "t_model_ms": t_model * 1e3,
        "t_measured_ms": t_sub * 1e3,           # chunk-world slope
        "t_single_launch_ms": t_launch * 1e3,   # incl. host round-trip
        "bound": ("bytes" if t_bytes > t_flops else "flops")
                 if t_stream > floor_sub else "op-floor",
        "hbm_gbs_sustained": bytes_sub / t_sub / 1e9,
        "mxu_tflops_sustained": flops_sub / t_sub / 1e12,
        "ceiling_body_steps_per_sec": worlds * dynamic / (t_model * chunks),
        "implied_at_measured": worlds * dynamic / (t_sub * chunks),
        "measured_over_model": t_sub / t_model,
    }
    print(json.dumps(out, indent=1), flush=True)
    return out


def main():
    from rl_ode_physics_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import bench

    num_bodies = int(os.environ.get("BENCH_BODIES", 64))
    chunk = int(os.environ.get("BENCH_CHUNK", 256))
    substeps = int(os.environ.get("BENCH_SUBSTEPS", 96))
    worlds = int(os.environ.get("BENCH_WORLDS", 8192))
    # probed device rates (benchmarks/device_probe.py on this chip)
    bw = float(os.environ.get("BENCH_BW_GBS", 800.0))
    mxu = float(os.environ.get("BENCH_MXU_TFLOPS", 134.0))

    only = os.environ.get("BENCH_ONLY", "")
    for parity in (False, True):
        if only == "parity" and not parity:
            continue
        if only == "headline" and parity:
            continue
        cfg = bench.bench_config(num_bodies, parity=parity)
        measure_config("parity plain-20" if parity else "headline hb-8",
                       cfg, num_bodies, chunk, substeps, bw, mxu, worlds)


if __name__ == "__main__":
    main()
