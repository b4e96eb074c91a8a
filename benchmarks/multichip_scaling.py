"""Multi-chip readiness: weak-scaling benchmark for stepping AND training.

VERDICT-r3 item 6: one command that runs TODAY on the virtual 8-device CPU
mesh and UNCHANGED on real hardware — the same invocation becomes the
day-one pod-slice number. Two workloads, both weak-scaled (work per device
held constant while the mesh grows):

1. **Stepping** (`make_sharded_step_fn`, GSPMD batch sharding over the
   world axis — SURVEY.md §2d: worlds are independent, DP over ICI is the
   whole parallelism story): per-device body-steps/sec at mesh sizes
   1, 2, 4, …, D. The compiled HLO is asserted to contain ZERO collective
   ops at every size (the design claim of ``parallel/mesh.py`` —
   ``tests/test_mesh.py`` checks 8 devices; this checks every size it
   runs), so per-device throughput should be flat up to compiler noise —
   any slope measured on real hardware is launch/dispatch overhead, not
   communication.
2. **ES training** (`examples/rl_training.py:make_trainer`, population
   worlds sharded over the mesh): per-device train-step time with the
   population scaled ∝ devices. Unlike stepping, the trainer DOES
   communicate (reward mean/std + gradient-estimate reductions that GSPMD
   inserts — two scalars and one (obs·act)-sized tensor per step); the
   reported "collective overhead" is the per-device slowdown of the
   D-device step vs the 1-device step at identical per-device work.

Usage (virtual mesh — the tests/conftest.py environment):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python benchmarks/multichip_scaling.py
On a real TPU slice, run it bare: it uses ``jax.devices()`` as found.

CPU-mesh numbers measure SPMD mechanics (partitioning, per-device
dispatch, reduction plumbing), not TPU silicon — treat the virtual-mesh
output as a correctness-shaped smoke curve, and the hardware rerun as the
real datum (docs/BENCHMARKS.md quotes both framings).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

_COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|all-to-all|collective-permute|"
    r"collective-broadcast|reduce-scatter|partition-id|replica-id)\b")


def main(worlds_per_device: int = 64, substeps: int = 16,
         pop_per_device: int = 4, horizon: int = 8):
    import jax
    # this image force-registers the experimental TPU platform; the env
    # var alone does not always win — pin it via config BEFORE any array op
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import numpy as np
    from rl_ode_physics_tpu.core.config import EngineConfig
    from rl_ode_physics_tpu.models import scenes
    from rl_ode_physics_tpu.parallel.batch import replicate
    from rl_ode_physics_tpu.parallel.mesh import (
        batch_sharding, make_mesh, make_sharded_step_fn)
    from examples.rl_training import make_trainer

    devices = jax.devices()
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devices)]
    print(f"# devices available: {len(devices)} ({devices[0].platform}); "
          f"mesh sizes: {sizes}", file=sys.stderr)

    # throughput-policy engine config at a bench-like small world
    config = EngineConfig.throughput(
        max_bodies=64, max_pair_candidates=256, max_contacts=64,
        enable_capsules=False, enable_planes=False,
        bucket_caps=((1, 1, 96), (1, 2, 96), (2, 2, 48)),
    )
    world = scenes.bench_world(config, num_bodies=60)
    num_dynamic = int(np.asarray((world.inv_mass > 0).sum()))

    def _sync(x):
        _ = np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    step_rows = []
    for d in sizes:
        mesh = make_mesh(devices[:d])
        batch = replicate(world, worlds_per_device * d)
        batch = jax.device_put(batch, batch_sharding(mesh))
        fn = make_sharded_step_fn(config, mesh, substeps=substeps,
                                  donate=False)
        hlo = fn.lower(batch).compile().as_text()
        hits = sorted(set(_COLLECTIVE_RE.findall(hlo)))
        assert not hits, f"collectives in the {d}-device step HLO: {hits}"
        out = fn(batch)
        _sync(out)                      # compile + settle
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = fn(out)
        _sync(out)
        dt = (time.perf_counter() - t0) / reps
        per_dev = worlds_per_device * num_dynamic * substeps / dt
        step_rows.append({"devices": d, "bodysteps_per_sec_per_device":
                          per_dev, "zero_collectives": True})
        print(f"# step  d={d}: {per_dev/1e6:.3f}M body-steps/s/device "
              f"(zero collectives asserted)", file=sys.stderr)

    train_rows = []
    t_single = None
    for d in sizes:
        mesh = make_mesh(devices[:d]) if d > 1 else None
        params, train = make_trainer(pop=pop_per_device * d,
                                     horizon=horizon, mesh=mesh)
        key = jax.random.PRNGKey(0)
        params, r = train(params, key)   # compile
        _sync(r)
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            params, r = train(params, jax.random.PRNGKey(i))
        _sync(r)
        dt = (time.perf_counter() - t0) / reps
        if d == 1:
            t_single = dt
        overhead = dt / t_single if t_single else float("nan")
        train_rows.append({"devices": d, "train_step_s": dt,
                           "per_device_slowdown_vs_1dev": overhead})
        print(f"# train d={d}: {dt*1e3:.1f} ms/step at {pop_per_device*d} "
              f"pop ({overhead:.2f}x the 1-device per-device time — "
              f"collective + partitioning overhead)", file=sys.stderr)

    print(json.dumps({
        "metric": "multichip weak scaling (per-device, worlds/device="
                  f"{worlds_per_device}, pop/device={pop_per_device})",
        "platform": devices[0].platform,
        "stepping": step_rows,
        "training": train_rows,
    }))


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:]])
