"""QuickStep-class solver μs/iteration tracker (BASELINE.md metric).

Measures the batched Jacobi solve at several iteration counts and reports
the marginal cost per solver iteration per world (the slope, which excludes
the once-per-step row/selector precompute).

    python benchmarks/solver_iter.py [num_worlds]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(num_worlds: int = 512):
    from rl_ode_physics_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import numpy as np
    from rl_ode_physics_tpu.core.config import EngineConfig
    from rl_ode_physics_tpu.models import scenes
    from rl_ode_physics_tpu.parallel.batch import replicate
    from rl_ode_physics_tpu.core.world import make_step_fn
    from rl_ode_physics_tpu.ops import broadphase as bp
    from rl_ode_physics_tpu.ops import narrowphase as nph
    from rl_ode_physics_tpu.ops import integrator as integ
    from rl_ode_physics_tpu.ops import solver as sol

    base = EngineConfig(max_bodies=64, max_pair_candidates=256,
                        max_contacts=256, max_contacts_per_pair=4)
    w = scenes.bench_world(base, num_bodies=60)
    stepf = make_step_fn(base, substeps=12, donate=False)
    for _ in range(15):          # contact-rich steady state
        w = stepf(w)
    batch = replicate(w, num_worlds)
    cand = jax.jit(jax.vmap(lambda s: bp.broadphase(s, base)))(batch)
    cont = jax.jit(jax.vmap(lambda s, c: nph.narrowphase(s, c, base)))(batch, cand)
    b2 = jax.jit(jax.vmap(lambda s: integ.apply_external_forces(s, base)))(batch)

    def sync(r):
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])

    times = {}
    for iters in (5, 10, 20, 40, 80):
        cfg = base.replace(solver_iterations=iters)
        f = jax.jit(jax.vmap(lambda s, c: sol.solve(s, c, cfg)))
        r = f(b2, cont)
        sync(r)
        samples = []
        for _ in range(5):          # median-of-5 batches beats tunnel noise
            t0 = time.perf_counter()
            for _ in range(10):
                r = f(b2, cont)
            sync(r)
            samples.append((time.perf_counter() - t0) / 10)
        times[iters] = float(np.median(samples))

    # slope via least squares over iteration counts
    ks = np.array(sorted(times))
    ts = np.array([times[k] for k in ks])
    slope = max(float(np.polyfit(ks, ts, 1)[0]), 0.0)  # seconds per iteration
    us_per_iter_world = slope / num_worlds * 1e6

    print(json.dumps({
        "metric": f"solver us/iter/world ({num_worlds} worlds, 256-contact buffers)",
        "value": us_per_iter_world,
        "unit": "us/iteration/world",
        "per_batch_ms": {int(k): times[k] * 1000 for k in ks},
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
