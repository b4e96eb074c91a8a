"""Profiling and observability harness (SURVEY.md §5 tracing plan).

The reference's only instrumentation is raylib ``TraceLog`` lines and an
FPS counter (``src/main.c:61,137,593``). Here:

* ``phase_timings`` — wall-clock per pipeline phase (broadphase /
  narrowphase / forces / solve / integrate), each jitted separately and
  hard-synced (device fetch, not just ``block_until_ready`` — transport
  layers may report dispatch completion early).
* ``trace`` — context manager around ``jax.profiler`` for TensorBoard-grade
  device traces.
* ``MetricsLog`` — host-side ring of the per-tick counters emitted by
  ``core.world.step_with_diagnostics`` (contacts, overflows, max
  penetration, kinetic energy).
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Dict, Optional

import numpy as np
import jax


def _hard_sync(tree) -> None:
    leaf = jax.tree_util.tree_leaves(tree)[0]
    _ = np.asarray(leaf.ravel()[0] if leaf.ndim else leaf)


def phase_timings(state, config, reps: int = 5) -> Dict[str, float]:
    """Per-phase milliseconds for one (possibly batched) world state."""
    from rl_ode_physics_tpu.ops import broadphase as bp
    from rl_ode_physics_tpu.ops import narrowphase as nph
    from rl_ode_physics_tpu.ops import solver as sol
    from rl_ode_physics_tpu.ops import integrator as integ

    batched = state.pos.ndim == 3

    def wrap(fn):
        return jax.jit(jax.vmap(fn) if batched else fn)

    f_bp = wrap(lambda s: bp.broadphase(s, config))
    f_np = wrap(lambda s, c: nph.narrowphase(s, c, config))
    f_fo = wrap(lambda s: integ.apply_external_forces(s, config))
    f_sv = wrap(lambda s, c: sol.solve(s, c, config))
    f_ig = wrap(lambda s: integ.integrate_positions(s, config))

    out: Dict[str, float] = {}

    def timeit(name, f, *args):
        r = f(*args)
        _hard_sync(r)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = f(*args)
        _hard_sync(r)
        out[name] = (time.perf_counter() - t0) / reps * 1000.0
        return r

    cand = timeit("broadphase_ms", f_bp, state)
    cont = timeit("narrowphase_ms", f_np, state, cand)
    s2 = timeit("forces_ms", f_fo, state)
    s3 = timeit("solve_ms", f_sv, s2, cont)
    timeit("integrate_ms", f_ig, s3)
    out["total_ms"] = sum(v for k, v in out.items() if k.endswith("_ms"))
    return out


@contextlib.contextmanager
def trace(logdir: str = "/tmp/rl_ode_physics_tpu_trace"):
    """jax.profiler device trace (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class MetricsLog:
    """Ring buffer of per-tick diagnostics dicts (host-side)."""

    def __init__(self, capacity: int = 4096):
        self.rows = deque(maxlen=capacity)

    def append(self, tick: int, metrics: dict) -> None:
        row = {"tick": int(tick)}
        for k, v in metrics.items():
            row[k] = float(np.asarray(v))
        self.rows.append(row)

    def last(self) -> Optional[dict]:
        return self.rows[-1] if self.rows else None

    def summary(self) -> dict:
        if not self.rows:
            return {}
        keys = [k for k in self.rows[0] if k != "tick"]
        return {
            k: {
                "mean": float(np.mean([r[k] for r in self.rows])),
                "max": float(np.max([r[k] for r in self.rows])),
            }
            for k in keys
        }
