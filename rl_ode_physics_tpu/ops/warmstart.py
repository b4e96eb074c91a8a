"""Opt-in persistent contacts / warm starting (BASELINE config 3 names
"persistent contacts").

The DEFAULT engine keeps ODE parity: contacts are per-step transients (the
reference empties its joint group every substep — ``dJointGroupEmpty``,
``/root/reference/src/main.c:214``) and the solver cold-starts. This module
adds the opt-in alternative: accumulated impulses are cached across steps,
keyed on the stable contact identity ``Contacts.key`` (pair_flat ·
K + manifold slot), and re-applied as the next step's initial guess.
Trimesh contact rows carry key −1 and are excluded from the cache: their
buffer position is a deepest-k *rank* that reorders between steps, not a
stable feature identity, so mesh contacts always cold-start.
Matching is a (C_new, C_old) one-hot key-equality matmul — no scatters, no
sorting, fully batched.

Effect (measured, ``benchmarks/warmstart_curve.py`` — table in
docs/CONFORMANCE.md): at a starved budget (2 iterations) warm start lands
~1.3–1.5× closer to the converged impulse field; at ≥5 iterations it is a
wash or a slight loss for both PGS and mass-splitting Jacobi on settled
scenes (the re-applied impulses sit on slightly moved geometry, and the
solvers correct that as fast as they correct a cold start). An honest
negative result: the reference's per-step transient contacts
(``dJointGroupEmpty``) are well-matched to this engine, so cold start
stays the default (parity + bitwise replay).

Usage::

    cache = warmstart.init_cache(config, dtype)
    step = warmstart.make_warm_step_fn(config)
    state, cache = step(state, cache)            # jit/vmap-safe
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
from rl_ode_physics_tpu.core.state import WorldState
from rl_ode_physics_tpu.ops.narrowphase import Contacts


@struct.dataclass
class WarmCache:
    """Per-world impulse cache from the previous step's solve."""

    key: jnp.ndarray   # (C,) int32 contact identities (−1 = empty row)
    lam: jnp.ndarray   # (C, 3) accumulated (normal, t1, t2) impulses


def init_cache(config: EngineConfig, dtype=jnp.float32) -> WarmCache:
    c = config.max_contacts
    return WarmCache(
        key=jnp.full((c,), -1, jnp.int32),
        lam=jnp.zeros((c, 3), dtype),
    )


def match_lam(cache: WarmCache, contacts: Contacts) -> jnp.ndarray:
    """(C_new, 3) initial impulses: cached λ where the contact identity
    persists, zero for fresh contacts. One one-hot matmul, no gathers."""
    new_key = contacts.key
    hit = ((new_key[:, None] == cache.key[None, :])
           & (new_key[:, None] >= 0))                     # (Cn, Co)
    sel = hit.astype(cache.lam.dtype)
    return sel @ cache.lam


def make_warm_step_fn(config: EngineConfig, trimesh=None):
    """(state, cache) → (state, cache): one substep with warm starting.

    Same pipeline as ``core.world.step`` but the solver starts from the
    matched cached impulses and the cache is refreshed from the solve.
    PGS and JACOBI solvers supported (the warm-start hooks of
    ``ops/solver.py``).
    """
    from rl_ode_physics_tpu.ops import broadphase as bp
    from rl_ode_physics_tpu.ops import narrowphase as np_ops
    from rl_ode_physics_tpu.ops import integrator
    from rl_ode_physics_tpu.ops import solver as solver_ops

    if config.solver not in (SolverKind.PGS, SolverKind.JACOBI):
        raise ValueError("warm starting supports PGS and JACOBI solvers")
    solve = (solver_ops.solve_pgs if config.solver is SolverKind.PGS
             else solver_ops.solve_jacobi)

    def step(state: WorldState, cache: WarmCache):
        import contextlib
        prec = (jax.default_matmul_precision(config.matmul_precision)
                if config.matmul_precision != "default"
                else contextlib.nullcontext())
        with prec:
            cand = bp.broadphase(state, config)
            extra = None
            if trimesh is not None:
                from rl_ode_physics_tpu.ops.trimesh import mesh_narrowphase
                extra = mesh_narrowphase(state, trimesh, config)
            contacts = np_ops.narrowphase(state, cand, config, extra)
            state = integrator.apply_external_forces(state, config)
            lam0 = match_lam(cache, contacts)
            state, lam = solve(state, contacts, config,
                               lam0=lam0, return_lam=True)
            state = integrator.integrate_positions(state, config)
        new_cache = WarmCache(key=contacts.key, lam=lam)
        return state, new_cache

    return step
