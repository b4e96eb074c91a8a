"""Direct LCP contact solver — the ``dWorldStep`` (Dantzig) conformance mode.

The reference steps its world with ``dWorldStep`` (``src/main.c:213``), whose
interior is ODE's Dantzig principal-pivoting solver: it computes the *exact*
solution of the contact LCP, unlike QuickStep's fixed-iteration SOR/PGS.
This module is the TPU-native equivalent (``SolverKind.DANTZIG``): a direct
mixed-LCP solve in impulse space over the same rows the iterative solvers
use.

Problem. With the reference's surface parameters (``src/main.c:684-687``:
``mu = dInfinity`` and no ``dContactApprox1``), ODE's contact joint emits
friction rows with *constant* force bounds ``±mu`` — infinite bounds, i.e.
pure bilateral rows — while normal rows are unilateral. The mixed LCP is

    w = A λ + b,   A = J M⁻¹ Jᵀ + (cfm/dt)·I   (symmetric positive definite)
    friction rows:  w = 0, λ free
    normal rows:    0 ≤ λ ⊥ w ≥ 0
    b = J v⁰ − target   (target: ERP bias / bounce rhs, ops/solver.py)

A is strictly PD (CFM regularization), so the solution is **unique** — any
exact method returns the same λ ODE's Dantzig pivoting does, up to roundoff.
We solve it by Murty-style principal block pivoting: maintain the active set
(friction rows of valid contacts always active; normal rows toggled), solve
the masked KKT system ``A_CC λ_C = −b_C`` with a dense ``linalg.solve``, and
flip normal rows that violate primal (w < 0) or dual (λ < 0) feasibility
until clean. Finite for P-matrices; iteration-capped for jit (the cap is
asserted loose by the unit tests). Everything is ``lax.while_loop`` +
fixed-shape masked linear solves → jit- and vmap-safe.

This is the conformance path (run in float64 under ``jax_enable_x64``), not
a throughput solver: A is dense (3C × 3C) and each pivot costs a full solve.
Use JACOBI for throughput (BASELINE config 4), DANTZIG/PGS for
trajectory-accuracy work.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import WorldState, world_inv_inertia
from rl_ode_physics_tpu.ops.narrowphase import Contacts
from rl_ode_physics_tpu.ops import solver as sol

# pivot-loop cap: Murty converges in <= #normal-rows flips for PD systems in
# exact arithmetic; 64 block rounds is far above anything observed (tests
# assert convergence, and the while_loop exits early once feasible).
MAX_PIVOT_ROUNDS = 64
_TOL = 1e-10


def _build_lcp(state: WorldState, contacts: Contacts, config: EngineConfig):
    """Dense J (R, N, 6), A (R, R), b (R,) for R = 3C rows ordered
    [normal block | t1 block | t2 block]."""
    f = state.linvel.dtype
    n = state.num_slots
    c = contacts.a.shape[0]

    rows = sol._row_data(state, contacts, config)
    r_a, r_b = rows["r_a"], rows["r_b"]
    axes = [rows["n"], rows["t1"], rows["t2"]]

    cols = jnp.arange(n, dtype=jnp.int32)
    oh_a = (contacts.a[:, None] == cols[None, :]).astype(f)   # (C, N)
    oh_b = (contacts.b[:, None] == cols[None, :]).astype(f)

    j_blocks = []
    for u in axes:
        ja = jnp.concatenate([u, jnp.cross(r_a, u)], axis=-1)  # (C, 6)
        jb = jnp.concatenate([u, jnp.cross(r_b, u)], axis=-1)
        j = (oh_b[:, :, None] * jb[:, None, :]
             - oh_a[:, :, None] * ja[:, None, :])              # (C, N, 6)
        j_blocks.append(j)
    j_full = jnp.concatenate(j_blocks, axis=0)                 # (R, N, 6)

    inv_i = world_inv_inertia(state)                           # (N, 3, 3)
    jw_lin = j_full[:, :, 0:3] * state.inv_mass[None, :, None]
    jw_ang = jnp.einsum("rnk,nkl->rnl", j_full[:, :, 3:6], inv_i)
    jw = jnp.concatenate([jw_lin, jw_ang], axis=-1)            # (R, N, 6)

    a_mat = jnp.einsum("rnk,snk->rs", jw, j_full)
    a_mat = a_mat + (config.cfm / config.dt) * jnp.eye(3 * c, dtype=f)

    vel6 = jnp.concatenate([state.linvel, state.angvel], axis=-1)  # (N, 6)
    jv0 = jnp.einsum("rnk,nk->r", j_full, vel6)
    target = jnp.concatenate(
        [rows["target"], jnp.zeros((2 * c,), f)])              # friction: 0
    b = jv0 - target

    valid = jnp.tile(contacts.valid, 3)
    is_normal = jnp.concatenate(
        [jnp.ones((c,), bool), jnp.zeros((2 * c,), bool)])
    return jw, a_mat, b, valid, is_normal


def _pivot_solve(a_mat, b, valid, is_normal, friction: bool):
    """Murty principal block pivoting on the normal rows. Returns λ (R,)."""
    r = b.shape[0]
    f = b.dtype
    eye = jnp.eye(r, dtype=f)

    if friction:
        always = valid & ~is_normal          # bilateral friction rows
    else:
        always = jnp.zeros_like(valid)
    toggled = valid & is_normal

    def masked_solve(act):
        m = jnp.where(act[:, None] & act[None, :], a_mat, eye)
        rhs = jnp.where(act, -b, 0.0)
        return jnp.linalg.solve(m, rhs)

    def cond(carry):
        act, _, done, i = carry
        return (~done) & (i < MAX_PIVOT_ROUNDS)

    def body(carry):
        act, _, _, i = carry
        lam = masked_solve(act)
        w = a_mat @ lam + b
        rm = act & toggled & (lam < -_TOL)
        add = (~act) & toggled & (w < -_TOL)
        new_act = (act & ~rm) | add | always
        done = ~jnp.any(new_act != act)
        return new_act, lam, done, i + 1

    act0 = always | (toggled & (b < 0.0))    # warm guess: violating normals in
    lam0 = jnp.zeros((r,), f)
    act, lam, done, _ = jax.lax.while_loop(
        cond, body, (act0, lam0, jnp.asarray(False), jnp.asarray(0)))
    # final consistent solve on the converged active set
    lam = masked_solve(act)
    # unilateral projection guard (inactive rows carry exactly zero)
    lam = jnp.where(valid, lam, 0.0)
    return jnp.where(toggled, jnp.maximum(lam, 0.0), lam)


def solve_dantzig(state: WorldState, contacts: Contacts,
                  config: EngineConfig) -> WorldState:
    """Exact contact solve (dWorldStep semantics, ``src/main.c:213``)."""
    if not math.isinf(config.mu) and config.friction:
        raise NotImplementedError(
            "DANTZIG mode implements the reference's mu=dInfinity surface "
            "(constant-limit friction rows become bilateral); finite-mu "
            "box bounds are a QuickStep-mode feature (SolverKind.PGS/JACOBI)."
        )
    jw, a_mat, b, valid, is_normal = _build_lcp(state, contacts, config)
    if not config.friction:
        # drop friction rows entirely: only the first C rows participate
        valid = valid & is_normal
    lam = _pivot_solve(a_mat, b, valid, is_normal, config.friction)

    dv6 = jnp.einsum("r,rnk->nk", lam, jw)                    # (N, 6)
    return state.replace(linvel=state.linvel + dv6[:, 0:3],
                         angvel=state.angvel + dv6[:, 3:6])


def lcp_residuals(state: WorldState, contacts: Contacts,
                  config: EngineConfig, solved: WorldState):
    """*Physical* (unregularized) constraint residuals of a solved velocity
    state: max |tangential velocity| on friction rows and max normal-target
    violation. Diagnostic only — with CFM softening the converged solution
    intentionally leaves a ``(cfm/h)·λ`` residual on active rows, so these
    are nonzero for every correct solver; tests compare solvers via the
    unique regularized solution instead (DANTZIG == the many-iteration
    limit of QuickStep, ``tests/test_lcp.py``).
    """
    rows = sol._row_data(state, contacts, config)
    axes = {"n": rows["n"], "t1": rows["t1"], "t2": rows["t2"]}
    a, b = contacts.a, contacts.b

    def rel(axis):
        va = solved.linvel[a] + jnp.cross(solved.angvel[a], rows["r_a"])
        vb = solved.linvel[b] + jnp.cross(solved.angvel[b], rows["r_b"])
        return jnp.sum((vb - va) * axis, -1)

    valid = contacts.valid
    w_n = rel(axes["n"]) - rows["target"]
    w_t = jnp.maximum(jnp.abs(rel(axes["t1"])), jnp.abs(rel(axes["t2"])))
    neg_w = jnp.where(valid, jnp.maximum(-w_n, 0.0), 0.0)     # pushing violation
    fric = jnp.where(valid, w_t, 0.0)
    return jnp.max(fric), jnp.max(neg_w)
