"""Direct LCP contact solver — the ``dWorldStep`` (Dantzig) conformance mode.

The reference steps its world with ``dWorldStep`` (``src/main.c:213``), whose
interior is ODE's Dantzig principal-pivoting solver: it computes the *exact*
solution of the contact LCP, unlike QuickStep's fixed-iteration SOR/PGS.
This module is the TPU-native equivalent (``SolverKind.DANTZIG``): a direct
mixed-LCP solve in impulse space over the same rows the iterative solvers
use.

Problem. ODE's contact joint emits one unilateral normal row and two
friction rows per contact; friction rows carry ``findex`` so their force
bounds are ``±mu·λ_n`` — coupled to the *solved* normal impulse of the same
contact (ODE's dSolveLCP bound-recomputation). The mixed boxed LCP is

    w = A λ + b,   A = J M⁻¹ Jᵀ + (cfm/dt)·I   (symmetric positive definite)
    normal rows:    0 ≤ λ ⊥ w ≥ 0
    friction rows:  λ ∈ [−mu·λ_n, +mu·λ_n] with
                    λ = lo ⟹ w ≥ 0,  λ = hi ⟹ w ≤ 0,  interior ⟹ w = 0
    b = J v⁰ − target   (target: ERP bias / bounce rhs, ops/solver.py)

With the reference's surface parameters (``src/main.c:684-687``:
``mu = dInfinity``, no ``dContactApprox1``) the friction bounds are
infinite — pure bilateral rows — and A's strict PD (CFM regularization)
makes the solution **unique**: any exact method returns the same λ ODE's
Dantzig pivoting does, up to roundoff. For finite ``mu`` (global
``EngineConfig.mu`` or per-row ``per_body_surface`` mixing) the coupled
bounds make it a fixed-point problem over (active set, bounds); the PGS
path (``ops/solver.py``) iterates to the same fixed point with the same
``mu·λ_n`` coupling, which the equivalence tests exploit.

We solve it by Murty-style principal block pivoting extended to boxed
rows: maintain an active set plus a bound side (lo/hi) per clamped
friction row, solve the masked KKT system ``A_CC λ_C = −b_C − A_CB λ_B``
with a dense ``linalg.solve`` (clamped rows contribute their bound
values), flip normal rows that violate primal (w < 0) or dual (λ < 0)
feasibility, clamp friction rows that leave their box, release clamped
friction rows whose w sign violates the box conditions, and recompute
the ``mu·λ_n`` bounds every round until the set, the sides, AND the
iterate are stable. Finite for P-matrices at fixed bounds;
iteration-capped for jit (the cap is asserted loose by the unit tests).
Everything is ``lax.while_loop`` + fixed-shape masked linear solves →
jit- and vmap-safe.

This is the conformance path (run in float64 under ``jax_enable_x64``), not
a throughput solver: A is dense (3C × 3C) and each pivot costs a full solve.
Use JACOBI for throughput (BASELINE config 4), DANTZIG/PGS for
trajectory-accuracy work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import WorldState, world_inv_inertia
from rl_ode_physics_tpu.ops.narrowphase import Contacts
from rl_ode_physics_tpu.ops import solver as sol

# pivot-loop cap: Murty converges in <= #normal-rows flips for PD systems in
# exact arithmetic; with finite-mu boxed rows the coupled bounds add a
# geometric fixed-point tail on top of the set pivots. 128 rounds is far
# above anything observed (tests assert convergence, and the while_loop
# exits early once feasible AND the iterate is stationary).
MAX_PIVOT_ROUNDS = 128
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
    # per-contact friction coefficient: per-body pair-mixed when
    # config.per_body_surface (rows["mu"], min-mixing — ops/solver.py),
    # else the global surface mu (the reference's dInfinity by default)
    mu_row = rows["mu"]
    if mu_row is None:
        mu_row = jnp.full((c,), config.mu, f)
    return jw, a_mat, b, valid, is_normal, mu_row


def _pivot_solve(a_mat, b, valid, is_normal, friction: bool, mu_row=None):
    """Murty principal block pivoting with boxed friction rows.

    ``mu_row``: (C,) per-contact friction coefficient (``inf`` = bilateral
    rows, the reference's surface) or ``None`` (same as all-inf). Friction
    bounds are ``±mu·λ_n`` recomputed from the current iterate every round
    (ODE's findex semantics, matching the PGS path's ``mu * lam_n[i]``
    coupling). Returns λ (R,) for rows ordered [normal | t1 | t2].
    """
    r = b.shape[0]
    c = r // 3
    f = b.dtype
    eye = jnp.eye(r, dtype=f)

    toggled = valid & is_normal              # unilateral normal rows
    if friction:
        fric = valid & ~is_normal
    else:
        fric = jnp.zeros_like(valid)
    if mu_row is None:
        mu3 = jnp.full((r,), jnp.inf, f)
    else:
        mu3 = jnp.tile(mu_row.astype(f), 3)  # row i ↔ normal row i mod C
    bilateral = fric & jnp.isinf(mu3)        # never clamp: always active
    boxed = fric & ~jnp.isinf(mu3)

    def bounds(lam):
        """hi = mu·λ_n per friction row (lo = −hi); inf-safe."""
        lam_n3 = jnp.tile(jnp.maximum(lam[:c], 0.0), 3)
        return jnp.where(jnp.isinf(mu3), jnp.inf, mu3 * lam_n3)

    def masked_solve(act, lam_clamp):
        """Solve active rows against A with clamped rows at their bound
        values; identity rows return the clamp verbatim."""
        m = jnp.where(act[:, None] & act[None, :], a_mat, eye)
        contrib = a_mat @ jnp.where(act, 0.0, lam_clamp)
        rhs = jnp.where(act, -b - contrib, lam_clamp)
        return jnp.linalg.solve(m, rhs)

    def clamp_values(side, hi):
        v = jnp.where(side < 0, -hi, jnp.where(side > 0, hi, 0.0))
        return jnp.where(boxed, v, 0.0)

    def cond(carry):
        act, side, _, done, i = carry
        return (~done) & (i < MAX_PIVOT_ROUNDS)

    def body(carry):
        act, side, lam_prev, _, i = carry
        hi = bounds(lam_prev)
        tiny = boxed & (hi < _TOL)           # bound collapsed (λ_n = 0)
        lam = masked_solve(act, clamp_values(side, hi))
        w = a_mat @ lam + b

        # normal-row pivots (classic Murty)
        rm_n = act & toggled & (lam < -_TOL)
        add_n = (~act) & toggled & (w < -_TOL)

        # boxed friction pivots: leave the box → clamp at the bound;
        # clamped with violating w sign → release (λ=lo ⟹ w≥0, λ=hi ⟹ w≤0);
        # interior-clamped at 0 with live bound → enter with the normal
        go_lo = act & boxed & (lam < -hi - _TOL)
        go_hi = act & boxed & (lam > hi + _TOL)
        rel_lo = (~act) & boxed & (side < 0) & (w < -_TOL) & ~tiny
        rel_hi = (~act) & boxed & (side > 0) & (w > _TOL) & ~tiny
        rel_mid = (~act) & boxed & (side == 0) & ~tiny

        new_act = ((act & ~rm_n & ~go_lo & ~go_hi & ~tiny)
                   | add_n | rel_lo | rel_hi | rel_mid | bilateral)
        new_side = jnp.where(go_lo, -1, jnp.where(go_hi, 1, side))
        new_side = jnp.where(rel_lo | rel_hi | rel_mid, 0, new_side)
        new_side = jnp.where(tiny, 1, new_side)   # sit at hi = 0
        new_side = jnp.where(boxed, new_side, 0)

        moved = jnp.any((new_act != act) | (new_side != side))
        # bounds move with λ_n even at a stable set: require the iterate
        # itself to be a fixed point (geometric convergence at fixed set);
        # tolerance is dtype-aware (f32 cannot reach the f64 threshold)
        lam_chg = jnp.max(jnp.abs(lam - lam_prev))
        scale = 1.0 + jnp.max(jnp.abs(lam))
        done = (~moved) & (lam_chg <= fp_tol * scale)
        return new_act, new_side, lam, done, i + 1

    fp_tol = 1e3 * _TOL if f == jnp.float64 else 30 * jnp.finfo(f).eps
    act0 = bilateral | (toggled & (b < 0.0))  # warm guess: violating normals
    side0 = jnp.zeros((r,), jnp.int32)
    lam0 = jnp.zeros((r,), f)
    act, side, lam, done, _ = jax.lax.while_loop(
        cond, body, (act0, side0, lam0, jnp.asarray(False), jnp.asarray(0)))
    # final consistent solve + projection on the converged set/bounds
    hi = bounds(lam)
    lam = masked_solve(act, clamp_values(side, hi))
    lam = jnp.where(valid, lam, 0.0)
    lam = jnp.where(toggled, jnp.maximum(lam, 0.0), lam)
    return jnp.where(boxed, jnp.clip(lam, -hi, hi), lam)


def solve_dantzig(state: WorldState, contacts: Contacts,
                  config: EngineConfig) -> WorldState:
    """Exact contact solve (dWorldStep semantics, ``src/main.c:213``).

    Supports the full surface space: ``mu = inf`` (the reference's setting
    — bilateral friction rows), finite global ``mu`` and per-body
    ``per_body_surface`` mixing (boxed rows with ODE findex bound
    coupling, ``_pivot_solve``).
    """
    jw, a_mat, b, valid, is_normal, mu_row = _build_lcp(
        state, contacts, config)
    if not config.friction:
        # drop friction rows entirely: only the first C rows participate
        valid = valid & is_normal
    lam = _pivot_solve(a_mat, b, valid, is_normal, config.friction, mu_row)

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
