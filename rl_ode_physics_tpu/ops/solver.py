"""QuickStep-class contact solver: projected Gauss-Seidel and batched Jacobi.

TPU-native re-derivation of the LCP stage inside ODE's step (driven by the
reference at ``src/main.c:213``; surface parameters from its NearCallback,
``src/main.c:684-687``: bounce 0.2, bounce_vel 0.1, mu = dInfinity). The
solver works in impulse space on the velocity state the integrator has
already advanced with external forces — the standard sequential-impulse
formulation, equivalent to ODE's force-space QuickStep up to the dt scaling
of lambda.

Per contact row (normal n, arm r_a/r_b, bodies a, b):
    v_n      = (v_b + w_b × r_b − v_a − w_a × r_a) · n
    target   = max(erp/dt · depth  [capped by max_correcting_vel],
                   bounce · (−v_n⁰)  if −v_n⁰ > bounce_vel)      (ODE rhs)
    d        = m_a⁻¹ + m_b⁻¹ + n·((I_a⁻¹(r_a×n))×r_a) + (same for b) + cfm/dt
    dλ       = ω · (target − v_n − (cfm/dt)·λ) / d,   λ ← max(λ + dλ, 0)

The ``−(cfm/dt)·λ`` residual term implements ODE's CFM *constraint
softening*: QuickStep converges to ``(A + cfm/h·I)λ = rhs`` (the same
regularized system the direct ``SolverKind.DANTZIG`` solver inverts), not
to the hard constraint — verified mutually consistent by
``tests/test_lcp.py``.

Friction uses two tangent rows with bound μ·λ_n (μ=∞ ⇒ unclamped tangential
velocity kill, the reference's setting).

Two execution strategies (``SolverKind``):

* PGS — a ``lax.scan`` over contact rows; each row sees the latest
  velocities (Gauss-Seidel). Sequential per world but vmapped across the
  world batch; closest to ODE QuickStep semantics.
* JACOBI — all rows update from the previous iterate, impulses applied by
  one segment-sum scatter per iteration. Stabilized by *mass splitting*:
  each body's inverse mass/inertia is scaled by the number of contacts
  touching it, which makes the parallel update non-overshooting (the
  classical Jacobi/mass-splitting scheme). Fully vectorized over
  worlds × rows — the TPU throughput path.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
from rl_ode_physics_tpu.core.state import WorldState, world_inv_inertia
from rl_ode_physics_tpu.ops.narrowphase import Contacts

_EPS = 1e-9


def _tangent_basis(n):
    """Deterministic orthonormal (t1, t2) completing normal n; (..., 3)."""
    # pick the world axis least aligned with n
    ax = jnp.argmin(jnp.abs(n), axis=-1)
    e = jax.nn.one_hot(ax, 3, dtype=n.dtype)
    t1 = jnp.cross(n, e)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), _EPS)
    t2 = jnp.cross(n, t1)
    return t1, t2


def _gather_body_features(state: WorldState, s_mat, kappa):
    """Per-contact body features for both sides via ONE selector matmul.

    Per-contact gathers (``inv_i[a]`` etc.) are measured hot spots on TPU;
    the one-hot selector already exists for the solve loop, so pos, I⁻¹,
    m⁻¹ and κ ride a single (2C, N)·(N, 14) dot instead of five gathers.
    """
    n = state.num_slots
    c = s_mat.shape[0] // 2
    inv_i = world_inv_inertia(state)                    # (N, 3, 3)
    # friction rides the selector matmul too, but inf (the reference's mu)
    # cannot go through a 0/1 matmul (0·inf = NaN): ship 1/mu instead
    # (inf → 0, recovered as 1/max(x, eps) afterwards)
    inv_mu = 1.0 / jnp.maximum(state.friction, _EPS)
    feats = jnp.concatenate([
        state.pos,
        inv_i.reshape(n, 9),
        state.inv_mass[:, None],
        kappa[:, None],
        inv_mu[:, None],
        state.restitution[:, None],
    ], axis=-1)                                         # (N, 16)
    fh = jnp.matmul(s_mat, feats)                       # (2C, 16)
    return dict(
        pos_a=fh[:c, 0:3], pos_b=fh[c:, 0:3],
        inv_i_a=fh[:c, 3:12].reshape(c, 3, 3),
        inv_i_b=fh[c:, 3:12].reshape(c, 3, 3),
        inv_m_a=fh[:c, 12], inv_m_b=fh[c:, 12],
        kappa_a=fh[:c, 13], kappa_b=fh[c:, 13],
        inv_mu_a=fh[:c, 14], inv_mu_b=fh[c:, 14],
        bounce_a=fh[:c, 15], bounce_b=fh[c:, 15],
        inv_i=inv_i,
        s_mat=s_mat,
    )


def _row_data(state: WorldState, contacts: Contacts, config: EngineConfig,
              gathered=None):
    """Precompute per-row geometry, effective masses, and rhs targets.

    ``gathered``: optional output of ``_gather_body_features`` (matmul-based
    per-contact body data); without it, direct XLA gathers are used (the
    PGS path, where per-row indexing happens anyway).
    """
    dt = config.dt
    a, b = contacts.a, contacts.b
    n = contacts.normal
    p = contacts.point

    inv_m = state.inv_mass
    if gathered is None:
        inv_i = world_inv_inertia(state)      # (N, 3, 3)
        pos_a, pos_b = state.pos[a], state.pos[b]
        inv_i_a, inv_i_b = inv_i[a], inv_i[b]
        inv_m_a, inv_m_b = inv_m[a], inv_m[b]
    else:
        inv_i = gathered["inv_i"]
        pos_a, pos_b = gathered["pos_a"], gathered["pos_b"]
        inv_i_a, inv_i_b = gathered["inv_i_a"], gathered["inv_i_b"]
        inv_m_a, inv_m_b = gathered["inv_m_a"], gathered["inv_m_b"]

    r_a = p - pos_a
    r_b = p - pos_b

    t1, t2 = _tangent_basis(n)

    def eff_mass(axis):
        rxn_a = jnp.cross(r_a, axis)
        rxn_b = jnp.cross(r_b, axis)
        # VPU matvec: (C,3,3)·(C,3) as masked broadcast-sum (tiny dims)
        ang_a = jnp.sum(inv_i_a * rxn_a[..., None, :], axis=-1)
        ang_b = jnp.sum(inv_i_b * rxn_b[..., None, :], axis=-1)
        return (
            inv_m_a + inv_m_b
            + jnp.sum(rxn_a * ang_a, axis=-1)
            + jnp.sum(rxn_b * ang_b, axis=-1)
        )

    cfm_term = config.cfm / dt
    d_n = eff_mass(n) + cfm_term
    d_t1 = eff_mass(t1) + cfm_term
    d_t2 = eff_mass(t2) + cfm_term

    # rhs: ERP bias capped by max_correcting_vel, bounce from pre-solve v_n
    if gathered is None:
        va0 = state.linvel[a] + jnp.cross(state.angvel[a], r_a)
        vb0 = state.linvel[b] + jnp.cross(state.angvel[b], r_b)
    else:
        c = a.shape[0]
        vh = jnp.matmul(gathered["s_mat"],
                        jnp.concatenate([state.linvel, state.angvel], -1))
        va0 = vh[:c, 0:3] + jnp.cross(vh[:c, 3:6], r_a)
        vb0 = vh[c:, 0:3] + jnp.cross(vh[c:, 3:6], r_b)
    v0 = vb0 - va0
    v_n0 = jnp.sum(v0 * n, axis=-1)

    bias = jnp.minimum(config.erp * contacts.depth / dt,
                       config.max_correcting_vel)
    mu_row = None
    if config.per_body_surface:
        # pair mixing: min(friction) (via max of the shipped inverses),
        # max(restitution) — documented rules; ODE leaves mixing to the
        # NearCallback
        if gathered is None:
            mu_row = jnp.minimum(state.friction[a], state.friction[b])
            bounce_row = jnp.maximum(state.restitution[a],
                                     state.restitution[b])
        else:
            inv_mu = jnp.maximum(gathered["inv_mu_a"], gathered["inv_mu_b"])
            mu_row = jnp.where(inv_mu > _EPS, 1.0 / jnp.maximum(inv_mu, _EPS),
                               jnp.inf)
            bounce_row = jnp.maximum(gathered["bounce_a"],
                                     gathered["bounce_b"])
    else:
        bounce_row = config.bounce
    bounce_target = jnp.where(
        -v_n0 > config.bounce_vel, -bounce_row * v_n0, 0.0
    )
    target = jnp.maximum(bias, bounce_target)
    target = jnp.where(contacts.valid, target, 0.0)

    return dict(
        r_a=r_a, r_b=r_b, n=n, t1=t1, t2=t2,
        d_n=d_n, d_t1=d_t1, d_t2=d_t2,
        target=target, inv_i=inv_i, mu=mu_row,
    )


def _apply_impulse(linvel, angvel, inv_m, inv_i, body, r, impulse):
    """v[body] += m⁻¹·imp ; w[body] += I⁻¹·(r × imp) (single body, scatter)."""
    linvel = linvel.at[body].add(inv_m[body, None] * impulse)
    ang = jnp.einsum("ij,j->i", inv_i[body], jnp.cross(r, impulse))
    angvel = angvel.at[body].add(ang)
    return linvel, angvel


def solve_pgs(state: WorldState, contacts: Contacts,
              config: EngineConfig, lam0=None, return_lam: bool = False,
              joints_rows=None):
    """Sequential projected Gauss-Seidel (SOR) — ODE QuickStep ordering.

    ``lax.scan`` over rows inside ``lax.fori_loop`` over iterations. Row
    order is buffer order (deterministic); ODE's per-iteration row
    randomization is intentionally dropped for bitwise replay (SURVEY.md
    §2d determinism contract).

    ``lam0``: optional (C, 3) initial impulses (warm start,
    ``ops/warmstart.py``) — applied to the velocities up front, then
    refined; default cold start is ODE parity. ``return_lam`` additionally
    returns the accumulated (C, 3) impulses for the next step's cache.
    """
    rows = _row_data(state, contacts, config)
    inv_m = state.inv_mass
    inv_i = rows["inv_i"]
    omega = config.sor_omega
    cfm_term = config.cfm / config.dt
    mu_inf = math.isinf(config.mu)

    c = contacts.a.shape[0]

    def one_row(carry, i):
        linvel, angvel, lam_n, lam_t1, lam_t2 = carry
        a = contacts.a[i]
        b = contacts.b[i]
        r_a = rows["r_a"][i]
        r_b = rows["r_b"][i]
        live = contacts.valid[i]

        def rel_v(axis):
            va = linvel[a] + jnp.cross(angvel[a], r_a)
            vb = linvel[b] + jnp.cross(angvel[b], r_b)
            return jnp.dot(vb - va, axis)

        def apply_pair(linvel, angvel, axis, dlam):
            imp = axis * dlam
            linvel, angvel = _apply_impulse(linvel, angvel, inv_m, inv_i, a, r_a, -imp)
            linvel, angvel = _apply_impulse(linvel, angvel, inv_m, inv_i, b, r_b, imp)
            return linvel, angvel

        # normal row (residual includes ODE's CFM softening term −cfm/h·λ)
        n = rows["n"][i]
        dlam = omega * (rows["target"][i] - rel_v(n)
                        - cfm_term * lam_n[i]) / rows["d_n"][i]
        new_lam = jnp.maximum(lam_n[i] + dlam, 0.0)
        dlam = jnp.where(live, new_lam - lam_n[i], 0.0)
        lam_n = lam_n.at[i].add(dlam)
        linvel, angvel = apply_pair(linvel, angvel, n, dlam)

        # friction rows (target velocity 0, bound mu*lam_n)
        if config.friction:
            if config.per_body_surface:
                mu_i = rows["mu"][i]
                bound = jnp.where(jnp.isinf(mu_i), jnp.inf, mu_i * lam_n[i])
            else:
                bound = jnp.inf if mu_inf else config.mu * lam_n[i]
            t1 = rows["t1"][i]
            dls = omega * (0.0 - rel_v(t1)
                           - cfm_term * lam_t1[i]) / rows["d_t1"][i]
            new_l = jnp.clip(lam_t1[i] + dls, -bound, bound)
            dls = jnp.where(live, new_l - lam_t1[i], 0.0)
            lam_t1 = lam_t1.at[i].add(dls)
            linvel, angvel = apply_pair(linvel, angvel, t1, dls)

            t2 = rows["t2"][i]
            dls = omega * (0.0 - rel_v(t2)
                           - cfm_term * lam_t2[i]) / rows["d_t2"][i]
            new_l = jnp.clip(lam_t2[i] + dls, -bound, bound)
            dls = jnp.where(live, new_l - lam_t2[i], 0.0)
            lam_t2 = lam_t2.at[i].add(dls)
            linvel, angvel = apply_pair(linvel, angvel, t2, dls)

        return (linvel, angvel, lam_n, lam_t1, lam_t2), None

    with_joints = joints_rows is not None
    if with_joints:
        from rl_ode_physics_tpu.ops.joints import joint_iteration_seq

    def one_iter(_, carry):
        if with_joints:
            carry, jlam = carry[:-1], carry[-1]
        carry, _ = jax.lax.scan(one_row, carry, jnp.arange(c))
        if with_joints:
            # interleaved bilateral pass after each contact sweep —
            # SEQUENTIAL (Gauss-Seidel) like the contact scan above: the
            # snapshot (Jacobi) pass diverges on joint chains sharing a
            # body (ops/joints.py:joint_iteration_seq docstring)
            linvel, angvel = carry[0], carry[1]
            vel8 = jnp.concatenate(
                [linvel, angvel, jnp.zeros_like(linvel[:, :2])], -1)
            vel8, jlam = joint_iteration_seq(vel8, joints_rows, jlam,
                                             omega, cfm_term)
            carry = (vel8[:, 0:3], vel8[:, 3:6]) + carry[2:] + (jlam,)
        return carry

    zero = jnp.zeros((c,), state.linvel.dtype)
    linvel, angvel = state.linvel, state.angvel
    if lam0 is None:
        l_n = l_1 = l_2 = zero
    else:
        # warm start: apply the cached impulses to the velocities, then let
        # the sweeps refine from there
        l_n = jnp.where(contacts.valid, lam0[:, 0], 0.0)
        l_1 = jnp.where(contacts.valid, lam0[:, 1], 0.0)
        l_2 = jnp.where(contacts.valid, lam0[:, 2], 0.0)
        imp = (rows["n"] * l_n[:, None] + rows["t1"] * l_1[:, None]
               + rows["t2"] * l_2[:, None])
        for sign, body, r in ((-1.0, contacts.a, rows["r_a"]),
                              (1.0, contacts.b, rows["r_b"])):
            dlin = sign * inv_m[body, None] * imp
            torque = sign * jnp.cross(r, imp)
            dang = jnp.einsum("cij,cj->ci", inv_i[body], torque)
            n_slots = state.num_slots
            oh = jax.nn.one_hot(body, n_slots, dtype=imp.dtype)
            linvel = linvel + oh.T @ dlin
            angvel = angvel + oh.T @ dang

    carry = (linvel, angvel, l_n, l_1, l_2)
    if with_joints:
        carry = carry + (jnp.zeros_like(joints_rows["rhs"]),)
    out_c = jax.lax.fori_loop(
        0, config.solver_iterations, one_iter, carry
    )
    linvel, angvel, lam_n, lam_t1, lam_t2 = out_c[:5]
    out = state.replace(linvel=linvel, angvel=angvel)
    if return_lam:
        return out, jnp.stack([lam_n, lam_t1, lam_t2], axis=-1)
    return out


def _half_row_selector(state: WorldState, contacts: Contacts):
    """One-hot half-row selection matrix S (2C, N) and contact counts κ (N,).

    TPU scatters with duplicate indices serialize and fused gathers lower
    poorly on TPU, so the throughput solver phrases both directions of the
    contact↔body data movement as dense matmuls with S (MXU-friendly, built
    once per step):

        gather   vh = S  @ [linvel ‖ angvel]      (2C, 6)
        scatter  Δv = Sᵀ @ contributions          (N, 6)

    Rows 0..C−1 select contact i's body a, rows C..2C−1 its body b. Rows of
    invalid contacts are zero. Columns of non-movable bodies (inv_mass = 0 —
    statics, kinematics, the arena floor touching everything) are kept for
    the gather but contribute nothing on the scatter side because their
    inverse mass/inertia is zero.
    """
    n = state.num_slots
    body_of_half = jnp.concatenate([contacts.a, contacts.b])       # (2C,)
    valid_half = jnp.concatenate([contacts.valid, contacts.valid])
    cols = jnp.arange(n, dtype=jnp.int32)
    sel = ((body_of_half[:, None] == cols[None, :]) & valid_half[:, None])
    s = sel.astype(state.linvel.dtype)                             # (2C, N)
    counts = jnp.sum(s, axis=0)                                    # (N,)
    kappa = jnp.maximum(counts, 1.0)
    return s, kappa


def pack_solver_inputs(state: WorldState, contacts: Contacts,
                       config: EngineConfig):
    """Once-per-substep packed solver constants (the jnp Jacobi loop's
    working set — kept 2-D and wide per the layout rules):

      s_mat   (2C, N): one-hot half-row selector (a-rows ‖ b-rows)
      rowdata (C, 32): n t1 t2 | r×n per side/axis | d_n d_t1 d_t2
                       (mass-split, CFM-softened) | target | live
      halfop  (2C, 16): impulse→Δv angular operator (row-major 9) |
                        signed inverse-mass scale | pad
      vel     (N, 8):  linvel ‖ angvel ‖ pad

    Packing everything into a few wide 2-D buffers keeps the iteration
    loop's working set free of (…, 3, 3) carries, which XLA copies per
    iteration and tile-pads up to ~113× (docs/BENCHMARKS.md layout rules).
    """
    f = state.linvel.dtype
    c = contacts.a.shape[0]

    s_mat, kappa = _half_row_selector(state, contacts)
    gathered = _gather_body_features(state, s_mat, kappa)
    # split masses: each contact sees its bodies' inverse mass scaled by the
    # per-pair max count (conservative, guarantees no overshoot on gather-sum)
    split = jnp.maximum(gathered["kappa_a"], gathered["kappa_b"])

    rows = _row_data(state, contacts, config, gathered)
    # effective mass with split inverse masses: d scales linearly in M^-1
    cfm_term = config.cfm / config.dt
    d_n = (rows["d_n"] - cfm_term) * split + cfm_term
    d_t1 = (rows["d_t1"] - cfm_term) * split + cfm_term
    d_t2 = (rows["d_t2"] - cfm_term) * split + cfm_term

    r_a, r_b = rows["r_a"], rows["r_b"]
    n_ax, t1_ax, t2_ax = rows["n"], rows["t1"], rows["t2"]

    rowdata = jnp.concatenate([
        n_ax, t1_ax, t2_ax,
        jnp.cross(r_a, n_ax), jnp.cross(r_b, n_ax),
        jnp.cross(r_a, t1_ax), jnp.cross(r_b, t1_ax),
        jnp.cross(r_a, t2_ax), jnp.cross(r_b, t2_ax),
        d_n[:, None], d_t1[:, None], d_t2[:, None],
        rows["target"][:, None],
        contacts.valid.astype(f)[:, None],
    ], axis=-1)                                        # (C, 32)

    # constant per-half-row impulse→Δv operators, computed once:
    #   Δlin = ±inv_m·imp ;  Δang = invI·(r × ±imp) = ±(invI·[r]×)·imp
    def cross_mat(r):
        zero = jnp.zeros_like(r[..., 0])
        return jnp.stack([
            jnp.stack([zero, -r[..., 2], r[..., 1]], -1),
            jnp.stack([r[..., 2], zero, -r[..., 0]], -1),
            jnp.stack([-r[..., 1], r[..., 0], zero], -1),
        ], -2)

    def mm3(a, b):   # (C,3,3)@(C,3,3) as broadcast-sum (VPU, not conv)
        return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)

    ang_op_a = -mm3(gathered["inv_i_a"], cross_mat(r_a))   # (C, 3, 3)
    ang_op_b = mm3(gathered["inv_i_b"], cross_mat(r_b))
    ang_op = jnp.concatenate([ang_op_a, ang_op_b], 0).reshape(2 * c, 9)
    lin_sc = jnp.concatenate(
        [-gathered["inv_m_a"], gathered["inv_m_b"]])[:, None]
    halfop = jnp.concatenate(
        [ang_op, lin_sc, jnp.zeros((2 * c, 6), f)], axis=-1)   # (2C, 16)

    vel = jnp.concatenate(
        [state.linvel, state.angvel,
         jnp.zeros(state.linvel.shape[:-1] + (2,), f)], axis=-1)  # (N, 8)
    extras = {"mu": rows["mu"]}          # per-row friction, or None
    return s_mat, rowdata, halfop, vel, extras


def solve_jacobi(state: WorldState, contacts: Contacts,
                 config: EngineConfig, lam0=None, return_lam: bool = False,
                 joints_rows=None, return_joint_lam: bool = False):
    """Batched projected Jacobi with mass splitting — the throughput solver.

    Every iteration is a fully parallel, *gather-only* pass:

    1. gather both bodies' velocities per contact row (one MXU matmul),
    2. compute clamped impulse deltas for the normal + two friction axes
       from the same velocity iterate (block-Jacobi across axes),
    3. form per-half-row 6-DoF velocity contributions (C a-sides ‖ C
       b-sides),
    4. accumulate them into bodies with one MXU scatter matmul — no
       hot-loop scatters/gathers anywhere.

    Mass splitting (inverse masses scaled by each body's contact count κ)
    keeps the parallel update non-overshooting; ``jacobi_omega`` adds
    under-relaxation. Fixed iteration count, no data-dependent shapes →
    bitwise deterministic (SURVEY.md §2d).

    The loop works exclusively on the packed 2-D buffers of
    ``pack_solver_inputs`` — the same layout the Pallas kernels consume —
    so the iteration carries no (…, 3)/(…, 3, 3)-minor arrays (measured:
    the previous structure spent ~1 ms/substep @2048 worlds copying the
    (2C, 3, 3) angular operator every iteration).
    """
    if return_joint_lam and joints_rows is None:
        raise ValueError("return_joint_lam=True requires joints_rows")
    live_v = contacts.valid
    c = contacts.a.shape[0]
    f = state.linvel.dtype

    s_mat, rows, hop, vel0, extras = pack_solver_inputs(
        state, contacts, config)

    n_ax, t1_ax, t2_ax = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
    rxa_n, rxb_n = rows[:, 9:12], rows[:, 12:15]
    rxa_1, rxb_1 = rows[:, 15:18], rows[:, 18:21]
    rxa_2, rxb_2 = rows[:, 21:24], rows[:, 24:27]
    d_n, d_t1, d_t2 = rows[:, 27:28], rows[:, 28:29], rows[:, 29:30]
    target = rows[:, 30:31]
    live = rows[:, 31:32] > 0.5
    h = hop[:, 0:9]
    lin_sc = hop[:, 9:10]

    omega = jnp.asarray(config.jacobi_omega, f)
    cfm_term = config.cfm / config.dt
    mu_inf = math.isinf(config.mu)

    mm_dtype = jnp.dtype(config.solver_matmul_dtype)
    s_mm = s_mat.astype(mm_dtype)
    s_mm_t = s_mm.T
    def _axis_contrib_op(axis_rows):
        """(C, 3) constraint axis → (2C, 8) per-half-row Δv response per
        unit impulse magnitude, via the packed 9-plane angular operator
        (no (…,3,3) tensors). Computed ONCE per substep per axis so the
        iteration loop's scatter is 3 multiply-adds of (2C, 8) planes —
        the old in-loop formulation (duplicate the (C, 3) impulse, 9
        plane products, assemble) measured ~0.5 ms/substep of loop work.
        (A split-halves two-matmul scatter variant measured 1.5× SLOWER
        end-to-end — XLA fused the halves pathologically.)"""
        ax_h = jnp.concatenate([axis_rows, axis_rows], axis=0)   # (2C, 3)
        ix, iy, iz = ax_h[:, 0:1], ax_h[:, 1:2], ax_h[:, 2:3]
        angx = h[:, 0:1] * ix + h[:, 1:2] * iy + h[:, 2:3] * iz
        angy = h[:, 3:4] * ix + h[:, 4:5] * iy + h[:, 5:6] * iz
        angz = h[:, 6:7] * ix + h[:, 7:8] * iy + h[:, 8:9] * iz
        return jnp.concatenate(
            [lin_sc * ax_h, angx, angy, angz,
             jnp.zeros_like(ax_h[:, 0:2])], axis=-1)             # (2C, 8)

    # the iteration loop is VMEM-bandwidth-bound on these loop-invariant
    # (2C, 8) planes (profile: the two fused iteration ops read ~50 KB/world
    # /iteration ≈ the measured 42 ns/world/iter at ~1.3 TB/s); with
    # solver_matmul_dtype="bfloat16" they are STORED bf16 — same rounding
    # class as the default-matmul-precision MXU passes, half the traffic
    plane_dt = mm_dtype if mm_dtype == jnp.bfloat16 else f

    k_op_n = _axis_contrib_op(n_ax).astype(plane_dt)
    if config.friction:
        k_op_1 = _axis_contrib_op(t1_ax).astype(plane_dt)
        k_op_2 = _axis_contrib_op(t2_ax).astype(plane_dt)

    def _axis_j_op(axis_rows, rxa, rxb):
        """(C, 3) axis + arm crosses → (2C, 8) J-row weight planes so the
        per-iteration relative velocity is ONE wide multiply-reduce over
        the gathered vh: rel = fold(sum(W ⊙ vh)) (a-half + b-half)."""
        z2 = jnp.zeros_like(axis_rows[:, 0:2])
        w_a = jnp.concatenate([-axis_rows, -rxa, z2], axis=-1)   # (C, 8)
        w_b = jnp.concatenate([axis_rows, rxb, z2], axis=-1)
        return jnp.concatenate([w_a, w_b], axis=0)               # (2C, 8)

    j_op_n = _axis_j_op(n_ax, rxa_n, rxb_n).astype(plane_dt)
    if config.friction:
        j_op_1 = _axis_j_op(t1_ax, rxa_1, rxb_1).astype(plane_dt)
        j_op_2 = _axis_j_op(t2_ax, rxa_2, rxb_2).astype(plane_dt)

    def scatter_dl(dl_n, dl_1=None, dl_2=None):
        """Per-axis impulse magnitudes (C, 1) → (N, 8) Δvel via the
        precomputed response operators + one MXU scatter matmul."""
        def dup(x):
            return jnp.concatenate([x, x], axis=0)               # (2C, 1)
        contrib = k_op_n * dup(dl_n)
        if dl_1 is not None:
            contrib = contrib + k_op_1 * dup(dl_1) + k_op_2 * dup(dl_2)
        return jnp.matmul(s_mm_t, contrib.astype(mm_dtype),
                          preferred_element_type=f)              # (N, 8)

    beta = float(config.jacobi_beta)
    momentum = beta != 0.0
    with_joints = joints_rows is not None

    if (config.solver_cm and not with_joints and lam0 is None
            and not return_lam and not return_joint_lam):
        # component-major iteration (config.solver_cm docstring): every
        # loop array holds contacts in LANES. Planes transpose ONCE per
        # substep; the loop's elementwise ops then run on (1, C)/(8, 2C)
        # full-lane tiles instead of the row-major (C, 1)/(2C, 8) 8-lane
        # slivers. Identical math — update order is per-axis batched in
        # both forms, so results agree to f32 roundoff (summation order
        # inside the two matmul forms differs).
        jt_n, kt_n = j_op_n.T, k_op_n.T                    # (8, 2C)
        if config.friction:
            jt_1, jt_2 = j_op_1.T, j_op_2.T
            kt_1, kt_2 = k_op_1.T, k_op_2.T
        d_n_t, d_t1_t, d_t2_t = d_n.T, d_t1.T, d_t2.T      # (1, C)
        target_t, live_t = target.T, live.T
        mu_t = (extras["mu"][None, :] if config.per_body_surface
                else None)
        vel_t0 = vel0.T                                    # (8, N)

        def dup(x):                                        # (1, C)→(1, 2C)
            return jnp.concatenate([x, x], axis=1)

        def one_iter_cm(_, carry):
            if momentum:
                vel_t, ln, l1, l2, pn, p1, p2 = carry
                mn, m1, m2 = (beta * (ln - pn), beta * (l1 - p1),
                              beta * (l2 - p2))
                pn, p1, p2 = ln, l1, l2
            else:
                vel_t, ln, l1, l2 = carry
                mn = m1 = m2 = 0.0

            vh_t = jnp.matmul(vel_t.astype(mm_dtype), s_mm_t,
                              preferred_element_type=f)    # (8, 2C)

            def rel(j_t):
                r2 = jnp.sum(j_t * vh_t, 0, keepdims=True)  # (1, 2C)
                return r2[:, :c] + r2[:, c:]                # (1, C)

            dl_n = (omega * (target_t - rel(jt_n) - cfm_term * ln)
                    / d_n_t + mn)
            new_n = jnp.maximum(ln + dl_n, 0.0)
            dl_n = jnp.where(live_t, new_n - ln, 0.0)
            ln = ln + dl_n

            if config.friction:
                if config.per_body_surface:
                    bound = jnp.where(jnp.isinf(mu_t),
                                      jnp.full_like(ln, jnp.inf),
                                      mu_t * ln)
                elif mu_inf:
                    bound = jnp.full_like(ln, jnp.inf)
                else:
                    bound = config.mu * ln
                dl_1 = (omega * (-rel(jt_1) - cfm_term * l1)
                        / d_t1_t + m1)
                new_1 = jnp.clip(l1 + dl_1, -bound, bound)
                dl_1 = jnp.where(live_t, new_1 - l1, 0.0)
                l1 = l1 + dl_1
                dl_2 = (omega * (-rel(jt_2) - cfm_term * l2)
                        / d_t2_t + m2)
                new_2 = jnp.clip(l2 + dl_2, -bound, bound)
                dl_2 = jnp.where(live_t, new_2 - l2, 0.0)
                l2 = l2 + dl_2
                contrib = (kt_n * dup(dl_n) + kt_1 * dup(dl_1)
                           + kt_2 * dup(dl_2))             # (8, 2C)
            else:
                contrib = kt_n * dup(dl_n)

            vel_t = vel_t + jnp.matmul(contrib.astype(mm_dtype), s_mm,
                                       preferred_element_type=f)  # (8, N)
            out = (vel_t, ln, l1, l2)
            if momentum:
                out = out + (pn, p1, p2)
            return out

        zc = jnp.zeros((1, c), f)
        carry = (vel_t0, zc, zc, zc)
        if momentum:
            carry = carry + (zc, zc, zc)
        carry = jax.lax.fori_loop(0, config.solver_iterations,
                                  one_iter_cm, carry,
                                  unroll=config.solver_loop_unroll
                                  if config.solver_loop_unroll > 1 else None)
        vel8 = carry[0].T
        return state.replace(linvel=vel8[:, 0:3], angvel=vel8[:, 3:6])

    if with_joints:
        from rl_ode_physics_tpu.ops.joints import joint_iteration

    def one_iter(_, carry):
        if with_joints:
            carry, jlam = carry[:-1], carry[-1]
        if momentum:
            # heavy-ball: extrapolate with the previous accepted step before
            # projecting (projected heavy-ball / Polyak momentum)
            vel, lam_n, lam_t1, lam_t2, pn, p1, p2 = carry
            mom_n, mom_1, mom_2 = (beta * (lam_n - pn), beta * (lam_t1 - p1),
                                   beta * (lam_t2 - p2))
            pn, p1, p2 = lam_n, lam_t1, lam_t2
        else:
            vel, lam_n, lam_t1, lam_t2 = carry            # vel (N, 8)
            mom_n = mom_1 = mom_2 = 0.0

        # one MXU gather for both bodies of every contact
        vh = jnp.matmul(s_mm, vel.astype(mm_dtype),
                        preferred_element_type=f)          # (2C, 8)

        def rel(j_op):
            """Per-row relative velocity: one wide multiply-reduce over
            the precomputed (2C, 8) J-weight planes, halves folded."""
            r2 = jnp.sum(j_op * vh, -1, keepdims=True)     # (2C, 1)
            return r2[:c] + r2[c:]                         # (C, 1)

        # residuals include ODE's CFM softening term −cfm/h·λ (QuickStep
        # converges to the regularized system (A + cfm/h·I)λ = rhs)
        dl_n = omega * (target - rel(j_op_n)
                        - cfm_term * lam_n) / d_n + mom_n
        new_n = jnp.maximum(lam_n + dl_n, 0.0)
        dl_n = jnp.where(live, new_n - lam_n, 0.0)
        lam_n = lam_n + dl_n

        if config.friction:
            if config.per_body_surface:
                mu_c = extras["mu"][:, None]              # (C, 1)
                bound = jnp.where(jnp.isinf(mu_c),
                                  jnp.full_like(lam_n, jnp.inf),
                                  mu_c * lam_n)
            elif mu_inf:
                bound = jnp.full_like(lam_n, jnp.inf)
            else:
                bound = config.mu * lam_n
            dl_1 = omega * (-rel(j_op_1)
                            - cfm_term * lam_t1) / d_t1 + mom_1
            new_1 = jnp.clip(lam_t1 + dl_1, -bound, bound)
            dl_1 = jnp.where(live, new_1 - lam_t1, 0.0)
            lam_t1 = lam_t1 + dl_1

            dl_2 = omega * (-rel(j_op_2)
                            - cfm_term * lam_t2) / d_t2 + mom_2
            new_2 = jnp.clip(lam_t2 + dl_2, -bound, bound)
            dl_2 = jnp.where(live, new_2 - lam_t2, 0.0)
            lam_t2 = lam_t2 + dl_2
            dv = scatter_dl(dl_n, dl_1, dl_2)
        else:
            dv = scatter_dl(dl_n)

        # MXU scatter-add back into the bodies
        vel = vel + dv
        if with_joints:
            # interleaved bilateral pass (unclamped rows) — the iterative
            # analog of ODE folding joint rows into the same LCP
            vel, jlam = joint_iteration(vel, joints_rows, jlam, omega,
                                        cfm_term)
        out = (vel, lam_n, lam_t1, lam_t2)
        if momentum:
            out = out + (pn, p1, p2)
        if with_joints:
            out = out + (jlam,)
        return out

    zero = jnp.zeros((c, 1), f)
    if lam0 is None:
        l_n = l_1 = l_2 = zero
    else:
        # warm start: apply cached impulses via the same contrib machinery
        l_n = jnp.where(live_v, lam0[:, 0], 0.0)[:, None]
        l_1 = jnp.where(live_v, lam0[:, 1], 0.0)[:, None]
        l_2 = jnp.where(live_v, lam0[:, 2], 0.0)[:, None]
        if config.friction:
            vel0 = vel0 + scatter_dl(l_n, l_1, l_2)
        else:
            vel0 = vel0 + scatter_dl(l_n)
    carry = (vel0, l_n, l_1, l_2)
    if momentum:
        carry = carry + (l_n, l_1, l_2)
    if with_joints:
        carry = carry + (jnp.zeros_like(joints_rows["rhs"]),)
    out_carry = jax.lax.fori_loop(
        0, config.solver_iterations, one_iter, carry,
        unroll=config.solver_loop_unroll
        if config.solver_loop_unroll > 1 else None,
    )
    vel8, lam_n, lam_t1, lam_t2 = out_carry[:4]
    jlam_out = out_carry[-1] if with_joints else None
    out = state.replace(linvel=vel8[:, 0:3], angvel=vel8[:, 3:6])
    if return_joint_lam:
        return out, jlam_out
    if return_lam:
        return out, jnp.concatenate([lam_n, lam_t1, lam_t2], axis=-1)
    return out


def solve(state: WorldState, contacts: Contacts,
          config: EngineConfig, joints_rows=None) -> WorldState:
    if config.solver is SolverKind.PGS:
        return solve_pgs(state, contacts, config, joints_rows=joints_rows)
    if config.solver is SolverKind.DANTZIG:
        from rl_ode_physics_tpu.ops.lcp import solve_dantzig
        state = solve_dantzig(state, contacts, config)
        if joints_rows is not None:
            # direct contact solve, then iterative bilateral relaxation
            # (joint rows are equality constraints — Gauss-Seidel
            # relaxation converges; documented deviation from a single
            # mixed LCP. Sequential, not the snapshot Jacobi pass, which
            # diverges on joint chains — joint_iteration_seq docstring)
            from rl_ode_physics_tpu.ops.joints import joint_iteration_seq
            vel8 = jnp.concatenate(
                [state.linvel, state.angvel,
                 jnp.zeros_like(state.linvel[:, :2])], -1)
            jlam = jnp.zeros_like(joints_rows["rhs"])
            cfm_term = config.cfm / config.dt
            def body(_, carry):
                v, l = carry
                return joint_iteration_seq(v, joints_rows, l, 1.0, cfm_term)
            vel8, _ = jax.lax.fori_loop(
                0, config.solver_iterations, body, (vel8, jlam))
            state = state.replace(linvel=vel8[:, 0:3], angvel=vel8[:, 3:6])
        return state
    return solve_jacobi(state, contacts, config, joints_rows=joints_rows)
