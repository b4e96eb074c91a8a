"""Dense all-pairs pipeline: zero gathers, zero scatters, zero compaction.

For the reference's world sizes (64–512 bodies, BASELINE's 64-body bench
worlds) the sparse pipeline's bookkeeping — pair compaction, contact
packing, selector matmuls — costs more than the physics itself on TPU (see
docs/BENCHMARKS.md: the per-fusion dispatch floor dominates). This module
is the fully dense alternative (``EngineConfig.dense_pipeline=True``):

* narrowphase evaluates every (i, j) body pair as an (N, N, K) manifold
  tensor via pure broadcasting (upper-triangular mask kills duplicates),
* the solver's contact→body "gather" is broadcasting (``v[None, :] −
  v[:, None]``) and its body←contact "scatter-add" is a pair of row/column
  sums — contacts at (i, j) pull from and push to bodies i and j *by
  position*, so the connectivity is structural, not indexed,
* per-body angular response applies I⁻¹ once per body per iteration
  (torque accumulated first), not once per contact.

Memory is O(N²K) per world — the dense/sparse crossover is around a few
hundred bodies; above that use the sparse pipeline (the default).

Status (decided round 4): KEPT, as the independent cross-validation
pipeline — an algorithmically disjoint implementation of the same contact
physics (no compaction, no selector matmuls, no capacity caps) that
``tests/test_dense.py`` diffs against the production sparse path. It is
NOT a production TPU path: XLA pins the solver's loop-carried
(N, N, K, 3) constants to default layouts whose (4, 3)-minor tiles pad
42× (measured: 26 GB for 512 worlds), so it is practical on CPU / tiny
batches only, and ``parallel/batch.py`` OOM-guards it. Its historical
role as the FUSED-megakernel blueprint ended when FUSED was retired with
a measured rationale in round 3 (docs/BENCHMARKS.md).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import BodyType, WorldState, world_inv_inertia
from rl_ode_physics_tpu.ops.narrowphase import collide_pair, _enabled_kernels
from rl_ode_physics_tpu.ops.solver import _tangent_basis


def dense_narrowphase(state: WorldState, config: EngineConfig):
    """(N, N, K) manifold tensors: point, normal (i→j), depth, valid."""
    n = state.num_slots
    k = config.max_contacts_per_pair
    f = state.pos.dtype
    kernels = _enabled_kernels(config)

    pair = jax.vmap(jax.vmap(
        lambda pa, qa, ta, sa, pb, qb, tb, sb: collide_pair(
            pa, qa, ta, sa, pb, qb, tb, sb, k, kernels),
        in_axes=(None, None, None, None, 0, 0, 0, 0)),
        in_axes=(0, 0, 0, 0, None, None, None, None))

    points, normals, depths, valid = pair(
        state.pos, state.quat, state.body_type, state.size,
        state.pos, state.quat, state.body_type, state.size)

    # pair eligibility: upper triangle, both active, masks, movability
    idx = jnp.arange(n)
    upper = idx[:, None] < idx[None, :]
    active = state.active
    cat, col = state.category, state.collide
    mask_ok = (((cat[:, None] & col[None, :]) != 0)
               | ((cat[None, :] & col[:, None]) != 0))
    movable = state.inv_mass > 0
    not_mesh = state.body_type != BodyType.TRIMESH
    ok = (upper & (active[:, None] & active[None, :]) & mask_ok
          & (movable[:, None] | movable[None, :])
          & (not_mesh[:, None] & not_mesh[None, :]))

    valid = valid & ok[:, :, None]
    return points, normals, depths, valid


def dense_solve(state: WorldState, manifold, config: EngineConfig) -> WorldState:
    """Mass-splitting projected Jacobi on the (N, N, K) manifold.

    Identical math to ``ops.solver.solve_jacobi``; connectivity is
    positional, so the iteration is broadcasting + reductions only.
    """
    points, normals, depths, valid = manifold
    n = state.num_slots
    f = state.linvel.dtype
    dt = config.dt
    validf = valid.astype(f)

    inv_m = state.inv_mass                       # (N,)
    inv_i = world_inv_inertia(state)             # (N, 3, 3)

    r_a = points - state.pos[:, None, None, :]   # (N, N, K, 3) arm at body i
    r_b = points - state.pos[None, :, None, :]   # arm at body j

    n_ax = normals
    t1_ax, t2_ax = _tangent_basis(n_ax)

    def matvec_i(m, v):       # (N,3,3) over rows: (N,1,1,3,3)·(N,N,K,3)
        return jnp.sum(m[:, None, None, :, :] * v[..., None, :], axis=-1)

    def matvec_j(m, v):
        return jnp.sum(m[None, :, None, :, :] * v[..., None, :], axis=-1)

    def eff_mass(axis):
        rxn_a = jnp.cross(r_a, axis)
        rxn_b = jnp.cross(r_b, axis)
        ang_a = matvec_i(inv_i, rxn_a)
        ang_b = matvec_j(inv_i, rxn_b)
        return (inv_m[:, None, None] + inv_m[None, :, None]
                + jnp.sum(rxn_a * ang_a, -1) + jnp.sum(rxn_b * ang_b, -1))

    cfm_term = config.cfm / dt
    # mass splitting: per-body live contact counts
    kappa = jnp.maximum(
        jnp.sum(validf, axis=(1, 2)) + jnp.sum(validf, axis=(0, 2)), 1.0)
    split = jnp.maximum(kappa[:, None, None], kappa[None, :, None])

    d_n = eff_mass(n_ax) * split + cfm_term
    d_t1 = eff_mass(t1_ax) * split + cfm_term
    d_t2 = eff_mass(t2_ax) * split + cfm_term

    # rhs: ERP bias capped, bounce from pre-solve normal velocity
    def rel_v(linvel, angvel, axis, rxn_a, rxn_b):
        dlin = linvel[None, :, None, :] - linvel[:, None, None, :]
        return (jnp.sum(dlin * axis, -1)
                + jnp.sum(angvel[None, :, None, :] * rxn_b, -1)
                - jnp.sum(angvel[:, None, None, :] * rxn_a, -1))

    rxn_a_n, rxn_b_n = jnp.cross(r_a, n_ax), jnp.cross(r_b, n_ax)
    rxn_a_1, rxn_b_1 = jnp.cross(r_a, t1_ax), jnp.cross(r_b, t1_ax)
    rxn_a_2, rxn_b_2 = jnp.cross(r_a, t2_ax), jnp.cross(r_b, t2_ax)

    v_n0 = rel_v(state.linvel, state.angvel, n_ax, rxn_a_n, rxn_b_n)
    bias = jnp.minimum(config.erp * depths / dt, config.max_correcting_vel)
    bounce = jnp.where(-v_n0 > config.bounce_vel, -config.bounce * v_n0, 0.0)
    target = jnp.where(valid, jnp.maximum(bias, bounce), 0.0)

    omega = jnp.asarray(config.jacobi_omega, f)
    mu_inf = math.isinf(config.mu)

    def one_iter(_, carry):
        linvel, angvel, lam_n, lam_1, lam_2 = carry

        # residuals include ODE's CFM softening −cfm/h·λ (see ops/solver.py)
        dl_n = omega * (target - rel_v(linvel, angvel, n_ax, rxn_a_n, rxn_b_n)
                        - cfm_term * lam_n) / d_n
        new_n = jnp.maximum(lam_n + dl_n, 0.0)
        dl_n = jnp.where(valid, new_n - lam_n, 0.0)
        lam_n = lam_n + dl_n

        if config.friction:
            bound = (jnp.full_like(lam_n, jnp.inf) if mu_inf
                     else config.mu * lam_n)
            dl_1 = omega * (-rel_v(linvel, angvel, t1_ax, rxn_a_1, rxn_b_1)
                            - cfm_term * lam_1) / d_t1
            new_1 = jnp.clip(lam_1 + dl_1, -bound, bound)
            dl_1 = jnp.where(valid, new_1 - lam_1, 0.0)
            lam_1 = lam_1 + dl_1

            dl_2 = omega * (-rel_v(linvel, angvel, t2_ax, rxn_a_2, rxn_b_2)
                            - cfm_term * lam_2) / d_t2
            new_2 = jnp.clip(lam_2 + dl_2, -bound, bound)
            dl_2 = jnp.where(valid, new_2 - lam_2, 0.0)
            lam_2 = lam_2 + dl_2
            imp = (n_ax * dl_n[..., None] + t1_ax * dl_1[..., None]
                   + t2_ax * dl_2[..., None])            # (N, N, K, 3)
        else:
            imp = n_ax * dl_n[..., None]

        # body←contact accumulation by position: row sums take the −imp
        # side (body i), column sums the +imp side (body j)
        dlin = inv_m[:, None] * (
            jnp.sum(imp, axis=(1, 2)) * -1.0) + inv_m[:, None] * jnp.sum(
            imp, axis=(0, 2))
        torque = (jnp.sum(jnp.cross(r_a, -imp), axis=(1, 2))
                  + jnp.sum(jnp.cross(r_b, imp), axis=(0, 2)))   # (N, 3)
        dang = jnp.sum(inv_i * torque[:, None, :], axis=-1)
        return linvel + dlin, angvel + dang, lam_n, lam_1, lam_2

    zeros = jnp.zeros(valid.shape, f)
    carry = (state.linvel, state.angvel, zeros, zeros, zeros)
    linvel, angvel, *_ = jax.lax.fori_loop(
        0, config.solver_iterations, one_iter, carry)
    return state.replace(linvel=linvel, angvel=angvel)
