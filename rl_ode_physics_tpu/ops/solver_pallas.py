"""Pallas TPU kernel: the whole contact solve, VMEM-resident.

The jnp Jacobi solver (``ops.solver.solve_jacobi``) re-reads its per-contact
constants and the one-hot selector from HBM every iteration (XLA keeps loop
state in HBM between fusions). This kernel pins everything for one world —
selector S (2C×N), packed row constants, packed impulse→Δv operators, and
the velocity state — in VMEM and runs all ``solver_iterations`` inside the
kernel: per-iteration HBM traffic drops to zero; the two data movements per
iteration (contact gather ``S·v`` and body scatter-add ``Sᵀ·contrib``) run
on the MXU from VMEM.

Grid = one step per world (vmap-of-worlds becomes the Pallas grid). Math is
identical to ``solve_jacobi`` (same mass splitting, same clamp order); on
real TPU hardware the compiled kernel reproduces the jnp path BITWISE
(measured max |Δv| = 0.0 at 512 worlds / 256 contacts). The jnp path remains
the executable spec and the CPU fallback.

Status: correctness-complete, default OFF. On the current single-chip
backend the per-world grid steps underutilize the MXU ((512×64)·(64×8)
matmuls) and the jnp batched path is ~3× faster; the kernel is the
foundation for a fused narrowphase+solve megakernel (multiple worlds per
grid step, double-buffered world DMA) in a later round.

Packing (lane-friendly 2-D blocks only — no 3-D reshapes inside the kernel):
  rowdata (C, 32):  n(3) t1(3) t2(3) | rxn_a_n(3) rxn_b_n(3) rxn_a_1(3)
                    rxn_b_1(3) rxn_a_2(3) rxn_b_2(3) | d_n d_t1 d_t2
                    target live
  halfop  (2C, 16): ang_op row-major (9) | lin_scale (1) | pad
  vel     (N, 8):   linvel(3) angvel(3) pad(2)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import WorldState
from rl_ode_physics_tpu.ops.narrowphase import Contacts
from rl_ode_physics_tpu.ops import solver as sol

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False


def _pack_inputs(state: WorldState, contacts: Contacts,
                 config: EngineConfig):
    """Per-world solver constants, packed for the kernel — the shared
    once-per-substep precompute (``ops.solver.pack_solver_inputs``, also
    consumed by the jnp Jacobi loop and the FUSED megakernel). The kernels
    use the global-surface path (per_body_surface extras are dropped)."""
    return sol.pack_solver_inputs(state, contacts, config)[:4]


def _kernel_factory(c: int, iterations: int, omega: float, mu: float,
                    friction: bool, cfm_term: float):
    mu_inf = math.isinf(mu)

    def kernel(s_ref, rows_ref, hop_ref, vel_ref, out_ref):
        # block leading dim is 1 (one world per grid step)
        s = s_ref[0]                    # (2C, N)
        rows = rows_ref[0]              # (C, 32)
        hop = hop_ref[0]                # (2C, 16)
        v0 = vel_ref[0]                 # (N, 8)

        n_ax = rows[:, 0:3]
        t1_ax = rows[:, 3:6]
        t2_ax = rows[:, 6:9]
        rxa_n, rxb_n = rows[:, 9:12], rows[:, 12:15]
        rxa_1, rxb_1 = rows[:, 15:18], rows[:, 18:21]
        rxa_2, rxb_2 = rows[:, 21:24], rows[:, 24:27]
        d_n = rows[:, 27]
        d_t1 = rows[:, 28]
        d_t2 = rows[:, 29]
        target = rows[:, 30]
        live = rows[:, 31] > 0.5

        h = hop[:, 0:9]                 # ang_op row-major
        lin_sc = hop[:, 9:10]

        def body(_, carry):
            v, lam_n, lam_1, lam_2 = carry
            vh = jnp.dot(s, v, preferred_element_type=v.dtype)  # (2C, 8)
            lin_a, ang_a = vh[:c, 0:3], vh[:c, 3:6]
            lin_b, ang_b = vh[c:, 0:3], vh[c:, 3:6]
            dlin = lin_b - lin_a

            def rel(axis, rxa, rxb):
                return (jnp.sum(dlin * axis, -1, keepdims=True)
                        + jnp.sum(ang_b * rxb, -1, keepdims=True)
                        - jnp.sum(ang_a * rxa, -1, keepdims=True))  # (C,1)

            # CFM softening residual term, identical to ops/solver.py
            dl_n = omega * (target[:, None] - rel(n_ax, rxa_n, rxb_n)
                            - cfm_term * lam_n) / d_n[:, None]
            new_n = jnp.maximum(lam_n + dl_n, 0.0)
            dl_n = jnp.where(live[:, None], new_n - lam_n, 0.0)
            lam_n = lam_n + dl_n

            if friction:
                if mu_inf:
                    bound = jnp.full_like(lam_n, jnp.inf)
                else:
                    bound = mu * lam_n
                dl_1 = omega * (-rel(t1_ax, rxa_1, rxb_1)
                                - cfm_term * lam_1) / d_t1[:, None]
                new_1 = jnp.clip(lam_1 + dl_1, -bound, bound)
                dl_1 = jnp.where(live[:, None], new_1 - lam_1, 0.0)
                lam_1 = lam_1 + dl_1

                dl_2 = omega * (-rel(t2_ax, rxa_2, rxb_2)
                                - cfm_term * lam_2) / d_t2[:, None]
                new_2 = jnp.clip(lam_2 + dl_2, -bound, bound)
                dl_2 = jnp.where(live[:, None], new_2 - lam_2, 0.0)
                lam_2 = lam_2 + dl_2
                imp = n_ax * dl_n + t1_ax * dl_1 + t2_ax * dl_2   # (C, 3)
            else:
                imp = n_ax * dl_n

            imp_h = jnp.concatenate([imp, imp], axis=0)           # (2C, 3)
            ix, iy, iz = imp_h[:, 0:1], imp_h[:, 1:2], imp_h[:, 2:3]
            angx = h[:, 0:1] * ix + h[:, 1:2] * iy + h[:, 2:3] * iz
            angy = h[:, 3:4] * ix + h[:, 4:5] * iy + h[:, 5:6] * iz
            angz = h[:, 6:7] * ix + h[:, 7:8] * iy + h[:, 8:9] * iz
            contrib = jnp.concatenate(
                [lin_sc * imp_h, angx, angy, angz,
                 jnp.zeros_like(imp_h[:, 0:2])], axis=-1)         # (2C, 8)

            dv = jnp.dot(s.T, contrib, preferred_element_type=v.dtype)
            return v + dv, lam_n, lam_1, lam_2

        lam0 = jnp.zeros((c, 1), v0.dtype)
        v_final, *_ = jax.lax.fori_loop(
            0, iterations, body, (v0, lam0, lam0, lam0))
        out_ref[0] = v_final

    return kernel


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def _solve_batched(s_mat, rowdata, halfop, vel, config: EngineConfig,
                   interpret: bool = False):
    """(B, …) packed inputs → (B, N, 8) velocities after the full solve."""
    bsz, two_c, n = s_mat.shape
    c = two_c // 2
    dtype = vel.dtype

    kernel = _kernel_factory(c, config.solver_iterations,
                             config.jacobi_omega, config.mu, config.friction,
                             config.cfm / config.dt)

    def spec(shape):
        return pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            spec((two_c, n)),
            spec((c, 32)),
            spec((two_c, 16)),
            spec((n, 8)),
        ],
        out_specs=spec((n, 8)),
        out_shape=jax.ShapeDtypeStruct((bsz, n, 8), dtype),
        interpret=interpret,
    )(s_mat, rowdata, halfop, vel)


def solve_jacobi_pallas(state: WorldState, contacts: Contacts,
                        config: EngineConfig,
                        interpret: bool = False) -> WorldState:
    """Single-world entry (vmap-compatible: use ``solve_batched`` for a
    whole batch in one pallas_call)."""
    s_mat, rowdata, halfop, vel = _pack_inputs(state, contacts, config)
    out = _solve_batched(s_mat[None], rowdata[None], halfop[None],
                         vel[None], config, interpret)[0]
    return state.replace(linvel=out[:, 0:3], angvel=out[:, 3:6])


def solve_batched(batch_state: WorldState, batch_contacts: Contacts,
                  config: EngineConfig,
                  interpret: bool = False) -> WorldState:
    """Batched solve: packs per-world inputs with vmap, runs ONE pallas_call
    over the world grid."""
    s_mat, rowdata, halfop, vel = jax.vmap(
        lambda s, c: _pack_inputs(s, c, config)
    )(batch_state, batch_contacts)
    out = _solve_batched(s_mat, rowdata, halfop, vel, config, interpret)
    return batch_state.replace(linvel=out[..., 0:3], angvel=out[..., 3:6])
