"""Fused substep solve: the whole 20-iteration contact solve as ONE Pallas
kernel over world blocks, VMEM-resident (``SolverKind.FUSED``).

Round-2 profile (docs/BENCHMARKS.md): at 2048 worlds the jnp Jacobi solve
costs ~8 ms/substep — not in FLOPs but in ~12 dispatched XLA ops *per
solver iteration* (two selector bmm's, residual/contrib elementwise
fusions, and loop-carried copies of loop-invariant data). This kernel runs
the entire iteration loop on-chip: per-iteration HBM traffic and dispatch
count drop to zero.

Layout (the round-1 lesson: minor dims wide, never (…, 3, 3) carries):

* everything is **component-major 2-D**: velocities ``(8, N)`` (rows are
  vx..wz), row constants ``(32, C)`` (rows are the packed per-contact
  constants of ``ops/solver_pallas.py`` transposed — lanes are contacts),
  per-side impulse→Δv operators ``(16, C)``;
* the contact↔body selector matrices are built **inside the kernel** from
  the ``(a, b)`` slot indices by 2-D iota compares (no (N, C) one-hots ever
  touch HBM — at 2048 worlds they would be ~2 GB of pure zero traffic);
* gather/scatter ride the MXU at near-minimal padding:
  ``(8, N)·(N, C)`` and ``(8, C)·(C, N)`` per side — the f32 tile is
  (8, 128), so an 8-row panel wastes nothing on the sublane axis;
* C (contact capacity) must be a multiple of 128 for aligned lane tiles
  (the packing pads; ``FUSED_CONTACT_LANES``).

Math is identical to ``ops.solver.solve_jacobi`` (mass splitting, CFM
softening, clamp order) — asserted to tolerance by ``tests/test_megakernel``
and bitwise-checked against ``solver_pallas`` on hardware where both run.

Reference anchor: this kernel is the interior of the reference's
``dWorldStep`` call (``/root/reference/src/main.c:213``) re-derived as a
batched TPU program; contacts stay per-step transients
(``dJointGroupEmpty``, ``src/main.c:214``).
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

# worlds per grid step: amortizes per-grid-step overhead while keeping the
# per-step VMEM footprint (~75 KB/world of inputs + shared scratch at
# C=256, N=64) comfortable. Overridable for experiments.
import os

WORLDS_PER_BLOCK = int(os.environ.get("FUSED_WORLD_BLOCK", 8))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pack_component_major(state: WorldState, contacts: Contacts,
                          config: EngineConfig, c_pad: int):
    """Per-world packed inputs, component-major (transposed vs
    solver_pallas): rows_t (32, C*), hop (2, 16, C*), idx (8, C*) f32,
    vel_t (8, N). C* = contact capacity padded to a lane-tile multiple."""
    f = state.linvel.dtype
    c = contacts.a.shape[0]

    from rl_ode_physics_tpu.ops import solver_pallas as sp
    _, rowdata, halfop, vel = sp._pack_inputs(state, contacts, config)

    pad = c_pad - c
    rows_t = jnp.pad(rowdata, ((0, pad), (0, 0))).T          # (32, C*)
    hop_a = jnp.pad(halfop[:c], ((0, pad), (0, 0))).T        # (16, C*)
    hop_b = jnp.pad(halfop[c:], ((0, pad), (0, 0))).T
    # slot indices as f32 (compared against iota in-kernel); invalid/padded
    # rows point at slot N (out of range -> all-zero one-hot). Shipped in
    # BOTH layouts — (8, C*) lane rows for the gather-side (N, C) one-hots,
    # (C*, 8) columns for the scatter-side (C, N) — because an in-kernel
    # (1, C) -> (C, 1) transpose is a relayout Mosaic handles poorly.
    n = state.num_slots
    a_idx = jnp.where(contacts.valid, contacts.a, n).astype(f)
    b_idx = jnp.where(contacts.valid, contacts.b, n).astype(f)
    idx2 = jnp.stack([
        jnp.pad(a_idx, (0, pad), constant_values=float(n)),
        jnp.pad(b_idx, (0, pad), constant_values=float(n)),
    ])                                                       # (2, C*)
    idx_row = jnp.pad(idx2, ((0, 6), (0, 0)))                # (8, C*)
    idx_col = jnp.pad(idx2.T, ((0, 0), (0, 6)))              # (C*, 8)
    vel_t = vel.T[:8]                                        # (8, N)
    return rows_t, jnp.stack([hop_a, hop_b]), idx_row, idx_col, vel_t


def _kernel_factory(n: int, c: int, w_block: int, iterations: int,
                    omega: float, mu: float, friction: bool, cfm_term: float):
    mu_inf = math.isinf(mu)

    def kernel(rows_ref, hop_ref, idx_row_ref, idx_col_ref, vel_ref, out_ref,
               sta_s, stb_s, sa_s, sb_s):
        for w in range(w_block):
            rows = rows_ref[w]                    # (32, C)
            idx_row = idx_row_ref[w]              # (8, C) rows 0/1 = a/b
            idx_col = idx_col_ref[w]              # (C, 8) cols 0/1 = a/b
            vel0 = vel_ref[w]                     # (8, N)
            hop_a = hop_ref[w, 0]                 # (16, C)
            hop_b = hop_ref[w, 1]

            # one-hot selectors from iota compares (built once per world;
            # int32 iota — Mosaic has no float iota)
            body_row = jax.lax.broadcasted_iota(jnp.int32, (n, c), 0)
            body_col = jax.lax.broadcasted_iota(jnp.int32, (c, n), 1)
            a_row = idx_row[0:1, :].astype(jnp.int32)
            b_row = idx_row[1:2, :].astype(jnp.int32)
            a_col = idx_col[:, 0:1].astype(jnp.int32)
            b_col = idx_col[:, 1:2].astype(jnp.int32)
            sta_s[...] = (body_row == a_row).astype(vel0.dtype)
            stb_s[...] = (body_row == b_row).astype(vel0.dtype)
            sa_s[...] = (body_col == a_col).astype(vel0.dtype)
            sb_s[...] = (body_col == b_col).astype(vel0.dtype)

            n_ax = rows[0:3]
            t1_ax = rows[3:6]
            t2_ax = rows[6:9]
            rxa_n, rxb_n = rows[9:12], rows[12:15]
            rxa_1, rxb_1 = rows[15:18], rows[18:21]
            rxa_2, rxb_2 = rows[21:24], rows[24:27]
            d_n = rows[27:28]
            d_t1 = rows[28:29]
            d_t2 = rows[29:30]
            target = rows[30:31]
            live = rows[31:32] > 0.5

            lin_sc_a = hop_a[9:10]
            lin_sc_b = hop_b[9:10]

            def ang_contrib(hop, imp):
                """(3, C) angular Δv contribution: row-major 3×3 op applied
                to the impulse components (all (1, C) lane math)."""
                ix, iy, iz = imp[0:1], imp[1:2], imp[2:3]
                ax = hop[0:1] * ix + hop[1:2] * iy + hop[2:3] * iz
                ay = hop[3:4] * ix + hop[4:5] * iy + hop[5:6] * iz
                az = hop[6:7] * ix + hop[7:8] * iy + hop[8:9] * iz
                return jnp.concatenate([ax, ay, az], axis=0)

            def body(_, carry):
                vel, lam_n, lam_1, lam_2 = carry
                vh_a = jnp.dot(vel, sta_s[...],
                               preferred_element_type=vel.dtype)   # (8, C)
                vh_b = jnp.dot(vel, stb_s[...],
                               preferred_element_type=vel.dtype)
                dlin = vh_b[0:3] - vh_a[0:3]
                ang_a, ang_b = vh_a[3:6], vh_b[3:6]

                def rel(axis, rxa, rxb):
                    return (jnp.sum(dlin * axis, 0, keepdims=True)
                            + jnp.sum(ang_b * rxb, 0, keepdims=True)
                            - jnp.sum(ang_a * rxa, 0, keepdims=True))

                dl_n = omega * (target - rel(n_ax, rxa_n, rxb_n)
                                - cfm_term * lam_n) / d_n
                new_n = jnp.maximum(lam_n + dl_n, 0.0)
                dl_n = jnp.where(live, new_n - lam_n, 0.0)
                lam_n = lam_n + dl_n

                if friction:
                    if mu_inf:
                        bound = jnp.full_like(lam_n, jnp.inf)
                    else:
                        bound = mu * lam_n
                    dl_1 = omega * (-rel(t1_ax, rxa_1, rxb_1)
                                    - cfm_term * lam_1) / d_t1
                    new_1 = jnp.clip(lam_1 + dl_1, -bound, bound)
                    dl_1 = jnp.where(live, new_1 - lam_1, 0.0)
                    lam_1 = lam_1 + dl_1

                    dl_2 = omega * (-rel(t2_ax, rxa_2, rxb_2)
                                    - cfm_term * lam_2) / d_t2
                    new_2 = jnp.clip(lam_2 + dl_2, -bound, bound)
                    dl_2 = jnp.where(live, new_2 - lam_2, 0.0)
                    lam_2 = lam_2 + dl_2
                    imp = n_ax * dl_n + t1_ax * dl_1 + t2_ax * dl_2
                else:
                    imp = n_ax * dl_n                              # (3, C)

                pad2 = jnp.zeros_like(imp[0:2])
                contrib_a = jnp.concatenate(
                    [lin_sc_a * imp, ang_contrib(hop_a, imp), pad2], 0)
                contrib_b = jnp.concatenate(
                    [lin_sc_b * imp, ang_contrib(hop_b, imp), pad2], 0)
                dv = (jnp.dot(contrib_a, sa_s[...],
                              preferred_element_type=vel.dtype)
                      + jnp.dot(contrib_b, sb_s[...],
                                preferred_element_type=vel.dtype))  # (8, N)
                return vel + dv, lam_n, lam_1, lam_2

            lam0 = jnp.zeros((1, c), vel0.dtype)
            v_final, *_ = jax.lax.fori_loop(
                0, iterations, body, (vel0, lam0, lam0, lam0))
            out_ref[w] = v_final

    return kernel


@functools.partial(jax.jit, static_argnames=("config", "interpret"))
def _solve_fused_batched(rows_t, hop, idx_row, idx_col, vel_t,
                         config: EngineConfig, interpret: bool = False):
    """(B, …) component-major packed inputs → (B, 8, N) solved velocities."""
    bsz, _, c = rows_t.shape
    n = vel_t.shape[-1]
    f = vel_t.dtype

    w_block = WORLDS_PER_BLOCK
    pad_b = _round_up(bsz, w_block) - bsz
    if pad_b:
        rows_t, hop, idx_row, idx_col, vel_t = (
            jnp.pad(x, ((0, pad_b),) + ((0, 0),) * (x.ndim - 1))
            for x in (rows_t, hop, idx_row, idx_col, vel_t))
        # padded worlds: idx entries are zero -> slot-0 one-hots, but their
        # rowdata "live" flags are zero so every impulse delta is zero
    grid = (rows_t.shape[0] // w_block,)

    kernel = _kernel_factory(
        n, c, w_block, config.solver_iterations, config.jacobi_omega,
        config.mu, config.friction, config.cfm / config.dt)

    def spec(shape):
        return pl.BlockSpec((w_block,) + shape,
                            lambda i: (i,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec((32, c)),
            spec((2, 16, c)),
            spec((8, c)),
            spec((c, 8)),
            spec((8, n)),
        ],
        out_specs=spec((8, n)),
        out_shape=jax.ShapeDtypeStruct((rows_t.shape[0], 8, n), f),
        scratch_shapes=[
            pltpu.VMEM((n, c), f), pltpu.VMEM((n, c), f),
            pltpu.VMEM((c, n), f), pltpu.VMEM((c, n), f),
        ],
        interpret=interpret,
    )(rows_t, hop, idx_row, idx_col, vel_t)
    return out[:bsz]


def solve_fused(batch_state: WorldState, batch_contacts: Contacts,
                config: EngineConfig, interpret: bool = False) -> WorldState:
    """Batched fused solve: (B, …) state/contacts → state with solved
    velocities. Packs per world with vmap, runs ONE pallas_call."""
    c_pad = _round_up(config.max_contacts, 128)
    rows_t, hop, idx_row, idx_col, vel_t = jax.vmap(
        lambda s, c: _pack_component_major(s, c, config, c_pad)
    )(batch_state, batch_contacts)
    out = _solve_fused_batched(rows_t, hop, idx_row, idx_col, vel_t,
                               config, interpret)
    return batch_state.replace(
        linvel=jnp.swapaxes(out[..., 0:3, :], -1, -2),
        angvel=jnp.swapaxes(out[..., 3:6, :], -1, -2),
    )


def fused_step_batched(batch: WorldState, config: EngineConfig,
                       with_metrics: bool = False, interpret: bool = False):
    """One substep for a (B, …) world batch with the fused solve
    (broadphase/narrowphase/integration identical to ``core.world.step``)."""
    from rl_ode_physics_tpu.ops import broadphase as bp
    from rl_ode_physics_tpu.ops import narrowphase as np_ops
    from rl_ode_physics_tpu.ops import integrator

    if config.typed_buckets:
        contacts, num_pairs = jax.vmap(
            lambda s: np_ops.narrowphase_typed(s, config))(batch)
        pair_overflow = jnp.zeros_like(num_pairs)
    else:
        cand = jax.vmap(lambda s: bp.broadphase(s, config))(batch)
        contacts = jax.vmap(
            lambda s, cd: np_ops.narrowphase(s, cd, config))(batch, cand)
        num_pairs, pair_overflow = cand.count, cand.overflow
    # loud capacity overflow (same accounting as core.world._step_impl)
    batch = batch.replace(
        overflow=batch.overflow + contacts.overflow + pair_overflow)
    batch = jax.vmap(
        lambda s: integrator.apply_external_forces(s, config))(batch)
    batch = solve_fused(batch, contacts, config, interpret)
    batch = jax.vmap(
        lambda s: integrator.integrate_positions(s, config))(batch)
    if not with_metrics:
        return batch
    from rl_ode_physics_tpu.core.world import _base_metrics
    metrics = jax.vmap(lambda s, ct, npair, pov: _base_metrics(
        s, num_pairs=npair, num_contacts=ct.count,
        pair_overflow=pov, contact_overflow=ct.overflow,
        max_penetration=jnp.max(jnp.where(ct.valid, ct.depth, 0.0)),
    ))(batch, contacts, num_pairs, pair_overflow)
    return batch, metrics


def fused_step(state: WorldState, config: EngineConfig,
               with_metrics: bool = False):
    """Single-world FUSED substep (batch of one) — the ``core.world.step``
    entry point when ``config.solver is SolverKind.FUSED``."""
    batch = jax.tree_util.tree_map(lambda x: x[None], state)
    out = fused_step_batched(batch, config, with_metrics=with_metrics)
    if with_metrics:
        batch, metrics = out
        metrics = jax.tree_util.tree_map(lambda x: x[0], metrics)
        return jax.tree_util.tree_map(lambda x: x[0], batch), metrics
    return jax.tree_util.tree_map(lambda x: x[0], out)
