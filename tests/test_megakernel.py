"""Fused Pallas substep solve (SolverKind.FUSED) vs the jnp executable spec.

The kernel must reproduce ``ops.solver.solve_jacobi`` — same mass
splitting, CFM softening, clamp order — on a contact-rich batch. On CPU it
runs in Pallas interpreter mode (the compiled kernel is exercised on real
TPU by bench.py and the driver); math equivalence is what's asserted here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
from rl_ode_physics_tpu.core.world import make_step_fn
from rl_ode_physics_tpu.models import scenes
from rl_ode_physics_tpu.ops import broadphase as bp
from rl_ode_physics_tpu.ops import narrowphase as nphase
from rl_ode_physics_tpu.ops import integrator
from rl_ode_physics_tpu.ops.solver import solve_jacobi
from rl_ode_physics_tpu.ops import megakernel

CFG = EngineConfig(max_bodies=16, max_pair_candidates=64, max_contacts=64)


def _contact_batch(num_worlds=5):
    """A batch of settled contact-rich worlds + their contacts."""
    w = scenes.bench_world(CFG, num_bodies=10, seed=42)
    stepf = make_step_fn(CFG, substeps=1, donate=False)
    for _ in range(250):
        w = stepf(w)
    batch = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * num_worlds), w)
    # decorrelate: per-world height nudges on dynamic bodies
    bump = jnp.arange(num_worlds, dtype=batch.pos.dtype)[:, None] * 0.003
    batch = batch.replace(
        pos=batch.pos.at[:, :, 1].add(bump * (batch.inv_mass > 0)))
    cand = jax.vmap(lambda s: bp.broadphase(s, CFG))(batch)
    contacts = jax.vmap(lambda s, c: nphase.narrowphase(s, c, CFG))(batch, cand)
    batch = jax.vmap(lambda s: integrator.apply_external_forces(s, CFG))(batch)
    return batch, contacts


def test_fused_solve_matches_jacobi():
    batch, contacts = _contact_batch()
    assert int(contacts.count.min()) >= 6

    ref = jax.vmap(lambda s, c: solve_jacobi(s, c, CFG))(batch, contacts)
    out = megakernel.solve_fused(batch, contacts, CFG, interpret=True)

    np.testing.assert_allclose(np.asarray(out.linvel),
                               np.asarray(ref.linvel), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.angvel),
                               np.asarray(ref.angvel), atol=2e-5)


def test_fused_solve_handles_block_padding():
    """Batch size not divisible by WORLDS_PER_BLOCK: padded worlds must not
    corrupt real ones."""
    batch, contacts = _contact_batch(num_worlds=3)   # pads 3 -> 8
    ref = jax.vmap(lambda s, c: solve_jacobi(s, c, CFG))(batch, contacts)
    out = megakernel.solve_fused(batch, contacts, CFG, interpret=True)
    np.testing.assert_allclose(np.asarray(out.linvel),
                               np.asarray(ref.linvel), atol=2e-5)


def test_fused_step_batched_matches_vmap_step():
    """Full substep through the fused path == the regular JACOBI pipeline."""
    batch, _ = _contact_batch(num_worlds=2)
    cfg_j = CFG.replace(solver=SolverKind.JACOBI)

    ref = jax.vmap(lambda s: __import__(
        "rl_ode_physics_tpu.core.world", fromlist=["step"]).step(s, cfg_j)
    )(batch)
    out = megakernel.fused_step_batched(batch, CFG, interpret=True)

    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(ref.pos),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.linvel),
                               np.asarray(ref.linvel), atol=2e-5)


def test_fused_falls_back_off_tpu():
    """On the CPU test platform, FUSED config must still step (via the
    JACOBI fallback) — both through step() and batched_step()."""
    from rl_ode_physics_tpu.parallel.batch import batched_step
    cfg = CFG.replace(solver=SolverKind.FUSED)
    w = scenes.bench_world(cfg, num_bodies=8, seed=1)
    stepped = jax.jit(
        lambda s: __import__(
            "rl_ode_physics_tpu.core.world", fromlist=["step"]).step(s, cfg)
    )(w)
    assert np.isfinite(np.asarray(stepped.pos)).all()
    batch = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), w)
    out = jax.jit(lambda b: batched_step(b, cfg))(batch)
    assert np.isfinite(np.asarray(out.pos)).all()
