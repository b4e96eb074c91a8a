"""Semi-implicit (symplectic) Euler integrator.

TPU-native replacement for the integration stage inside ODE's
``dWorldStep``/``dWorldQuickStep`` (driven by the reference at
``src/main.c:213``): velocities first absorb external forces and gravity,
the contact solver then corrects velocities impulsively, and positions
finally advance with the *new* velocities — the standard ODE ordering.

All operations are masked elementwise tensor math over the (N, …) SoA state:
no per-body control flow, fully fusable by XLA, identical math under vmap
across the world batch.
"""

from __future__ import annotations

import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import WorldState, world_inv_inertia
from rl_ode_physics_tpu.utils import quat as quat_m


def apply_external_forces(state: WorldState, config: EngineConfig) -> WorldState:
    """v ← v + dt·(g + M⁻¹f);  ω ← ω + dt·I⁻¹(τ − ω×(Iω)).

    Gravity applies only to dynamic, non-kinematic bodies (ODE kinematic
    bodies ignore gravity; the reference marks kinematics via
    ``dBodySetKinematic``, ``src/main.c:712``). The gyroscopic (Euler
    equation) term ω×(Iω) matches ODE's default gyroscopic mode.
    """
    dt = jnp.asarray(config.dt, state.pos.dtype)
    dyn = (state.dynamic & ~state.is_kinematic)[..., None]

    g = jnp.asarray(config.gravity, state.pos.dtype)
    linvel = state.linvel + dt * (
        jnp.where(dyn, g, 0.0) + state.inv_mass[..., None] * state.force
    )

    # world-frame inertia and its inverse from the body-frame diagonal
    from rl_ode_physics_tpu.core.state import similarity_diag

    r = quat_m.to_matrix(state.quat)
    inv_i_world = similarity_diag(r, state.inv_inertia)
    i_body = jnp.where(state.inv_inertia > 0, 1.0 / jnp.maximum(state.inv_inertia, 1e-30), 0.0)
    i_world = similarity_diag(r, i_body)

    ang_mom = jnp.sum(i_world * state.angvel[..., None, :], axis=-1)
    gyro = jnp.cross(state.angvel, ang_mom)
    torque = state.torque - gyro
    angvel = state.angvel + dt * jnp.sum(
        inv_i_world * torque[..., None, :], axis=-1)
    # Zero-inertia (static/kinematic) rows have inv_i_world = 0 → unchanged.

    return state.replace(linvel=linvel, angvel=angvel)


def integrate_positions(state: WorldState, config: EngineConfig) -> WorldState:
    """x ← x + dt·v;  q ← normalize(q + dt/2·ω⊗q). Clears force accumulators
    (the per-step transient contract, like ``dJointGroupEmpty`` at
    ``src/main.c:214`` clears per-step contacts)."""
    dt = jnp.asarray(config.dt, state.pos.dtype)
    moving = (state.active & ~state.is_static)[..., None]

    pos = state.pos + jnp.where(moving, dt * state.linvel, 0.0)
    new_quat = quat_m.integrate(state.quat, state.angvel, dt)
    quat = jnp.where(moving, new_quat, state.quat)

    return state.replace(
        pos=pos,
        quat=quat,
        force=jnp.zeros_like(state.force),
        torque=jnp.zeros_like(state.torque),
        tick=state.tick + 1,
    )
