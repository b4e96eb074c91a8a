"""World API: body management and the jitted step composition.

Functional equivalents of the reference's world-management surface:

* ``add_body``      — ``AddBody`` (``src/main.c:695-733``): free-slot scan,
  dynamic body + geom, category/collide masks, optional kinematic flag.
* ``add_body_map``  — ``AddBodyMap`` (``src/main.c:735-761``): static
  (body-less) box geom from pos/Euler/size, used to build the grassPlane
  arena. We implement the *correct* mask semantics (category=MAP,
  collide=ALL); the reference's double-SetCategoryBits typo
  (``src/main.c:751-752``) is observably equivalent (see SURVEY.md §2e).
* ``release_body``  — ``ReleaseBody`` (``src/main.c:763``): frees a slot.
* ``step``          — one 120 Hz substep: the reference's
  ``dSpaceCollide; dWorldStep; dJointGroupEmpty`` triple
  (``src/main.c:212-214``) as ``integrate ∘ solve ∘ narrow ∘ broad ∘ forces``.

All functions are pure (state in → state out) and jit/vmap-safe, including
``add_body``: the free-slot scan is an argmin over the occupancy mask, so
bodies can be spawned *inside* a jitted server tick from a device-side
spawn-request buffer.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
from rl_ode_physics_tpu.core.state import (
    BodyType,
    CollMask,
    WorldState,
    default_mass,
    sphere_mass,
    box_mass,
    capsule_mass,
)
from rl_ode_physics_tpu.ops import broadphase as bp
from rl_ode_physics_tpu.ops import narrowphase as np_ops
from rl_ode_physics_tpu.ops import solver as solver_ops
from rl_ode_physics_tpu.ops import integrator
from rl_ode_physics_tpu.utils import quat as quat_m


# ---------------------------------------------------------------------------
# Body management
# ---------------------------------------------------------------------------

def _free_slot(state: WorldState) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(slot, found): lowest free slot, like the reference's linear scan
    (``src/main.c:696-699``). jit-safe: argmax over the free mask."""
    free = ~state.active
    slot = jnp.argmax(free).astype(jnp.int32)
    found = jnp.any(free)
    return jnp.where(found, slot, -1), found


def _set_slot(state: WorldState, i, **fields) -> WorldState:
    updates = {}
    for name, value in fields.items():
        arr = getattr(state, name)
        updates[name] = arr.at[i].set(jnp.asarray(value, arr.dtype))
    return state.replace(**updates)


def add_body(
    state: WorldState,
    body_type,
    pos,
    size,
    quat=None,
    *,
    category=int(CollMask.OBJ),
    collide=int(CollMask.OBJ) | int(CollMask.MAP),
    kinematic=False,
    color=(255, 255, 255, 255),
    linvel=(0.0, 0.0, 0.0),
    angvel=(0.0, 0.0, 0.0),
    auto_mass: bool = False,
    density: float = 1.0,
) -> Tuple[WorldState, jnp.ndarray]:
    """Spawn a dynamic (or kinematic) body; returns (state, slot|-1).

    Defaults mirror the reference's ``AddBody(…, CMASK_OBJ, CMASK_OBJ |
    CMASK_MAP, …)`` call (``src/main.c:181``). Like the reference — which
    never calls dMassSet* after ``dBodyCreate`` (``src/main.c:703``) — the
    default mass is ODE's dBodyCreate default (m=1, I=identity);
    ``auto_mass=True`` computes physical density-based mass instead.
    """
    slot, found = _free_slot(state)
    i = jnp.where(found, slot, 0)

    dtype = state.pos.dtype
    pos = jnp.asarray(pos, dtype)
    size = jnp.asarray(size, dtype)
    q = quat_m.identity(dtype) if quat is None else jnp.asarray(quat, dtype)
    body_type = jnp.asarray(body_type, jnp.int32)

    if auto_mass:
        m_s, i_s = sphere_mass(size[0], density)
        m_b, i_b = box_mass(size, density)
        m_c, i_c = capsule_mass(size[0], size[1], density)
        is_s = body_type == BodyType.SPHERE
        is_b = body_type == BodyType.BOX
        mass = jnp.where(is_s, m_s, jnp.where(is_b, m_b, m_c))
        inertia = jnp.where(is_s, i_s, jnp.where(is_b, i_b, i_c))
    else:
        mass, inertia = default_mass(dtype)

    inv_mass = jnp.where(kinematic, 0.0, 1.0 / mass)
    inv_inertia = jnp.where(kinematic, jnp.zeros(3, dtype), 1.0 / inertia)

    new = _set_slot(
        state, i,
        pos=pos, quat=q, size=size,
        linvel=jnp.asarray(linvel, dtype), angvel=jnp.asarray(angvel, dtype),
        force=jnp.zeros(3, dtype), torque=jnp.zeros(3, dtype),
        inv_mass=inv_mass, inv_inertia=inv_inertia,
        body_type=body_type,
        category=jnp.asarray(category, jnp.uint32),
        collide=jnp.asarray(collide, jnp.uint32),
        is_static=False, is_kinematic=bool(kinematic),
        color=jnp.asarray(color, jnp.uint8),
    )
    state = jax.tree_util.tree_map(
        lambda n, o: jnp.where(found, n, o), new, state
    )
    return state, jnp.where(found, slot, -1)


def add_body_map(
    state: WorldState,
    pos,
    rot_euler,
    size,
    color=(80, 80, 80, 255),
) -> Tuple[WorldState, jnp.ndarray]:
    """Static box geom for the arena — ``AddBodyMap`` (``src/main.c:735``).

    Static geoms have no body (``body->body = NULL``, ``src/main.c:753``):
    here that is ``is_static=True`` with zero inverse mass/inertia.
    Orientation comes from Euler XYZ angles like ``GetTransformMatV``.
    """
    slot, found = _free_slot(state)
    i = jnp.where(found, slot, 0)
    dtype = state.pos.dtype

    q = quat_m.from_euler_xyz(jnp.asarray(rot_euler, dtype))
    new = _set_slot(
        state, i,
        pos=jnp.asarray(pos, dtype), quat=q, size=jnp.asarray(size, dtype),
        linvel=jnp.zeros(3, dtype), angvel=jnp.zeros(3, dtype),
        force=jnp.zeros(3, dtype), torque=jnp.zeros(3, dtype),
        inv_mass=0.0, inv_inertia=jnp.zeros(3, dtype),
        body_type=int(BodyType.BOX),
        category=jnp.asarray(int(CollMask.MAP), jnp.uint32),
        collide=jnp.asarray(int(CollMask.ALL) & 0xFFFFFFFF, jnp.uint32),
        is_static=True, is_kinematic=False,
        color=jnp.asarray(color, jnp.uint8),
    )
    state = jax.tree_util.tree_map(
        lambda n, o: jnp.where(found, n, o), new, state
    )
    return state, jnp.where(found, slot, -1)


def release_body(state: WorldState, slot) -> WorldState:
    """Free a slot (``ReleaseBody``, ``src/main.c:763``): type → NULL."""
    return _set_slot(state, slot, body_type=int(BodyType.NULL))


def set_body_pose(state: WorldState, slot, pos=None, quat=None,
                  linvel=None, angvel=None) -> WorldState:
    """dBodySetPosition/Rotation/LinearVel analog for one slot (jit-safe).

    Used for kinematic bodies (player capsules) driven by external targets.
    """
    updates = {}
    if pos is not None:
        updates["pos"] = state.pos.at[slot].set(
            jnp.asarray(pos, state.pos.dtype))
    if quat is not None:
        updates["quat"] = state.quat.at[slot].set(
            jnp.asarray(quat, state.quat.dtype))
    if linvel is not None:
        updates["linvel"] = state.linvel.at[slot].set(
            jnp.asarray(linvel, state.linvel.dtype))
    if angvel is not None:
        updates["angvel"] = state.angvel.at[slot].set(
            jnp.asarray(angvel, state.angvel.dtype))
    return state.replace(**updates)


def set_body_surface(state: WorldState, slot, friction=None,
                     restitution=None) -> WorldState:
    """Per-body contact surface parameters (used when
    ``EngineConfig.per_body_surface`` is on; pair mixing is min(friction),
    max(restitution)). The ODE analog is setting dSurfaceParameters per
    contact in the NearCallback."""
    updates = {}
    if friction is not None:
        updates["friction"] = state.friction.at[slot].set(
            jnp.asarray(friction, state.friction.dtype))
    if restitution is not None:
        updates["restitution"] = state.restitution.at[slot].set(
            jnp.asarray(restitution, state.restitution.dtype))
    return state.replace(**updates)


def add_force(state: WorldState, slot, force) -> WorldState:
    """dBodyAddForce analog (accumulator, cleared by the integrator)."""
    return state.replace(
        force=state.force.at[slot].add(jnp.asarray(force, state.force.dtype))
    )


def add_torque(state: WorldState, slot, torque) -> WorldState:
    return state.replace(
        torque=state.torque.at[slot].add(jnp.asarray(torque, state.torque.dtype))
    )


# ---------------------------------------------------------------------------
# Step composition
# ---------------------------------------------------------------------------

def _pallas_available() -> bool:
    """Mosaic kernels need a real TPU backend (the fast trimesh path)."""
    import jax
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def step(state: WorldState, config: EngineConfig, trimesh=None,
         use_pallas=None, joints=None) -> WorldState:
    """One fixed 120 Hz substep (``src/main.c:212-214`` pipeline).

    collide-then-step like ODE: contacts are generated from current
    positions, forces/gravity advance velocities, the solver corrects them
    impulsively, positions integrate with the corrected velocities. Contacts
    are per-step transients (no warm starting) — matching the reference's
    ``dJointGroupEmpty`` every substep.

    ``trimesh``: optional static ``ops.trimesh.TriMesh`` (e.g. the teapot);
    its contacts merge into the same solver buffer. ``joints``: optional
    ``ops.joints.JointSet`` of bilateral (ball/hinge) constraints solved
    interleaved with the contact rows (beyond-parity capability — the
    reference uses contact joints only).
    """
    import contextlib
    prec = (jax.default_matmul_precision(config.matmul_precision)
            if config.matmul_precision != "default" else contextlib.nullcontext())
    with prec:
        return _step_impl(state, config, trimesh, use_pallas, joints=joints)


def _step_impl(state: WorldState, config: EngineConfig, trimesh,
               use_pallas, with_metrics: bool = False, joints=None):
    if config.dense_pipeline and trimesh is None:
        from rl_ode_physics_tpu.ops import dense
        manifold = dense.dense_narrowphase(state, config)
        state = integrator.apply_external_forces(state, config)
        state = dense.dense_solve(state, manifold, config)
        state = integrator.integrate_positions(state, config)
        if not with_metrics:
            return state
        _, _, depths, valid = manifold
        zero = jnp.zeros((), jnp.int32)
        return state, _base_metrics(
            state,
            num_pairs=jnp.sum(jnp.any(valid, axis=-1).astype(jnp.int32)),
            num_contacts=jnp.sum(valid.astype(jnp.int32)),
            pair_overflow=zero,        # dense pipeline has no capacity drops
            contact_overflow=zero,
            max_penetration=jnp.max(jnp.where(valid, depths, 0.0)),
        )

    exclude = None
    if joints is not None:
        from rl_ode_physics_tpu.ops.joints import connected_mask
        exclude = connected_mask(joints, state.num_slots)
    extra = None
    if trimesh is not None:
        from rl_ode_physics_tpu.ops.trimesh import mesh_narrowphase
        if use_pallas is None:          # auto: Pallas sweep is 2x on TPU
            use_pallas = _pallas_available()
        extra = mesh_narrowphase(state, trimesh, config,
                                 use_pallas=use_pallas)
    if config.typed_buckets:
        contacts, num_pairs = np_ops.narrowphase_typed(state, config, extra,
                                                       exclude=exclude)
        pair_overflow = jnp.zeros((), jnp.int32)   # folded into contacts.overflow
    else:
        cand = bp.broadphase(state, config, exclude=exclude)
        contacts = np_ops.narrowphase(state, cand, config, extra)
        num_pairs, pair_overflow = cand.count, cand.overflow
    joints_rows = None
    if joints is not None:
        from rl_ode_physics_tpu.ops.joints import joint_rows
        joints_rows = joint_rows(state, joints, config)
    # loud capacity overflow: dropped pairs/contacts accumulate on the
    # state itself, so overflow is observable without diagnostics mode
    state = state.replace(
        overflow=state.overflow + contacts.overflow + pair_overflow)
    state = integrator.apply_external_forces(state, config)
    joint_fb = None
    if (joints_rows is not None and with_metrics
            and config.solver not in (SolverKind.PGS, SolverKind.DANTZIG)):
        # dJointGetFeedback analog: solved joint impulses → per-joint
        # constraint forces/torques in the diagnostics stream
        from rl_ode_physics_tpu.ops.joints import feedback
        state, jlam = solver_ops.solve_jacobi(
            state, contacts, config, joints_rows=joints_rows,
            return_joint_lam=True)
        joint_fb = feedback(joints_rows, jlam, config.dt)
    else:
        state = solver_ops.solve(state, contacts, config, joints_rows)
    state = integrator.integrate_positions(state, config)
    if not with_metrics:
        return state
    metrics = _base_metrics(
        state,
        num_pairs=num_pairs,
        num_contacts=contacts.count,
        pair_overflow=pair_overflow,
        contact_overflow=contacts.overflow,
        max_penetration=jnp.max(jnp.where(contacts.valid, contacts.depth, 0.0)),
    )
    if joint_fb is not None:
        metrics.update({f"joint_{k}": v for k, v in joint_fb.items()})
    return state, metrics


def _base_metrics(state: WorldState, **counters):
    """Per-tick observability counters (SURVEY.md §5 metrics plan)."""
    dyn = state.dynamic
    m = jnp.where(state.inv_mass > 0, 1.0 / jnp.maximum(state.inv_mass, 1e-30), 0.0)
    kinetic = 0.5 * jnp.sum(
        m * jnp.where(dyn, jnp.sum(state.linvel**2, axis=-1), 0.0)
    )
    counters.update(
        kinetic_energy=kinetic,
        num_bodies=jnp.sum(dyn.astype(jnp.int32)),
    )
    return counters


def step_with_diagnostics(state: WorldState, config: EngineConfig,
                          trimesh=None, use_pallas=None, joints=None):
    """``step()`` that also returns per-tick observability counters.

    Delegates to the same ``_step_impl`` as production stepping — trimesh
    and dense-pipeline aware, so diagnostics mode never runs a different
    pipeline than ``step`` (same matmul-precision scope included).
    """
    import contextlib
    prec = (jax.default_matmul_precision(config.matmul_precision)
            if config.matmul_precision != "default" else contextlib.nullcontext())
    with prec:
        return _step_impl(state, config, trimesh, use_pallas,
                          with_metrics=True, joints=joints)


def make_step_fn(config: EngineConfig, substeps: int = 1, donate: bool = True,
                 trimesh=None, use_pallas=None, joints=None):
    """Compile a (possibly multi-substep) step: state → state.

    ``substeps > 1`` rolls the fixed-dt substep loop into the compiled
    program with ``lax.scan`` (the accumulator loop of ``src/main.c:211-216``
    without host round-trips — on TPU the whole 120 Hz cadence between 60 Hz
    snapshots is one device launch). ``donate`` enables XLA buffer donation
    so the world state updates in place in HBM. ``trimesh`` (a static
    ``TriMesh``) is baked into the compiled program as constants.

    Unsupported feature compositions error HERE (config time), not
    mid-trace: ``EngineConfig.validate`` / docs/API.md capability matrix.
    """
    config.validate()
    if trimesh is None and joints is None:
        # hashable args → share compilations across callers
        return _make_step_fn_cached(config, substeps, donate)

    def fn(state: WorldState) -> WorldState:
        if substeps == 1:
            return step(state, config, trimesh, use_pallas, joints)
        def body(s, _):
            return step(s, config, trimesh, use_pallas, joints), None
        state, _ = jax.lax.scan(body, state, None, length=substeps)
        return state

    return jax.jit(fn, donate_argnums=(0,) if donate else ())


# bounded: a config sweep (e.g. the bench's env-override space) would
# otherwise retain every compiled step for the process lifetime
@functools.lru_cache(maxsize=64)
def _make_step_fn_cached(config: EngineConfig, substeps: int, donate: bool):
    def fn(state: WorldState) -> WorldState:
        if substeps == 1:
            return step(state, config)
        def body(s, _):
            return step(s, config), None
        state, _ = jax.lax.scan(body, state, None, length=substeps)
        return state

    return jax.jit(fn, donate_argnums=(0,) if donate else ())
