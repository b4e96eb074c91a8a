"""rl_ode_physics_tpu — a TPU-native rigid-body dynamics framework.

A from-scratch reimplementation of the capabilities of the reference
``cyprus327/rl-ode-physics`` game and the Open Dynamics Engine (ODE) core it
drives, redesigned for TPUs:

* fixed-shape, batched physics worlds (SoA pytrees) stepped by a pure,
  ``jax.jit``-compiled function and ``jax.vmap``-ed across thousands of
  independent worlds,
* masked all-pairs broadphase with ODE-compatible category/collide bitmask
  filtering (reference: ``src/main.c:724-725``),
* primitive narrowphase (sphere/box/capsule/plane/trimesh) producing
  static-capacity contact buffers (reference contract: 8 contacts/pair,
  ``src/main.c:675``),
* a QuickStep-class projected Gauss-Seidel / Jacobi contact solver with
  ERP/CFM regularization, restitution (bounce=0.2, bounce_vel=0.1) and the
  reference's mu=infinity friction (``src/main.c:684-687``),
* semi-implicit Euler integration with gravity (0, -9.8, 0)
  (``src/main.c:96``),
* multi-chip scaling by sharding the world batch over a
  ``jax.sharding.Mesh`` (ICI), and
* a host-side authoritative-server / snapshot-replication layer mirroring the
  reference's ENet protocol (``inc/msgs.h``).
"""

from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
from rl_ode_physics_tpu.core.state import (
    BodyType,
    CollMask,
    WorldState,
    create_world,
)
from rl_ode_physics_tpu.core.world import (
    add_body,
    add_body_map,
    add_force,
    add_torque,
    release_body,
    set_body_pose,
    set_body_surface,
    step,
    step_with_diagnostics,
    make_step_fn,
)

__version__ = "0.1.0"

__all__ = [
    "EngineConfig",
    "SolverKind",
    "BodyType",
    "CollMask",
    "WorldState",
    "create_world",
    "add_body",
    "add_body_map",
    "add_force",
    "add_torque",
    "release_body",
    "set_body_pose",
    "set_body_surface",
    "step",
    "step_with_diagnostics",
    "make_step_fn",
    "JointSet",
    "empty_joints",
    "add_ball",
    "add_hinge",
    "add_fixed",
    "add_slider",
    "add_universal",
    "set_hinge_limits",
    "set_hinge_motor",
    "hinge_angle",
    "slider_position",
    "joint_feedback",
    "raycast",
    "raycast_mesh",
    "RayHits",
    "__version__",
]

from rl_ode_physics_tpu.ops.joints import (   # noqa: E402
    JointSet,
    empty_joints,
    add_ball,
    add_hinge,
    add_fixed,
    add_slider,
    add_universal,
    set_hinge_limits,
    set_hinge_motor,
    hinge_angle,
    slider_position,
    feedback as joint_feedback,
)
from rl_ode_physics_tpu.ops.raycast import (   # noqa: E402
    RayHits,
    raycast,
    raycast_mesh,
)
