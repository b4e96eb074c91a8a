"""Articulated-body demo: a motorized hinge arm carrying a swinging
ball-joint chain, stepped jitted with joint-force feedback printed.

Shows the beyond-parity joint surface end to end: hinge with motor and
limits, ball links, dAreConnected collision exclusion, and the
dJointGetFeedback analog through ``step_with_diagnostics``.

    python examples/articulated.py [ticks]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(ticks: int = 30):
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from rl_ode_physics_tpu import (
        EngineConfig, BodyType, empty_joints, add_hinge, add_ball,
        set_hinge_motor, set_hinge_limits, hinge_angle,
    )
    from rl_ode_physics_tpu.core.world import step_with_diagnostics
    from rl_ode_physics_tpu.models.builder import WorldBuilder

    cfg = EngineConfig(max_bodies=8, max_pair_candidates=32, max_contacts=32)
    b = WorldBuilder(cfg, 0)
    b.add_body_map((0.0, 4.0, 0.0), (0.0, 0.0, 0.0), (0.3, 0.3, 0.3))
    b.add_body(BodyType.BOX, (1.0, 4.0, 0.0), (1.6, 0.2, 0.2))   # arm
    b.add_body(BodyType.SPHERE, (2.2, 4.0, 0.0), (0.2, 0.0, 0.0))  # link 1
    b.add_body(BodyType.SPHERE, (2.8, 4.0, 0.0), (0.2, 0.0, 0.0))  # link 2
    w = b.finish()

    joints = empty_joints(4)
    joints = add_hinge(joints, w, 0, 0, 1, (0.0, 4.0, 0.0), (0.0, 0.0, 1.0))
    joints = set_hinge_motor(joints, 0, vel=1.5, fmax=80.0)
    joints = set_hinge_limits(joints, 0, lo=-2.0, hi=2.0)
    joints = add_ball(joints, w, 1, 1, 2, (1.9, 4.0, 0.0))
    joints = add_ball(joints, w, 2, 2, 3, (2.5, 4.0, 0.0))

    f = jax.jit(lambda s: step_with_diagnostics(s, cfg, joints=joints))
    for t in range(ticks):
        for _ in range(8):
            w, m = f(w)
        ang = float(hinge_angle(w, joints)[0])
        torque = np.asarray(m["joint_torque_b"][0])
        tip = np.asarray(w.pos[3])
        print(f"tick {t:3d}  hinge angle {ang:+.2f} rad  "
              f"motor torque_z {torque[2]:+7.2f}  "
              f"chain tip ({tip[0]:+.2f}, {tip[1]:+.2f}, {tip[2]:+.2f})")
    print("DONE: arm swept under motor+limits, chain stayed attached "
          f"(tip at {np.linalg.norm(tip):.2f} m from origin)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
