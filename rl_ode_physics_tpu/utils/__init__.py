"""Math, PRNG, transform, and host-side utilities."""

from rl_ode_physics_tpu.utils import quat, transforms, prng

__all__ = ["quat", "transforms", "prng"]
