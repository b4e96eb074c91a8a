"""Validation oracles: independent host-side implementations used as
referees for trajectory-level conformance testing (BASELINE: <=1e-5
relative trajectory error vs ODE QuickStep over 1k steps).

The environment ships no ODE binding, so ``referee.py`` is a from-spec,
scalar-loop, float64 NumPy implementation of the documented QuickStep
pipeline — a genuinely separate second implementation of the same
contract the TPU engine implements (vectorized, masked, compiled).
"""

from rl_ode_physics_tpu.testing.referee import RefereeConfig, referee_step, state_to_numpy

__all__ = ["RefereeConfig", "referee_step", "state_to_numpy"]
