"""Multi-chip RL TRAINING: the ES trainer's population worlds shard over a
jax.sharding.Mesh (the same batch sharding as the stepping paths,
parallel/mesh.py) and one jitted train step runs SPMD across the devices —
rollouts stay device-local; the reward normalization and gradient-estimate
reductions are the only collectives (GSPMD-inserted).

Runs on the virtual 8-device CPU mesh (tests/conftest.py); the driver's
dryrun validates the stepping path the same way."""

import jax
import numpy as np

from examples.rl_training import make_trainer
from rl_ode_physics_tpu.parallel.mesh import make_mesh


def test_sharded_es_train_step_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest provides the 8-device mesh"
    key = jax.random.PRNGKey(0)

    params_s, step_s = make_trainer(pop=12, horizon=8)       # single device
    mesh = make_mesh(jax.devices()[:8])
    params_m, step_m = make_trainer(pop=12, horizon=8, mesh=mesh)

    k1, k2 = jax.random.split(key)
    for k in (k1, k2):
        params_s, r_s = step_s(params_s, k)
        params_m, r_m = step_m(params_m, k)
    # same math, different reduction layout: allclose, not bitwise
    np.testing.assert_allclose(float(r_s), float(r_m), rtol=1e-5, atol=1e-5)
    for a, b in zip(params_s, params_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # the sharded step really ran on the full 8-device mesh
    assert len(mesh.devices.ravel()) == 8
    assert np.isfinite(float(r_m))
