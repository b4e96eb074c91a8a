"""Dense all-pairs pipeline (experimental): equivalence with the sparse
compacted pipeline on settling behavior."""

import numpy as np
import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import BodyType
from rl_ode_physics_tpu.core.world import add_body, make_step_fn
from rl_ode_physics_tpu.models import scenes

BASE = dict(max_bodies=8, max_pair_candidates=32, max_contacts=64)


def _run(dense: bool):
    cfg = EngineConfig(**BASE, dense_pipeline=dense)
    w = scenes.grass_plane_world(cfg)
    w, _ = add_body(w, BodyType.SPHERE, (0.0, 2.0, 0.0), (0.15, 0, 0))
    for i in range(2):
        w, _ = add_body(w, BodyType.BOX, (2.0, 1.0 + i * 1.01, 0.0),
                        (1.0, 1.0, 1.0))
    stepf = make_step_fn(cfg, substeps=12, donate=False)
    for _ in range(35):
        w = stepf(w)
    return w


def test_dense_matches_sparse_equilibria():
    ws = _run(False)
    wd = _run(True)
    # same resting configuration (solvers see identical contact sets; the
    # two pipelines only organize them differently)
    assert abs(float(wd.pos[4, 1]) - 0.65) < 5e-3
    assert np.allclose(np.asarray(ws.pos[4:7]), np.asarray(wd.pos[4:7]),
                       atol=0.02)
    assert np.all(np.isfinite(np.asarray(wd.pos)))
