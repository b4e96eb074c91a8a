"""Component-major narrowphase (ops/narrowphase_cm.py) equivalence vs the
row-major typed-bucket path it replaces on the throughput pipeline.

The CM path computes the SAME manifolds with the same formulas in a
different data layout; within-bucket row ORDER is slot-major instead of
pair-major, so contacts are compared as key-indexed SETS (the warm-start
key (a·N + b)·K + slot names a physical contact uniquely), with values
allclose at f32 roundoff (reduction orders differ inside dots/norms).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
from rl_ode_physics_tpu.core.state import BodyType
from rl_ode_physics_tpu.core.world import make_step_fn
from rl_ode_physics_tpu.models import scenes
from rl_ode_physics_tpu.ops import narrowphase as np_ops
from rl_ode_physics_tpu.ops import narrowphase_cm as cm


BASE = dict(max_bodies=32, max_pair_candidates=256, max_contacts=256,
            typed_buckets=True, max_contacts_per_pair=4)


def _mixed_world(cfg, seed=0, capsules=True):
    """Contact-rich random pile: floor + boxes + spheres (+ capsules)."""
    rng = np.random.default_rng(seed)
    b = scenes.WorldBuilder(cfg, 0)
    b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (40.0, 1.0, 40.0))
    kinds = [BodyType.BOX, BodyType.SPHERE]
    if capsules:
        kinds.append(BodyType.CAPSULE)
    for i in range(24):
        kind = kinds[i % len(kinds)]
        pos = (float(rng.uniform(-2, 2)), float(rng.uniform(0.8, 3.0)),
               float(rng.uniform(-2, 2)))
        q = rng.normal(size=4)
        q = tuple(q / np.linalg.norm(q))
        if kind == BodyType.SPHERE:
            size = (float(rng.uniform(0.2, 0.5)), 0.0, 0.0)
        elif kind == BodyType.BOX:
            size = tuple(float(rng.uniform(0.3, 0.9)) for _ in range(3))
        else:
            size = (float(rng.uniform(0.15, 0.3)),
                    float(rng.uniform(0.4, 1.0)), 0.0)
        b.add_body(kind, pos, size, quat=q)
    return b.finish()


def _contact_dict(c, n, k):
    """key → (point, normal, depth) for valid rows."""
    valid = np.asarray(c.valid)
    key = np.asarray(c.key)
    out = {}
    for i in np.nonzero(valid)[0]:
        out[int(key[i])] = (np.asarray(c.point[i]), np.asarray(c.normal[i]),
                            float(c.depth[i]))
    return out


@pytest.mark.parametrize("capsules", [False, True])
@pytest.mark.slow
def test_cm_contacts_match_row_major(capsules):
    cfg_rm = EngineConfig(cm_narrowphase=False, enable_planes=False,
                          enable_capsules=capsules, **BASE)
    cfg_cm = cfg_rm.replace(cm_narrowphase=True)
    assert cm.supports_cm(cfg_cm)

    for seed in (0, 1, 2):
        w = _mixed_world(cfg_rm, seed=seed, capsules=capsules)
        # settle into a pile so manifolds include deep/box-box/edge cases
        stepf = make_step_fn(cfg_rm, substeps=30, donate=False)
        for _ in range(4):
            w = stepf(w)

        c_rm, np_rm = np_ops.narrowphase_typed(w, cfg_rm)
        c_cm, np_cm = cm.narrowphase_typed_cm(w, cfg_cm)
        assert int(np_rm) == int(np_cm)
        assert int(c_rm.overflow) == int(c_cm.overflow) == 0

        d_rm = _contact_dict(c_rm, cfg_rm.max_bodies, 4)
        d_cm = _contact_dict(c_cm, cfg_rm.max_bodies, 4)
        # validity may flip between layouts ONLY for grazing contacts
        # (depth within f32 roundoff of 0 — reduction order differs)
        graze = 1e-5
        for key in set(d_rm) ^ set(d_cm):
            dep = (d_rm.get(key) or d_cm.get(key))[2]
            assert abs(dep) < graze, (seed, key, dep)
        both = set(d_rm) & set(d_cm)
        assert len(both) >= 10, seed          # the scene is contact-rich
        for key in both:
            p0, n0, dep0 = d_rm[key]
            p1, n1, dep1 = d_cm[key]
            np.testing.assert_allclose(p0, p1, rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(n0, n1, rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(dep0, dep1, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_cm_trajectory_matches_row_major():
    """300 substeps of the bench-style scene: resting heights and energy
    must agree to f32-trajectory tolerance between the two layouts."""
    cfg_rm = EngineConfig(cm_narrowphase=False, enable_planes=False,
                          enable_capsules=False,
                          solver=SolverKind.JACOBI, **BASE)
    cfg_cm = cfg_rm.replace(cm_narrowphase=True)
    w0 = _mixed_world(cfg_rm, seed=3, capsules=False)
    f_rm = make_step_fn(cfg_rm, substeps=10, donate=False)
    f_cm = make_step_fn(cfg_cm, substeps=10, donate=False)
    w_rm, w_cm = w0, w0
    for _ in range(30):
        w_rm = f_rm(w_rm)
        w_cm = f_cm(w_cm)
    h_rm = np.sort(np.asarray(w_rm.pos)[:, 1])
    h_cm = np.sort(np.asarray(w_cm.pos)[:, 1])
    np.testing.assert_allclose(h_rm, h_cm, atol=5e-2)
    assert int(w_cm.overflow) == 0


def test_cm_fallback_conditions():
    cfg = EngineConfig(**BASE)
    assert cm.supports_cm(cfg)
    # exact clip is conformance-only → row-major
    assert not cm.supports_cm(cfg.replace(exact_box_clip=True))
    # general deepest-k (K=2 on an 8-slot box-box manifold) → row-major
    assert not cm.supports_cm(cfg.replace(max_contacts_per_pair=2))
    # K=8 keeps every slot → supported
    assert cm.supports_cm(cfg.replace(max_contacts_per_pair=8))


@pytest.mark.slow
def test_cm_with_planes_and_k8():
    """Plane kernels + K=8 (no folding) path."""
    cfg_rm = EngineConfig(max_bodies=16, max_pair_candidates=64,
                          max_contacts=128, typed_buckets=True,
                          max_contacts_per_pair=8, cm_narrowphase=False)
    cfg_cm = cfg_rm.replace(cm_narrowphase=True)
    assert cm.supports_cm(cfg_cm)
    b = scenes.WorldBuilder(cfg_rm, 0)
    # a true PLANE body + mixed dynamics above it
    b.add_body(BodyType.PLANE, (0.0, 0.0, 0.0), (0.0, 0.0, 0.0),
               kinematic=True)
    rng = np.random.default_rng(7)
    for i in range(8):
        kind = (BodyType.BOX, BodyType.SPHERE, BodyType.CAPSULE)[i % 3]
        size = ((0.4, 0.5, 0.6) if kind == BodyType.BOX
                else (0.3, 0.8, 0.0) if kind == BodyType.CAPSULE
                else (0.3, 0.0, 0.0))
        b.add_body(kind, (float(rng.uniform(-1, 1)), 0.1 + 0.3 * i,
                          float(rng.uniform(-1, 1))), size)
    w = b.finish()
    c_rm, _ = np_ops.narrowphase_typed(w, cfg_rm)
    c_cm, _ = cm.narrowphase_typed_cm(w, cfg_cm)
    assert int(c_rm.count) == int(c_cm.count) > 0
    d_rm = _contact_dict(c_rm, 16, 8)
    d_cm = _contact_dict(c_cm, 16, 8)
    assert set(d_rm) == set(d_cm)
    for key in d_rm:
        np.testing.assert_allclose(d_rm[key][0], d_cm[key][0],
                                   rtol=1e-5, atol=1e-5)
