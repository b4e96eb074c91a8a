"""Windowed sweep-and-prune pair phase (``EngineConfig.sap_window``) vs the
dense all-pairs eligibility it replaces.

SAP assigns contact (a, b) roles by sorted-x order instead of slot order,
so row-for-row equality only holds where the pair kernel is symmetric:

* spheres-only scene → contacts compared as canonicalized key sets with
  exact (point, depth) agreement and sign-fixed normals;
* mixed box/sphere/capsule pile → trajectory-level equivalence over 60
  steps (box-box SAT role swaps move clip points at roundoff level; the
  solve amplifies that slightly, so tolerance is loose but the piles must
  settle identically);
* a too-small window must COUNT its misses loudly into
  ``WorldState.overflow`` (same policy as the contact caps).
"""

import jax
import numpy as np

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import BodyType
from rl_ode_physics_tpu.core.world import make_step_fn
from rl_ode_physics_tpu.models import scenes
from rl_ode_physics_tpu.ops import narrowphase as np_ops
import pytest

BASE = dict(max_bodies=32, max_pair_candidates=256, max_contacts=256,
            typed_buckets=True, cm_narrowphase=True,
            max_contacts_per_pair=4, selector_dtype="float32")


def _sphere_pile(cfg, seed=3, n=20):
    rng = np.random.default_rng(seed)
    b = scenes.WorldBuilder(cfg, 0)
    b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (40.0, 1.0, 40.0))
    for _ in range(n):
        b.add_body(BodyType.SPHERE,
                   (float(rng.uniform(-1.5, 1.5)),
                    float(rng.uniform(0.7, 2.5)),
                    float(rng.uniform(-1.5, 1.5))),
                   (float(rng.uniform(0.25, 0.5)), 0.0, 0.0))
    return b.finish()


def _mixed_pile(cfg, seed=11):
    rng = np.random.default_rng(seed)
    b = scenes.WorldBuilder(cfg, 0)
    b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (40.0, 1.0, 40.0))
    kinds = [BodyType.BOX, BodyType.SPHERE, BodyType.CAPSULE]
    for i in range(22):
        kind = kinds[i % 3]
        pos = (float(rng.uniform(-2, 2)), float(rng.uniform(0.8, 3.0)),
               float(rng.uniform(-2, 2)))
        if kind == BodyType.SPHERE:
            size = (float(rng.uniform(0.2, 0.5)), 0.0, 0.0)
        elif kind == BodyType.BOX:
            size = tuple(float(rng.uniform(0.3, 0.9)) for _ in range(3))
        else:
            size = (float(rng.uniform(0.15, 0.3)),
                    float(rng.uniform(0.4, 1.0)), 0.0)
        b.add_body(kind, pos, size)
    return b.finish()


def _canon_contacts(c, n, k):
    """{(min(a,b), max(a,b), slot) → (point, sign-fixed normal, depth)}."""
    valid = np.asarray(c.valid)
    a = np.asarray(c.a)
    b = np.asarray(c.b)
    slot = (np.asarray(c.key) % k)
    pts, nrm, dep = (np.asarray(c.point), np.asarray(c.normal),
                     np.asarray(c.depth))
    out = {}
    for i in np.nonzero(valid)[0]:
        lo_, hi_ = sorted((int(a[i]), int(b[i])))
        sign = 1.0 if int(a[i]) == lo_ else -1.0
        out[(lo_, hi_, int(slot[i]))] = (pts[i], sign * nrm[i], dep[i])
    return out


@pytest.mark.slow
def test_sap_matches_dense_sphere_pile():
    cfg_d = EngineConfig(**BASE)
    cfg_s = cfg_d.replace(sap_window=12)
    w = _sphere_pile(cfg_d)
    c_d, _ = jax.jit(lambda s: np_ops.narrowphase_typed(s, cfg_d))(w)
    c_s, _ = jax.jit(lambda s: np_ops.narrowphase_typed(s, cfg_s))(w)
    assert int(np.asarray(c_s.overflow)) == 0
    d_d = _canon_contacts(c_d, 32, 4)
    d_s = _canon_contacts(c_s, 32, 4)
    assert len(d_d) > 5, "scene should be contact-rich"
    assert set(d_d) == set(d_s)
    for key_ in d_d:
        for v_d, v_s in zip(d_d[key_], d_s[key_]):
            np.testing.assert_allclose(v_d, v_s, rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_sap_trajectory_matches_dense_mixed_pile():
    cfg_d = EngineConfig(**BASE)
    cfg_s = cfg_d.replace(sap_window=20)
    w0 = _mixed_pile(cfg_d)
    step_d = make_step_fn(cfg_d, substeps=1, donate=False)
    step_s = make_step_fn(cfg_s, substeps=1, donate=False)
    w_d, w_s = w0, w0
    for _ in range(60):
        w_d = step_d(w_d)
        w_s = step_s(w_s)
    assert int(np.asarray(w_s.overflow)) == 0
    p_d, p_s = np.asarray(w_d.pos), np.asarray(w_s.pos)
    # box-box SAT role swaps differ at clip-point roundoff; 60 solved
    # steps amplify that, but the piles must settle the same way
    np.testing.assert_allclose(p_d, p_s, atol=5e-3)
    assert np.abs(p_s).max() < 10.0


@pytest.mark.slow
def test_sap_window_miss_is_loud():
    """A window too small for the scene's x-overlap occupancy must count
    misses into overflow — never silently drop pairs."""
    # sap_broad=1: only the floor leaves the window path — the default
    # broad capacity (8) would otherwise absorb the whole degenerate
    # column into dense columns and legitimately cover every pair
    cfg_s = EngineConfig(**BASE, sap_window=2, sap_broad=1)
    # 8 spheres sharing one x-column: every pair x-overlaps, window 2
    # cannot reach them all
    b = scenes.WorldBuilder(cfg_s, 0)
    b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (40.0, 1.0, 40.0))
    for i in range(8):
        b.add_body(BodyType.SPHERE, (0.0, 0.8 + 0.3 * i, 0.0),
                   (0.3, 0.0, 0.0))
    w = b.finish()
    c_s, _ = jax.jit(lambda s: np_ops.narrowphase_typed(s, cfg_s))(w)
    assert int(np.asarray(c_s.overflow)) > 0


def test_sap_config_validation():
    import pytest
    with pytest.raises(ValueError, match="sap_window"):
        EngineConfig(**BASE, sap_window=40).validate()     # >= max_bodies
    with pytest.raises(ValueError, match="sap_window"):
        EngineConfig(max_bodies=32, max_pair_candidates=256,
                     max_contacts=256, typed_buckets=False,
                     sap_window=8).validate()


@pytest.mark.slow
def test_sap_composes_with_trimesh_extra():
    """Static-trimesh manifolds enter narrowphase_typed as the ``extra``
    payload, independent of the pair phase — SAP must compose: same mesh
    contact rows, same primitive pairs, zero overflow."""
    from rl_ode_physics_tpu.models.scenes import ridge_mesh_scene

    cfg_d = EngineConfig(max_bodies=16, max_pair_candidates=128,
                         max_contacts=128, typed_buckets=True,
                         cm_narrowphase=True, max_contacts_per_pair=4,
                         selector_dtype="float32")
    cfg_s = cfg_d.replace(sap_window=6, sap_broad=2)
    state, mesh = ridge_mesh_scene(cfg_d)
    step_d = make_step_fn(cfg_d, substeps=1, donate=False, trimesh=mesh,
                          use_pallas=False)
    step_s = make_step_fn(cfg_s, substeps=1, donate=False, trimesh=mesh,
                          use_pallas=False)
    w_d, w_s = state, state
    for _ in range(40):
        w_d = step_d(w_d)
        w_s = step_s(w_s)
    assert int(np.asarray(w_s.overflow)) == 0
    np.testing.assert_allclose(np.asarray(w_d.pos), np.asarray(w_s.pos),
                               atol=5e-3)
