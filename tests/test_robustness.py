"""Long-horizon robustness: no NaNs, bounded energy, capacity stress."""

import numpy as np
import jax
import jax.numpy as jnp

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.state import BodyType
from rl_ode_physics_tpu.core.world import add_body, make_step_fn
from rl_ode_physics_tpu.models import scenes
import pytest


@pytest.mark.slow
def test_long_run_no_nans_bounded_energy():
    """2,400 substeps (20 s) of the contact-rich bench scene: every state
    stays finite and kinetic energy decays to near rest."""
    cfg = EngineConfig(max_bodies=32, max_pair_candidates=128,
                       max_contacts=256, max_contacts_per_pair=4)
    w = scenes.bench_world(cfg, num_bodies=28)
    stepf = make_step_fn(cfg, substeps=24, donate=False)
    for _ in range(100):
        w = stepf(w)
    for name in ("pos", "quat", "linvel", "angvel"):
        arr = np.asarray(getattr(w, name))
        assert np.all(np.isfinite(arr)), f"non-finite {name}"
    dyn = np.asarray(w.dynamic)
    ke = 0.5 * np.sum(np.asarray(w.linvel)[dyn] ** 2)
    assert ke < 1.0, f"kinetic energy {ke} did not settle"
    # quaternions stay unit-norm under integration
    norms = np.linalg.norm(np.asarray(w.quat), axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-4)


@pytest.mark.slow
def test_tall_tower_survives():
    """6-box tower (beyond the 3-box test): Jacobi keeps it standing."""
    cfg = EngineConfig(max_bodies=16, max_pair_candidates=64,
                       max_contacts=128)
    w = scenes.grass_plane_world(cfg)
    for i in range(6):
        w, _ = add_body(w, BodyType.BOX, (0.0, 1.0 + i * 1.005, 0.0),
                        (1.0, 1.0, 1.0))
    stepf = make_step_fn(cfg, substeps=24, donate=False)
    for _ in range(40):    # 8 s
        w = stepf(w)
    ys = sorted(float(w.pos[4 + i, 1]) for i in range(6))
    for i, y in enumerate(ys):
        assert abs(y - (1.0 + i)) < 0.25, (i, ys)


@pytest.mark.slow
def test_reference_capacity_512_slots():
    """The reference's full MAX_BODIES=512 capacity compiles and steps."""
    cfg = EngineConfig()        # defaults: 512 slots
    w = scenes.stack_world(cfg, num_bodies=48, seed=11)
    stepf = make_step_fn(cfg, substeps=4, donate=False)
    for _ in range(5):
        w = stepf(w)
    assert int(jnp.sum(w.active)) == 52        # 4 arena + 48 spawned
    assert np.all(np.isfinite(np.asarray(w.pos)))


@pytest.mark.slow
def test_overflow_is_loud_on_default_path():
    """VERDICT r2 item 4: a scene exceeding the configured contact capacity
    must degrade VISIBLY — the cumulative dropped-row counter lives on the
    WorldState itself (default step(), no diagnostics mode) and SimCore
    warns about it."""
    import pytest

    # 20 dynamic spheres resting on the arena floor need ~20 contacts;
    # max_contacts=8 guarantees drops
    cfg = EngineConfig(max_bodies=32, max_pair_candidates=64,
                       max_contacts=8, max_contacts_per_pair=4)
    w = scenes.bench_world(cfg, num_bodies=20)
    assert int(w.overflow) == 0
    stepf = make_step_fn(cfg, substeps=4, donate=False)
    for _ in range(10):
        w = stepf(w)
    assert int(w.overflow) > 0, "over-capacity scene must report drops"

    # typed-bucket path carries the same counter
    cfg_t = cfg.replace(typed_buckets=True,
                        bucket_caps=((1, 1, 8), (1, 2, 8), (2, 2, 8)))
    wt = scenes.bench_world(cfg_t, num_bodies=20)
    stepf_t = make_step_fn(cfg_t, substeps=4, donate=False)
    for _ in range(10):
        wt = stepf_t(wt)
    assert int(wt.overflow) > 0

    # SimCore surfaces it as a warning on the default advance() loop
    from rl_ode_physics_tpu.net.server import SimCore
    core = SimCore(config=cfg, world=scenes.bench_world(cfg, num_bodies=20))
    with pytest.warns(RuntimeWarning, match="capacity overflow"):
        for _ in range(30):
            core.advance(substeps=4)
