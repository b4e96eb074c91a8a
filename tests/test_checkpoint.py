"""Checkpoint/resume: bit-exact trajectory continuation (SURVEY.md §5)."""

import numpy as np

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.core.world import make_step_fn
from rl_ode_physics_tpu.models import scenes
from rl_ode_physics_tpu.utils import checkpoint as ckpt

CFG = EngineConfig(max_bodies=8, max_pair_candidates=32, max_contacts=64)


def test_npz_roundtrip_bit_exact(tmp_path):
    w = scenes.stack_world(CFG, num_bodies=3, seed=5)
    stepf = make_step_fn(CFG, substeps=4, donate=False)
    for _ in range(10):
        w = stepf(w)

    path = str(tmp_path / "world.npz")
    ckpt.save(path, w, CFG)
    restored, cfg2 = ckpt.load(path)
    assert cfg2 == CFG

    import jax
    for a, b in zip(jax.tree_util.tree_leaves(w),
                    jax.tree_util.tree_leaves(restored)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_identically(tmp_path):
    stepf = make_step_fn(CFG, substeps=4, donate=False)

    w = scenes.stack_world(CFG, num_bodies=3, seed=6)
    for _ in range(5):
        w = stepf(w)
    path = str(tmp_path / "mid.npz")
    ckpt.save(path, w, CFG)

    # continue the original
    w_cont = w
    for _ in range(10):
        w_cont = stepf(w_cont)

    # resume from disk and continue
    w_res, _ = ckpt.load(path)
    for _ in range(10):
        w_res = stepf(w_res)

    assert np.array_equal(np.asarray(w_cont.pos), np.asarray(w_res.pos))
    assert np.array_equal(np.asarray(w_cont.quat), np.asarray(w_res.quat))
    assert int(w_cont.tick) == int(w_res.tick)


def test_batched_checkpoint(tmp_path):
    from rl_ode_physics_tpu.parallel.batch import replicate

    w = replicate(scenes.sphere_drop_world(CFG, height=2.0), 4)
    path = str(tmp_path / "batch.npz")
    ckpt.save(path, w, CFG)
    restored, _ = ckpt.load(path)
    assert restored.pos.shape == (4, 8, 3)
    assert np.array_equal(np.asarray(w.rng_state), np.asarray(restored.rng_state))
