"""Multi-chip mesh coverage on the virtual 8-device CPU mesh.

Asserts the two claims the dryrun alone never checked (VERDICT round 1):

1. sharded-vs-single bitwise equality per world — stepping a sharded batch
   over the mesh produces exactly the same states as stepping the same
   batch on one device (worlds are independent; sharding must not change
   any result bit);
2. the compiled HLO of both mesh paths contains **zero collective ops**
   (the "no collectives in the hot loop" design claim of
   ``parallel/mesh.py`` — SURVEY.md §2d: world-batch parallelism is
   embarrassingly parallel, ICI is never on the step's critical path).

Runs on the conftest-provided 8 virtual CPU devices; identical program
structure on a TPU pod slice.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rl_ode_physics_tpu.core.config import EngineConfig
from rl_ode_physics_tpu.models import scenes
from rl_ode_physics_tpu.parallel import batch as pbatch
from rl_ode_physics_tpu.parallel import mesh as pmesh

CFG = EngineConfig(max_bodies=16, max_pair_candidates=64, max_contacts=128)

# every XLA cross-device communication op (HLO names)
_COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|all-to-all|collective-permute|"
    r"collective-broadcast|reduce-scatter|partition-id|replica-id)\b"
)


def _batch(num_worlds: int):
    w = scenes.stack_world(CFG, num_bodies=10, seed=3)
    b = pbatch.replicate(w, num_worlds)
    # decorrelate worlds: nudge body heights per world so each world
    # computes a genuinely different trajectory
    bump = jnp.arange(num_worlds, dtype=b.pos.dtype) * 0.013
    pos = b.pos.at[:, :, 1].add(bump[:, None] * (b.inv_mass > 0))
    return b.replace(pos=pos)


def _assert_bitwise_equal(a, b):
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh (see conftest)")
    return pmesh.make_mesh(devs[:8])


@pytest.mark.parametrize("path", ["gspmd", "shard_map"])
def test_sharded_step_bitwise_matches_single_device(mesh, path):
    b0 = _batch(16)

    # single-device reference: same program, no mesh
    ref_fn = pbatch.make_batched_step_fn(CFG, substeps=3, donate=False)
    ref = ref_fn(b0)

    sharded_in = pmesh.shard_batch(b0, mesh)
    if path == "gspmd":
        fn = pmesh.make_sharded_step_fn(CFG, mesh, substeps=3, donate=False)
    else:
        fn = pmesh.make_shard_map_step_fn(CFG, mesh, substeps=3)
    out = fn(sharded_in)

    _assert_bitwise_equal(ref, out)


@pytest.mark.parametrize("path", ["gspmd", "shard_map"])
def test_mesh_step_hlo_has_no_collectives(mesh, path):
    b0 = _batch(16)
    sharded_in = pmesh.shard_batch(b0, mesh)
    if path == "gspmd":
        fn = pmesh.make_sharded_step_fn(CFG, mesh, substeps=2, donate=False)
    else:
        fn = pmesh.make_shard_map_step_fn(CFG, mesh, substeps=2)

    hlo = fn.lower(sharded_in).compile().as_text()
    hits = sorted(set(_COLLECTIVE_RE.findall(hlo)))
    assert not hits, f"collectives found in mesh-step HLO: {hits}"


def test_shard_batch_places_worlds_across_devices(mesh):
    b0 = _batch(16)
    sharded = pmesh.shard_batch(b0, mesh)
    devs = {d for d in sharded.pos.sharding.device_set}
    assert len(devs) == 8
    # each device owns 16/8 = 2 worlds of the leading axis
    shard_shapes = {s.data.shape for s in sharded.pos.addressable_shards}
    assert shard_shapes == {(2,) + b0.pos.shape[1:]}
