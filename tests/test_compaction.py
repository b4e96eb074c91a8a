"""Unit tests for the stream-compaction primitives (rank-select compact_mask
and payload-sort compact_rows) — edge cases and equivalence to a numpy
reference."""

import numpy as np
import jax
import jax.numpy as jnp

from rl_ode_physics_tpu.ops.compaction import compact_mask, compact_rows


def _ref_indices(mask, k):
    idx = np.flatnonzero(mask)[:k]
    return idx


def test_compact_mask_matches_numpy_reference():
    rng = np.random.default_rng(0)
    for p, k in [(128, 16), (4096, 256), (200, 64), (64, 128)]:
        for density in (0.0, 0.05, 0.5, 1.0):
            mask = rng.uniform(size=p) < density
            idx, valid, count, overflow = compact_mask(jnp.asarray(mask), k)
            ref = _ref_indices(mask, k)
            got = np.asarray(idx)[np.asarray(valid)]
            assert np.array_equal(got, ref), (p, k, density)
            total = int(mask.sum())
            assert int(count) == min(total, k)
            assert int(overflow) == max(total - k, 0)


def test_compact_mask_empty_and_full():
    p, k = 256, 32
    idx, valid, count, overflow = compact_mask(jnp.zeros(p, bool), k)
    assert int(count) == 0 and not bool(valid.any())
    idx, valid, count, overflow = compact_mask(jnp.ones(p, bool), k)
    assert int(count) == k and int(overflow) == p - k
    assert np.array_equal(np.asarray(idx), np.arange(k))


def test_compact_rows_preserves_payload_exactly():
    """Payload rides the sort losslessly (bit-exact, unlike a one-hot
    matmul which would round through bf16 on TPU)."""
    rng = np.random.default_rng(1)
    m, d, k = 512, 9, 64
    payload = rng.normal(size=(m, d)).astype(np.float32)
    mask = rng.uniform(size=m) < 0.2
    rows, valid, count, overflow = compact_rows(
        jnp.asarray(mask), jnp.asarray(payload), k)
    ref = payload[np.flatnonzero(mask)[:k]]
    got = np.asarray(rows)[np.asarray(valid)]
    assert got.shape == ref.shape
    assert np.array_equal(got, ref)          # bitwise


def test_compact_mask_jit_vmap():
    rng = np.random.default_rng(2)
    masks = jnp.asarray(rng.uniform(size=(8, 384)) < 0.1)
    f = jax.jit(jax.vmap(lambda m: compact_mask(m, 32)))
    idx, valid, count, overflow = f(masks)
    for b in range(8):
        ref = _ref_indices(np.asarray(masks[b]), 32)
        got = np.asarray(idx[b])[np.asarray(valid[b])]
        assert np.array_equal(got, ref)


def test_compact_rows_t_pallas_matches_jnp():
    """VMEM one-hot Pallas kernel (ops/compaction_pallas.py) vs the jnp
    selector-matmul path — bitwise, both sel dtypes. On CPU this runs the
    Pallas interpreter; the compiled kernel was bitwise-verified on real
    TPU hardware (both dtypes) before the opt-in flag landed."""
    from rl_ode_physics_tpu.ops.compaction import compact_rows_t
    from rl_ode_physics_tpu.ops.compaction_pallas import compact_rows_t_pallas

    rng = np.random.default_rng(3)
    m, d, k = 384, 10, 128
    mask = jnp.asarray(rng.uniform(size=m) < 0.25)
    payload_t = jnp.asarray(rng.normal(size=(d, m)).astype(np.float32))
    for sd in (None, "bfloat16"):
        ref = compact_rows_t(mask, payload_t, k, sel_dtype=sd)
        got = compact_rows_t_pallas(mask, payload_t, k, sel_dtype=sd,
                                    interpret=True)
        for r, g in zip(ref, got):
            assert np.array_equal(np.asarray(r), np.asarray(g))
