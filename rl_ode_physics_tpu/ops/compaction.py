"""Stream compaction primitives that avoid XLA scatter on TPU.

TPU scatters with data-dependent indices serialize; ``lax.top_k`` is a fast
vectorized sort-network primitive. ``compact_mask(mask, k)`` returns the
indices of the first ≤k set bits of ``mask`` in ascending order — the
building block for broadphase pair compaction and contact-buffer packing —
as a pure top_k over descending keys (no scatter anywhere).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compact_rows(mask: jnp.ndarray, payload: jnp.ndarray, k: int):
    """Compact the rows of ``payload`` (M, D) where ``mask`` is True into the
    first ≤k output rows, preserving order.

    Implemented as ONE multi-operand ``lax.sort`` that carries the payload
    columns through the sort network — ~2× faster on TPU than
    top_k + row gather (the gather was the hottest op of the whole substep;
    see docs/BENCHMARKS.md).

    Returns (rows (k, D), valid (k,), count (), overflow ()).
    """
    m, d = payload.shape
    pos = jnp.arange(m, dtype=jnp.int32)
    keys = jnp.where(mask, pos, m + pos)      # hits first, stable order
    ops = (keys,) + tuple(payload[:, i] for i in range(d))
    sorted_ops = jax.lax.sort(ops, dimension=0, num_keys=1)
    kk = sorted_ops[0][:k]
    valid = kk < m
    rows = jnp.stack([sorted_ops[1 + i][:k] for i in range(d)], axis=-1)
    rows = jnp.where(valid[:, None], rows, 0.0)
    total = jnp.sum(mask.astype(jnp.int32))
    return rows, valid, jnp.minimum(total, k), jnp.maximum(total - k, 0)


def compact_mask(mask: jnp.ndarray, k: int):
    """Indices of the first ≤k True entries of ``mask`` (ascending).

    Returns (idx (k,) int32, valid (k,) bool, total () int32, overflow ()).
    Deterministic: survivors keep their original relative order.
    """
    p = mask.shape[0]
    # key: hits get (p - position) → descending by position rank; misses 0
    pos = jnp.arange(p, dtype=jnp.int32)
    keys = jnp.where(mask, p - pos, 0)
    if k > p:  # capacity exceeds candidate count: pad with miss-keys
        keys = jnp.concatenate([keys, jnp.zeros((k - p,), keys.dtype)])
    top_keys, top_idx = jax.lax.top_k(keys, k)
    valid = top_keys > 0
    idx = jnp.where(valid, top_idx.astype(jnp.int32), 0)
    total = jnp.sum(mask.astype(jnp.int32))
    return idx, valid, jnp.minimum(total, k), jnp.maximum(total - k, 0)
