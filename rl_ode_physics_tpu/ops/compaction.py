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

    Implemented as rank-select (``compact_mask`` — popcount cumsums, no sort
    network) followed by a one-hot selection *matmul* (k, M)·(M, D) that
    rides the MXU. History: round 1 used a payload-carrying multi-operand
    ``lax.sort`` because top_k + XLA row-gather was slower; the round-2
    profile showed the payload sort itself at 2.4 ms/substep @2048 worlds
    (15%), and the rank-select + selector-matmul form removes it
    (docs/BENCHMARKS.md).

    Returns (rows (k, D), valid (k,), count (), overflow ()).
    """
    m, d = payload.shape
    idx, valid, count, overflow = compact_mask(mask, k)
    sel = ((idx[:, None] == jnp.arange(m, dtype=jnp.int32)[None, :])
           & valid[:, None]).astype(payload.dtype)       # (k, M) one-hot
    rows = jnp.matmul(sel, payload)
    return rows, valid, count, overflow


def compact_rows_t(mask: jnp.ndarray, payload_t: jnp.ndarray, k: int,
                   sel_dtype=None):
    """Transposed ``compact_rows``: payload arrives component-major (D, M)
    and leaves component-major (D, k).

    Round-3 profile: the row-major (M, D≈10) payload pads its 10-lane minor
    to the 128-lane HBM tile (~12×), so `compact_rows` streamed ~0.5 GB of
    padding per 2048-world substep. Component-major keeps D on sublanes
    (padded 10→16, 1.6×) and M on lanes, and the selection matmul runs as
    (D, M)·(M, k) with the one-hot as the RHS.

    ``sel_dtype``: dtype for the selection matmul operands (the one-hot is
    exact in any dtype). "bfloat16" halves the one-hot's bytes — on TPU at
    XLA's default matmul precision this is *numerically identical* to the
    f32 dot (the MXU rounds f32 operands to bf16 per pass anyway); only
    use it when every payload row is bf16-exact or already bf16-rounded
    downstream. Output accumulates in the payload dtype.

    Returns (rows_t (D, k), valid (k,), count (), overflow ()).
    """
    d, m = payload_t.shape
    # source-side rank: the destination slot of source row m is simply the
    # exclusive cumsum of the mask at m — no inverse rank *search* needed
    # for a payload matmul (the search in `compact_mask` exists only when
    # explicit indices are required; round-3 profile: the search's block
    # machinery cost more than the selection matmul itself)
    mi = mask.astype(jnp.int32)
    csum = jnp.cumsum(mi)                                # inclusive (M,)
    rank = csum - mi                                     # exclusive
    total = csum[-1]
    dt = jnp.dtype(sel_dtype) if sel_dtype is not None else payload_t.dtype
    # materialized one-hot (optimization_barrier): fusing the rank-compare
    # producer into the matmul operand lowers the dot to a VPU loop fusion
    # (measured 0.6 ms/substep @2048 vs ~0.1 ms with the barrier).
    # Stored int8 (the narrowest HBM form — the build fusion's write is the
    # single largest substep cost); the convert to the matmul dtype fuses
    # into the dot's operand read.
    sel8 = jax.lax.optimization_barrier(
        ((rank[:, None] == jnp.arange(k, dtype=jnp.int32)[None, :])
         & mask[:, None]).astype(jnp.int8))              # (M, k) one-hot
    rows_t = jnp.matmul(payload_t.astype(dt), sel8.astype(dt),
                        preferred_element_type=payload_t.dtype)
    valid = jnp.arange(k, dtype=jnp.int32) < total
    return (rows_t, valid, jnp.minimum(total, k),
            jnp.maximum(total - k, 0))


def compact_mask(mask: jnp.ndarray, k: int):
    """Indices of the first ≤k True entries of ``mask`` (ascending).

    Returns (idx (k,) int32, valid (k,) bool, total () int32, overflow ()).
    Deterministic: survivors keep their original relative order.

    Implemented as hierarchical *rank-select* (per-128-block popcount
    cumsums + two broadcast rank searches) — ~1.7× faster than the
    equivalent ``lax.top_k`` on TPU and bit-identical to it (verified),
    with no sort network at all.
    """
    p = mask.shape[0]
    blk = 128
    pad = (-p) % blk
    if pad:
        mask = jnp.concatenate([mask, jnp.zeros((pad,), mask.dtype)])
    m = p + pad
    nb = m // blk
    f = jnp.float32

    h = mask.reshape(nb, blk).astype(jnp.int32)
    within = jnp.cumsum(h, axis=1)                    # inclusive (NB, BLK)
    block_tot = within[:, -1]
    cum_blocks = jnp.cumsum(block_tot)                # inclusive (NB,)
    excl_blocks = cum_blocks - block_tot

    j = jnp.arange(k, dtype=jnp.int32)
    # block containing the j-th hit: count of blocks fully before rank j
    blk_of = jnp.sum((cum_blocks[None, :] <= j[:, None]).astype(jnp.int32), 1)
    blk_of = jnp.minimum(blk_of, nb - 1)
    oh = (blk_of[:, None] == jnp.arange(nb)[None, :]).astype(f)   # (k, NB)
    r = j - jnp.sum(oh * excl_blocks[None, :].astype(f), 1).astype(jnp.int32)
    row_cum = jnp.matmul(oh, within.astype(f))        # (k, BLK)
    pos = jnp.sum((row_cum <= r[:, None].astype(f)).astype(jnp.int32), 1)
    pos = jnp.minimum(pos, blk - 1)
    idx = blk_of * blk + pos

    total = cum_blocks[-1]
    valid = j < total
    idx = jnp.where(valid, jnp.minimum(idx, p - 1), 0)
    return idx, valid, jnp.minimum(total, k), jnp.maximum(total - k, 0)
