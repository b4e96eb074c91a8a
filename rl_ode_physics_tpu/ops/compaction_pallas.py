"""Pallas TPU kernel for payload compaction: the one-hot never leaves VMEM.

``compact_rows_t`` (ops/compaction.py) materializes a (M, k) selection
one-hot in HBM so the selection matmul lowers to an isolated MXU op — the
round-3 profile has that materialized one-hot as the single largest substep
cost (2×0.26 ms @2048 worlds: the build fusion writes it, the matmul reads
it back). This kernel performs the identical computation with the one-hot
built *in VMEM* inside the kernel, so HBM sees only the (D, M) payload in
and the (D, k) compacted rows out.

Per world (one grid step; ``vmap`` adds the world grid dimension):

    rank (1, M) int32   — exclusive cumsum of the validity mask, with
                          invalid rows forced to k (out of range); computed
                          by the caller in XLA (a cumsum is cheap — it was
                          never the cost)
    payload_t (D, M)    — component-major payload rows
    out (D, k)          — rows_t[d, j] = payload_t[d, m] where rank[m] == j

Kernel formulation (measured on the tunneled v5 lite, 2048 worlds,
M=384, D=10, k=128, chunked ×128 like the production pipeline):

* one-hot as the dot RHS — (D, M)·(M, k) — 2.63 ms: the MXU's cost tracks
  the *B-operand area* (docs/BENCHMARKS.md device probes), and B = the
  (M, k) one-hot is the largest tensor in the problem;
* one-hot as the dot LHS — (k, M)·(M, D) with two in-VMEM transposes of
  the small payload — **1.65 ms** (jnp path: 2.31 ms). The one-hot streams
  through the MXU as A; B = the (M, D) payload is tiny.

The selection is numerically identical to the jnp path (bitwise-verified
both dtypes): the one-hot is exact in bf16, and ``sel_dtype="bfloat16"``
rounds the payload exactly like the jnp matmul at that setting does.

Validity/count/overflow stay in XLA (they come from the same cumsum that
produces ``rank``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas imports fail gracefully on backends without Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False


def pallas_ok() -> bool:
    """Mosaic kernels need a real TPU backend."""
    if not HAS_PALLAS:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _compact_kernel(rank_ref, payload_ref, out_ref, *, k, sel_dt, out_dt):
    rank = rank_ref[0, :]                                   # (M,) int32
    m = rank.shape[0]
    # (k, M) one-hot in VMEM: row j selects the source column with rank j.
    # Invalid sources carry rank == k and match no row.
    sel = (jax.lax.broadcasted_iota(jnp.int32, (k, m), 0)
           == rank[None, :]).astype(sel_dt)
    pay = payload_ref[:, :].astype(sel_dt).T                # (M, D) in VMEM
    rows = jnp.dot(sel, pay, preferred_element_type=out_dt)  # (k, D)
    out_ref[:, :] = rows.T                                  # (D, k)


def compact_rows_t_pallas(mask, payload_t, k: int, sel_dtype=None,
                          interpret: bool = False):
    """Drop-in for ``compaction.compact_rows_t`` with the one-hot in VMEM.

    Same contract: mask (M,) bool, payload_t (D, M) → (rows_t (D, k),
    valid (k,), count, overflow). Bitwise-identical to the jnp path at
    both sel_dtype settings (verified on hardware).
    """
    d, m = payload_t.shape
    f = payload_t.dtype
    sel_dt = jnp.dtype(sel_dtype) if sel_dtype is not None else f

    mi = mask.astype(jnp.int32)
    csum = jnp.cumsum(mi)
    rank = jnp.where(mask, csum - mi, k)                    # invalid → k
    total = csum[-1]

    rows_t = pl.pallas_call(
        functools.partial(_compact_kernel, k=k, sel_dt=sel_dt, out_dt=f),
        in_specs=[
            pl.BlockSpec((1, m), lambda: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, m), lambda: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, k), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, k), f),
        interpret=interpret,
    )(rank[None, :], payload_t)

    valid = jnp.arange(k, dtype=jnp.int32) < total
    return (rows_t, valid, jnp.minimum(total, k),
            jnp.maximum(total - k, 0))
