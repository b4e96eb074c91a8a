"""Probe: does the ORIENTATION of the solver's selector bmm's change their
cost? Round-2 measured the (8,N)x(N,2C) orientation (selector as RHS) at
~2.8 ps x B-area per world and concluded capacity/dtype were the only
levers. This probes the flipped orientation (selector as LHS, tiny RHS) and
lambda-space shapes before committing round-3 kernel work.

    python benchmarks/orientation_probe.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from benchmarks.device_probe import slope


def probe(label, b, m, kk, l, dtype=jnp.float32, k1=64, k2=1024):
    a = jnp.ones((b, m, kk), dtype)
    s = (jnp.arange(b * kk * l, dtype=jnp.int32).reshape(b, kk, l) % 7
         == 0).astype(dtype)

    def make_f(k):
        def f(a, s):
            def body(i, v):
                vh = jax.lax.dot_general(
                    v, s, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                # feed back through a slice/pad so the loop carries shape (m, kk)
                if l >= kk:
                    upd = vh[:, :, :kk]
                else:
                    upd = jnp.pad(vh, ((0, 0), (0, 0), (0, kk - l)))
                return v + upd.astype(dtype) * 1e-6
            return jax.lax.fori_loop(0, k, body, a, unroll=False)
        return f

    dt = slope(make_f, k1, k2, a, s)
    print(f"  {label:34s} ({b:4d},{m:3d},{kk:3d})x({kk:3d},{l:3d}) "
          f"{str(dtype.__name__ if hasattr(dtype, '__name__') else dtype):9s}: "
          f"{dt*1e3:7.3f} ms/bmm = {dt/b*1e9:6.1f} ns/world")
    return dt / b


if __name__ == "__main__":
    print(f"backend: {jax.devices()}")
    B = 2048
    print("== gather orientations (C=128 -> 2C=256 half-rows, N=64) ==")
    probe("today: vel x selT", B, 8, 64, 256)
    probe("flipped: sel x vel", B, 256, 64, 8)
    print("== scatter orientations ==")
    probe("today: contribT x sel", B, 8, 256, 64)
    probe("flipped: selT x contrib", B, 64, 256, 8)
    print("== capacity scaling (today's orientation) ==")
    probe("gather C=64", B, 8, 64, 128)
    probe("gather C=96", B, 8, 64, 192)
    print("== instance floor ==")
    probe("tiny (8,8)x(8,8)", B, 8, 8, 8)
    probe("1-tile (8,64)x(64,128)", B, 8, 64, 128)
    print("== lambda-space G matmul (2C=256) ==")
    probe("G: lam x G", B, 8, 256, 256)
