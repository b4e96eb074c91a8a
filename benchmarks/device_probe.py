"""Device microbenchmarks: the numbers that drive kernel design decisions.

The tunneled backend has a ~30 ms fixed host dispatch/sync round-trip per
jit call (with ±ms jitter), so each probe runs its work K times in a
device-side ``lax.fori_loop`` at two values of K chosen so the *difference*
in device work is >> the jitter, and reports the slope
(t(K2) - t(K1)) / (K2 - K1). Raw times are printed for sanity.

    python benchmarks/device_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync(out):
    """On the tunneled 'axon' platform block_until_ready does not actually
    wait — only a device->host transfer does. Pull one scalar."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    import numpy as np
    # index down to a scalar ON DEVICE first — device_get of the full leaf
    # would ride the ~50 MB/s tunnel and dominate the measurement
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def timed(f, *args, reps=3):
    _sync(f(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def slope(make_f, k1, k2, *args):
    t1 = timed(jax.jit(make_f(k1)), *args)
    t2 = timed(jax.jit(make_f(k2)), *args)
    print(f"    [t({k1})={t1*1e3:.1f} ms, t({k2})={t2*1e3:.1f} ms]")
    return (t2 - t1) / (k2 - k1)


def probe_hbm():
    print("== HBM streaming bandwidth ==")
    mb = 64
    n = mb * 1024 * 1024 // 4
    x = jnp.ones((n // 1024, 1024), jnp.float32)

    def make_f(k):
        def f(x):
            return jax.lax.fori_loop(
                0, k, lambda i, a: a * 1.0000001 + 1e-9, x,
                unroll=False)
        return f

    dt = slope(make_f, 64, 1024, x)
    print(f"  {mb} MB pass: {dt*1e3:7.3f} ms -> {2*n*4/dt/1e9:7.1f} GB/s")


def probe_bmm():
    print("== XLA bmm (2048,8,64)x(2048,64,384) bf16->f32 ==")
    b, n, c2 = 2048, 64, 384
    vel = jnp.ones((b, 8, n), jnp.bfloat16)
    s = (jnp.arange(b * n * c2, dtype=jnp.int32).reshape(b, n, c2) % 7
         == 0).astype(jnp.bfloat16)

    def make_f(k):
        def f(vel, s):
            def body(i, v):
                vh = jax.lax.dot_general(
                    v, s, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                return (v + vh[:, :, :n].astype(jnp.bfloat16) * 1e-6)
            return jax.lax.fori_loop(0, k, body, vel, unroll=False)
        return f

    dt = slope(make_f, 64, 1024, vel, s)
    flops = 2 * b * 8 * n * c2
    traffic = b * n * c2 * 2
    print(f"  per bmm: {dt*1e3:7.3f} ms  {flops/dt/1e12:6.2f} TFLOP/s"
          f"  (S-read alone {traffic/dt/1e9:6.1f} GB/s)")


def probe_kernel_matmuls():
    print("== in-kernel (8,64)x(64,384) f32 matmul ==")
    n, c2 = 64, 384
    w_block, chain = 8, 16

    def make_f(k):
        def kernel(vel_ref, s_ref, out_ref):
            def body(_, accs):
                new = []
                for w in range(w_block):
                    acc = accs[w]
                    for _ in range(chain):
                        vh = jnp.dot(acc, s_ref[w],
                                     preferred_element_type=jnp.float32)
                        acc = acc + vh[:, :n] * 1e-6
                    new.append(acc)
                return tuple(new)
            accs = tuple(vel_ref[w] for w in range(w_block))
            accs = jax.lax.fori_loop(0, k, body, accs, unroll=False)
            for w in range(w_block):
                out_ref[w] = accs[w]

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((w_block, 8, n), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return lambda a, b: f(a, b)

    vel = jnp.ones((w_block, 8, n), jnp.float32)
    s = jnp.ones((w_block, n, c2), jnp.float32) * 0.01
    dt = slope(make_f, 256, 4096, vel, s)
    print(f"  {dt/(chain*w_block)*1e9:7.1f} ns/matmul")


def probe_kernel_vpu(shape):
    print(f"== in-kernel chained VPU fma at {shape} f32 ==")
    chain = 16

    def make_f(k):
        def kernel(x_ref, out_ref):
            def body(_, acc):
                for _ in range(chain):
                    acc = acc * 1.0000001 + 1e-9
                return acc
            out_ref[...] = jax.lax.fori_loop(0, k, body, x_ref[...],
                                             unroll=False)

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return lambda x: f(x)

    x = jnp.ones(shape, jnp.float32)
    dt = slope(make_f, 1024, 16384, x)
    print(f"  {dt/chain*1e9:7.1f} ns/op")


def probe_mxu_peak():
    print("== in-kernel (256,256)x(256,256) f32 matmul (MXU sanity) ==")
    m = 256

    def make_f(k):
        def kernel(a_ref, b_ref, out_ref):
            def body(_, acc):
                return jnp.dot(acc, b_ref[...],
                               preferred_element_type=jnp.float32) * 0.0625
            out_ref[...] = jax.lax.fori_loop(0, k, body, a_ref[...],
                                             unroll=False)

        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, m), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return lambda a, b: f(a, b)

    a = jnp.ones((m, m), jnp.float32)
    b = jnp.full((m, m), 1.0 / 16.0, jnp.float32)
    dt = slope(make_f, 4096, 65536, a, b)
    print(f"  {dt*1e9:7.1f} ns/matmul -> {2*m**3/dt/1e12:6.2f} TFLOP/s f32")


if __name__ == "__main__":
    print(f"backend: {jax.devices()}")
    probe_hbm()
    probe_bmm()
    probe_kernel_matmuls()
    probe_kernel_vpu((8, 384))
    probe_kernel_vpu((32, 384))
    probe_mxu_peak()


def probe_shape_menu():
    """Per-bmm cost for candidate solver gather/scatter shapes."""
    print("== bmm shape menu (2048-world batch, bf16->f32, slope-fitted) ==")
    menu = [
        # (batch, rows, K, lanes, label)
        (2048, 8, 64, 384, "gather today C=192"),
        (2048, 8, 384, 64, "scatter today C=192"),
        (2048, 8, 64, 256, "gather C=128"),
        (2048, 8, 256, 64, "scatter C=128"),
        (1024, 16, 128, 384, "gather paired C=192"),
        (1024, 16, 128, 256, "gather paired C=128"),
        (1024, 8, 512, 128, "scatter paired C=128"),
    ]
    for b, m, kk, l, label in menu:
        a = jnp.ones((b, m, kk), jnp.bfloat16)
        s = jnp.ones((b, kk, l), jnp.bfloat16) * 0.01

        def make_f(k, a=a, s=s, m=m, kk=kk):
            def f(a, s):
                def body(i, v):
                    vh = jax.lax.dot_general(
                        v, s, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32)
                    return (v + vh[:, :, :kk].astype(jnp.bfloat16) * 1e-6
                            if vh.shape[-1] >= kk else
                            v + jnp.pad(vh, ((0, 0), (0, 0),
                                             (0, kk - vh.shape[-1])
                                             )).astype(jnp.bfloat16) * 1e-6)
                return jax.lax.fori_loop(0, k, body, a, unroll=False)
            return f

        dt = slope(make_f, 64, 1024, a, s)
        per_world = dt / 2048
        print(f"  {label:24s} ({b},{m},{kk})x({kk},{l}): "
              f"{dt*1e3:6.3f} ms/bmm = {per_world*1e9:6.1f} ns/world")
