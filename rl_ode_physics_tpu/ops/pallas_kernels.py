"""Pallas TPU kernels for the hot trimesh sweep.

``sphere_mesh_d2``: for one probe sphere, sweep all T triangles and emit the
squared closest-point distance per triangle, laid out as (T/128, 128) tiles.
Each grid step keeps a 1,024-triangle block (component-wise (8, 128) arrays)
resident in VMEM and runs the branch-free Ericson closest-point math
(``ops.trimesh._tri_vw`` — the jnp path is the executable spec) entirely on
the VPU. Downstream, ``ops.trimesh.sphere_mesh_contacts`` reduces tiles to
per-tile best candidates and re-derives exact contact points only for the
top-k tiles — so the kernel's output is 4 bytes/triangle instead of a full
(T, 3) closest-point buffer (3× bandwidth cut on the 8,884-face teapot of
BASELINE config 3, which sweeps every body every substep).

Triangle data arrives transposed, (3, T), so blocks are (3, 1024): the last
two dims satisfy Mosaic's (8, 128)-divisible-or-full constraint.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rl_ode_physics_tpu.ops import trimesh as tm

try:  # pallas imports fail gracefully on backends without Mosaic
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

BLOCK_TRIS = 1024                      # 8 sublanes × 128 lanes per grid step


def _d2_kernel(c_ref, v0_ref, e1_ref, e2_ref, d2_ref):
    """One grid step: squared distances for a 1,024-triangle block."""
    shape = (8, 128)

    def comp(ref, i):
        return ref[i, :].reshape(shape)

    px, py, pz = c_ref[0, 0], c_ref[0, 1], c_ref[0, 2]
    v0x, v0y, v0z = comp(v0_ref, 0), comp(v0_ref, 1), comp(v0_ref, 2)
    e1x, e1y, e1z = comp(e1_ref, 0), comp(e1_ref, 1), comp(e1_ref, 2)
    e2x, e2y, e2z = comp(e2_ref, 0), comp(e2_ref, 1), comp(e2_ref, 2)

    apx, apy, apz = px - v0x, py - v0y, pz - v0z
    d1 = e1x * apx + e1y * apy + e1z * apz
    d2 = e2x * apx + e2y * apy + e2z * apz

    bpx, bpy, bpz = apx - e1x, apy - e1y, apz - e1z
    d3 = e1x * bpx + e1y * bpy + e1z * bpz
    d4 = e2x * bpx + e2y * bpy + e2z * bpz

    cpx, cpy, cpz = apx - e2x, apy - e2y, apz - e2z
    d5 = e1x * cpx + e1y * cpy + e1z * cpz
    d6 = e2x * cpx + e2y * cpy + e2z * cpz

    v, w = tm._tri_vw(d1, d2, d3, d4, d5, d6)

    dx = apx - v * e1x - w * e2x
    dy = apy - v * e1y - w * e2y
    dz = apz - v * e1z - w * e2z
    d2_ref[:, :] = dx * dx + dy * dy + dz * dz


PROBE_TILE = 8


def _d2_tiles_kernel(probes_ref, v0_ref, e1_ref, e2_ref, out_ref):
    """One grid step: 8 probes × the WHOLE mesh (resident in VMEM),
    reduced to per-128-triangle-tile minimum squared distances.

    Avoids the vmap-of-pallas_call inefficiency: all probes of a batch ride
    one kernel; triangle data loads into VMEM once per grid step and is
    swept in full (9k tris ≈ 110 KB/component)."""
    probes = probes_ref[:, :]                    # (8, 3)
    t = v0_ref.shape[1]
    nt = t // 128

    def comp(ref, i):
        return ref[i, :][None, :]                # (1, T)

    px, py, pz = probes[:, 0:1], probes[:, 1:2], probes[:, 2:3]  # (8,1)
    v0x, v0y, v0z = comp(v0_ref, 0), comp(v0_ref, 1), comp(v0_ref, 2)
    e1x, e1y, e1z = comp(e1_ref, 0), comp(e1_ref, 1), comp(e1_ref, 2)
    e2x, e2y, e2z = comp(e2_ref, 0), comp(e2_ref, 1), comp(e2_ref, 2)

    apx, apy, apz = px - v0x, py - v0y, pz - v0z          # (8, T)
    d1 = e1x * apx + e1y * apy + e1z * apz
    d2 = e2x * apx + e2y * apy + e2z * apz
    bpx, bpy, bpz = apx - e1x, apy - e1y, apz - e1z
    d3 = e1x * bpx + e1y * bpy + e1z * bpz
    d4 = e2x * bpx + e2y * bpy + e2z * bpz
    cpx, cpy, cpz = apx - e2x, apy - e2y, apz - e2z
    d5 = e1x * cpx + e1y * cpy + e1z * cpz
    d6 = e2x * cpx + e2y * cpy + e2z * cpz

    v, w = tm._tri_vw(d1, d2, d3, d4, d5, d6)

    dx = apx - v * e1x - w * e2x
    dy = apy - v * e1y - w * e2y
    dz = apz - v * e1z - w * e2z
    dd = dx * dx + dy * dy + dz * dz                      # (8, T)
    out_ref[:, :] = jnp.min(dd.reshape(PROBE_TILE, nt, 128), axis=-1)


def sphere_mesh_d2_tiles(probes, v0t, e1t, e2t):
    """(P, 3) probes → (P, T/128) per-tile min squared distances.

    P must be a multiple of 8 (pad with far-away probes). One pallas_call
    for the whole probe set; vmap over worlds adds a batch grid dim.
    """
    p = probes.shape[0]
    t = v0t.shape[1]
    nt = t // 128
    assert p % PROBE_TILE == 0, "pad probes to a multiple of 8"
    grid = (p // PROBE_TILE,)

    tri_spec = pl.BlockSpec((3, t), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _d2_tiles_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((PROBE_TILE, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            tri_spec, tri_spec, tri_spec,
        ],
        out_specs=pl.BlockSpec((PROBE_TILE, nt), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, nt), probes.dtype),
    )(probes, v0t, e1t, e2t)


def sphere_mesh_d2(center, v0t, e1t, e2t):
    """(T/128, 128) squared distances; triangle data transposed (3, T)."""
    t = v0t.shape[1]
    assert t % BLOCK_TRIS == 0, "pad the mesh to a multiple of 1024 tris"
    nt = t // 128
    dtype = center.dtype
    grid = (t // BLOCK_TRIS,)

    tri_spec = pl.BlockSpec((3, BLOCK_TRIS), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _d2_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            tri_spec, tri_spec, tri_spec,
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nt, 128), dtype),
    )(center[None, :], v0t, e1t, e2t)
