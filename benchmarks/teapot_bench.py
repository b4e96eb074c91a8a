"""BASELINE config 3 benchmark: teapot trimesh narrowphase throughput.

Batch of worlds, each with the 8,884-face teapot as static scene geometry
and spheres raining on it; reports body-steps/sec with the tiled
closest-point sweep in the loop (Pallas kernel on TPU, jnp elsewhere).

    python benchmarks/teapot_bench.py [num_worlds] [use_pallas 0|1]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

TEAPOT = "/root/reference/res/teapot.obj"


def main(num_worlds: int = 64, use_pallas: bool = True):
    from rl_ode_physics_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import jax
    import numpy as np
    from rl_ode_physics_tpu.core.config import EngineConfig
    from rl_ode_physics_tpu.core.state import BodyType
    from rl_ode_physics_tpu.models.builder import WorldBuilder
    from rl_ode_physics_tpu.ops import trimesh as tm
    from rl_ode_physics_tpu.core.world import step as step_one
    from rl_ode_physics_tpu.parallel.batch import replicate
    from rl_ode_physics_tpu.utils.objloader import load_obj
    from rl_ode_physics_tpu.utils.prng import RandStream

    if use_pallas and jax.default_backend() not in ("tpu", "axon"):
        use_pallas = False          # Mosaic kernels need real TPU

    verts, tris = load_obj(TEAPOT)
    top = float(verts[:, 1].max())

    num_bodies = 16
    config = EngineConfig(max_bodies=num_bodies, max_pair_candidates=64,
                          max_contacts=128, max_contacts_per_pair=8,
                          enable_planes=False, enable_capsules=False)
    b = WorldBuilder(config, 0)
    mesh_slot = b.add_body_map((0, 0, 0), (0, 0, 0), (0, 0, 0))
    b.body_type[mesh_slot] = int(BodyType.TRIMESH)
    rng = RandStream(3)
    for _ in range(num_bodies - 1):
        b.add_body(BodyType.SPHERE,
                   (rng.double(-1.5, 1.5), top + rng.double(0.5, 3.0),
                    rng.double(-1.5, 1.5)),
                   (0.25, 0.0, 0.0))
    world = b.finish()
    mesh = tm.build_trimesh(verts, tris, slot=mesh_slot)

    batch = replicate(world, num_worlds)
    substeps = 8

    @jax.jit
    def f(bt):
        def body(s, _):
            return jax.vmap(
                lambda w: step_one(w, config, mesh, use_pallas))(s), None
        bt, _ = jax.lax.scan(body, bt, None, length=substeps)
        return bt

    batch = f(batch)
    _ = np.asarray(batch.pos[0, 0])
    launches = 6
    t0 = time.perf_counter()
    for _ in range(launches):
        batch = f(batch)
    _ = np.asarray(batch.pos[0, 0])
    dt = time.perf_counter() - t0

    steps = launches * substeps
    value = num_worlds * num_bodies * steps / dt
    tri_tests = num_worlds * (num_bodies - 1) * 12 * mesh.num_tris * steps
    print(json.dumps({
        "metric": f"teapot trimesh body-steps/sec ({num_worlds} worlds x "
                  f"{num_bodies} bodies, {mesh.num_tris} tris, "
                  f"pallas={use_pallas})",
        "value": value,
        "unit": "body-steps/sec",
        "triangle_tests_per_sec": tri_tests / dt,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64,
         bool(int(sys.argv[2])) if len(sys.argv) > 2 else True)
