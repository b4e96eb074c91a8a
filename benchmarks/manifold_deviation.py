"""Quantify the box-box manifold variants' trajectory deviation.

Runs the same rotated-box-stack scene for 1k steps under the three
manifold schemes and reports pairwise trajectory divergence:

* exact  — Sutherland-Hodgman reference-face clipping, K=8
  (``EngineConfig(exact_box_clip=True, max_contacts_per_pair=8)``) —
  the ODE-dBoxBox-parity conformance manifold;
* cand8  — branch-free 8-candidate clamp/containment manifold, K=8
  (the scheme's only deviation: partially-overlapping edge regions);
* fold4  — the throughput default: 8 candidates fold-merged to K=4
  (antipodal/pairwise keep-the-better).

Results table lives in docs/CONFORMANCE.md ("Manifold deviation,
measured"). Run: ``python benchmarks/manifold_deviation.py [steps]``.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def rotated_stack(cfg, seed=11):
    """A 4-box tower with distinct sizes and yaw angles (face-clip paths
    genuinely exercised: incident quads rotated vs reference rects), plus
    two spheres resting against the tower."""
    from rl_ode_physics_tpu.core.state import BodyType
    from rl_ode_physics_tpu.models.builder import WorldBuilder
    from rl_ode_physics_tpu.utils.prng import RandStream

    b = WorldBuilder(cfg, seed)
    b.add_body_map((0.0, 0.0, 0.0), (0.0, 0.0, 0.0), (100.0, 1.0, 100.0))
    rng = RandStream(seed)
    yaws = [0.0, 0.35, 0.6, 1.0]
    sizes = [0.8, 0.68, 0.55, 0.42]
    y = 0.5
    for yaw, s in zip(yaws, sizes):
        y += s / 2 + 0.04
        q = (float(np.cos(yaw / 2)), 0.0, float(np.sin(yaw / 2)), 0.0)
        b.add_body(BodyType.BOX,
                   (rng.double(-0.02, 0.02), y, rng.double(-0.02, 0.02)),
                   (s, s, s), quat=q)
        y += s / 2
    b.add_body(BodyType.SPHERE, (1.0, 0.85, 0.0), (0.3, 0.0, 0.0))
    b.add_body(BodyType.SPHERE, (-0.9, 0.85, 0.4), (0.3, 0.0, 0.0))
    return b.finish()


def run(cfg, steps):
    from rl_ode_physics_tpu.core.world import make_step_fn

    w = rotated_stack(cfg)
    stepf = make_step_fn(cfg, substeps=1, donate=False)
    traj = []
    for _ in range(steps):
        w = stepf(w)
        traj.append(np.asarray(w.pos))
    return np.stack(traj), w


def main(steps=1000):
    from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind

    base = dict(max_bodies=8, max_pair_candidates=32, max_contacts=128,
                solver=SolverKind.PGS, matmul_precision="highest")
    variants = {
        "exact": EngineConfig(**base, exact_box_clip=True,
                              max_contacts_per_pair=8),
        "cand8": EngineConfig(**base, max_contacts_per_pair=8),
        "fold4": EngineConfig(**base, max_contacts_per_pair=4),
    }
    trajs = {}
    finals = {}
    for name, cfg in variants.items():
        trajs[name], finals[name] = run(cfg, steps)
        print(f"{name}: done ({steps} steps)")

    print(f"\nPairwise trajectory divergence over {steps} steps "
          f"(dynamic-body positions, meters):")
    print(f"{'pair':<16}{'max |dx|':>12}{'RMS |dx|':>12}"
          f"{'final max |dx|':>16}")
    names = list(variants)
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = trajs[names[i]], trajs[names[j]]
            d = np.linalg.norm(a - b, axis=-1)      # (T, N)
            print(f"{names[i]}-{names[j]:<10}{d.max():12.4f}"
                  f"{np.sqrt((d ** 2).mean()):12.4f}{d[-1].max():16.4f}")

    # resting sanity: all variants keep the tower standing
    for name, w in finals.items():
        ys = np.asarray(w.pos[1:5, 1])
        print(f"{name}: final tower heights {np.round(ys, 3)}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1000)
