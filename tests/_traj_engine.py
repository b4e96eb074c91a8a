"""Subprocess helper: run the TPU engine in float64 conformance mode and
dump (initial state, per-step position/quaternion trajectory) to an npz.

Run as:  python tests/_traj_engine.py <scene> <out.npz> <steps> [solver]

``solver``: pgs (default — QuickStep ordering) or dantzig (direct LCP,
dWorldStep semantics). Separate process because jax_enable_x64 is
process-global (same pattern as tests/test_x64.py). Engine settings are the
conformance-grade ones: exact Sutherland-Hodgman box clipping, K=8
manifolds, float64, exact matmuls.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
from rl_ode_physics_tpu.core.world import make_step_fn
from rl_ode_physics_tpu.models import scenes
from rl_ode_physics_tpu.testing.referee import state_to_numpy

def make_cfg(solver: str) -> EngineConfig:
    # DANTZIG runs a dense (3C, 3C) masked solve per pivot — keep the row
    # capacity tight so the f64 CPU conformance run stays fast.
    max_contacts = 96 if solver == "dantzig" else 256
    return EngineConfig(
        max_bodies=16, max_pair_candidates=128, max_contacts=max_contacts,
        dtype="float64", solver=SolverKind[solver.upper()],
        exact_box_clip=True, max_contacts_per_pair=8,
        matmul_precision="highest",
    )


CFG = make_cfg("pgs")


def mini_stack_world(cfg):
    """Reduced BASELINE config 2 — shared scene, models/scenes.py."""
    return scenes.mini_stack_world(cfg)


def build(scene: str, cfg: EngineConfig):
    """Returns (state, joints, trimesh) — joints/trimesh None when unused."""
    if scene == "sphere_drop":
        return scenes.sphere_drop_world(cfg, height=2.0), None, None
    if scene == "mini_stack":
        return mini_stack_world(cfg), None, None
    if scene == "hinge_chain":
        state, joints = scenes.hinge_chain_scene(cfg)
        return state, joints, None
    if scene == "ridge_mesh":
        state, mesh = scenes.ridge_mesh_scene(cfg)
        return state, None, mesh
    raise SystemExit(f"unknown scene {scene!r}")


def main():
    scene, out_path, steps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    solver = sys.argv[4] if len(sys.argv) > 4 else "pgs"
    cfg = make_cfg(solver)
    # loud precision guard: referee-grade trajectories must never silently
    # run with bf16 matmul rounding (EngineConfig.is_fidelity_grade)
    assert cfg.is_fidelity_grade, (
        "conformance trajectory run at a non-fidelity precision — build "
        "the config with EngineConfig.conformance() or set "
        "matmul_precision='float32'/'highest' and f32 selectors")
    w, joints, mesh = build(scene, cfg)
    init = state_to_numpy(w)
    assert init["pos"].dtype == np.float64
    assert np.asarray(w.pos).dtype == np.float64, "x64 mode not active"

    stepf = make_step_fn(cfg, substeps=1, donate=False,
                         joints=joints, trimesh=mesh)
    pos_traj, quat_traj = [], []
    for _ in range(steps):
        w = stepf(w)
        pos_traj.append(np.asarray(w.pos))
        quat_traj.append(np.asarray(w.quat))

    aux = {}
    if joints is not None:
        # raw JointSet leaves (f64 — built in THIS x64 process) so the
        # referee consumes bit-identical anchors/axes
        for k in ("kind", "a", "b", "anchor_a", "anchor_b", "axis_a",
                  "axis_b", "ref_a", "ref_b", "lo", "hi", "stop_bounce",
                  "motor_vel", "motor_fmax"):
            aux[f"jnt_{k}"] = np.asarray(getattr(joints, k))
    if mesh is not None:
        for k in ("v0", "e1", "e2", "normal"):
            aux[f"mesh_{k}"] = np.asarray(getattr(mesh, k), np.float64)
        aux["mesh_slot"] = np.asarray(int(mesh.slot))

    np.savez(
        out_path,
        pos=np.stack(pos_traj), quat=np.stack(quat_traj),
        **{f"init_{k}": v for k, v in init.items()}, **aux,
    )
    print("ok")


if __name__ == "__main__":
    main()
