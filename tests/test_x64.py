"""f64 conformance mode (SURVEY.md §7 hard parts: selective f64 for
conformance runs). jax_enable_x64 is process-global, so the x64 run
executes in a subprocess; the in-process suite stays f32."""

import json
import subprocess
import sys
import textwrap

SCRIPT = textwrap.dedent("""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import json
    import jax.numpy as jnp
    from rl_ode_physics_tpu.core.config import EngineConfig
    from rl_ode_physics_tpu.core.world import make_step_fn
    from rl_ode_physics_tpu.models import scenes

    cfg = EngineConfig(max_bodies=8, max_pair_candidates=32, max_contacts=64,
                       dtype="float64", cfm=1e-10)   # ODE dDOUBLE default CFM
    w = scenes.sphere_drop_world(cfg, height=2.0, radius=0.15)
    assert w.pos.dtype == jnp.float64
    stepf = make_step_fn(cfg, substeps=12, donate=False)
    for _ in range(30):
        w = stepf(w)
    print(json.dumps({
        "y": float(w.pos[4, 1]),
        "vy": float(w.linvel[4, 1]),
        "dtype": str(w.pos.dtype),
    }))
""")


def test_f64_mode_settles_exactly():
    out = subprocess.run([sys.executable, "-c", SCRIPT],
                         capture_output=True, text=True, timeout=600,
                         cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["dtype"] == "float64"
    assert abs(result["y"] - 0.65) < 1e-4
    assert abs(result["vy"]) < 1e-3


def test_float32_precision_mode():
    """matmul_precision='float32': exact f32 through the selection matmuls
    (TPU default rounds them through bf16); behavior identical on CPU."""
    from rl_ode_physics_tpu.core.config import EngineConfig
    from rl_ode_physics_tpu.core.world import make_step_fn
    from rl_ode_physics_tpu.models import scenes

    cfg = EngineConfig(max_bodies=8, max_pair_candidates=32, max_contacts=64,
                       matmul_precision="float32")
    w = scenes.sphere_drop_world(cfg, height=2.0)
    stepf = make_step_fn(cfg, substeps=12, donate=False)
    for _ in range(30):
        w = stepf(w)
    assert abs(float(w.pos[4, 1]) - 0.65) < 5e-3
