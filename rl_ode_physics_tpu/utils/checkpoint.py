"""Checkpoint / resume: bit-exact world snapshots.

The reference has no persistence (SURVEY.md §5); its closest analog is that
every 60 Hz broadcast is a full state snapshot (``src/main.c:239-242``).
Here a checkpoint is the entire ``WorldState`` pytree (including tick
counter and PRNG stream state), so a restore resumes the deterministic
trajectory bit-for-bit — the recovery story for both the lockstep server
and long batched-simulation runs.

Format: npz (always available). ``save_orbax``/``load_orbax`` use Orbax
when installed (async, sharding-aware — the right choice for multi-chip
batches); both formats hold identical data.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import numpy as np
import jax

from rl_ode_physics_tpu.core.config import EngineConfig, SolverKind
from rl_ode_physics_tpu.core.state import WorldState

_FIELDS = [f.name for f in dataclasses.fields(WorldState)]


def _config_meta(config: EngineConfig) -> str:
    d = dataclasses.asdict(config)
    d["solver"] = config.solver.value
    return json.dumps(d)


def _config_from_meta(blob: str) -> EngineConfig:
    d = json.loads(blob)
    d["solver"] = SolverKind(d["solver"])
    # JSON turns tuples into lists; restore every tuple-typed field so the
    # frozen config compares (and hashes) equal to the original.
    for k, v in list(d.items()):
        if isinstance(v, list):
            d[k] = tuple(tuple(e) if isinstance(e, list) else e for e in v)
    return EngineConfig(**d)


def save(path: str, state: WorldState,
         config: Optional[EngineConfig] = None) -> None:
    """Write an npz checkpoint (one device→host transfer of the pytree)."""
    host = jax.device_get(state)
    arrays = {name: np.asarray(getattr(host, name)) for name in _FIELDS}
    if config is not None:
        arrays["__config__"] = np.frombuffer(
            _config_meta(config).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)                    # atomic publish


def load(path: str):
    """→ (WorldState, EngineConfig | None). Bit-exact round trip."""
    with np.load(path) as z:
        config = None
        if "__config__" in z:
            config = _config_from_meta(bytes(z["__config__"]).decode())
        import jax.numpy as jnp
        arrays = {name: jnp.asarray(z[name]) for name in _FIELDS
                  if name in z}
        # forward-compat: checkpoints written before per-body surface
        # params get the config (or ODE-default) values
        if "friction" in _FIELDS and "friction" not in arrays:
            n = arrays["pos"].shape[-2]
            f = arrays["pos"].dtype
            mu = config.mu if config is not None else float("inf")
            bo = config.bounce if config is not None else 0.2
            arrays["friction"] = jnp.full((n,), mu, f)
            arrays["restitution"] = jnp.full((n,), bo, f)
        state = WorldState(**arrays)
    return state, config


def save_orbax(path: str, state: WorldState) -> None:
    """Orbax checkpoint (async-capable, sharded-array aware)."""
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), state, force=True)
    ckpt.wait_until_finished()


def load_orbax(path: str, template: WorldState) -> WorldState:
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(path), template)
