"""Deterministic PRNG, bit-compatible with the reference game's generator.

The reference uses a global-state mul-xor-shift hash PRNG
(``/root/reference/src/rand.c:7-13``): each draw adds the Weyl constant
``0xE120FC15`` to a 32-bit state, then mixes with two 64-bit
multiply-xor-fold rounds (constants ``0x4A39B70D`` and ``0x12FAD5C9``).

TPU-native redesign: because ``state + k*0xE120FC15`` is a closed form, the
generator is *counter-based* — ``raw(seed, counter)`` is a pure function, so a
whole batch of draws is one vectorized call (ideal for spawning thousands of
bodies across vmapped worlds) and streams are reproducible regardless of
evaluation order. The sequential API (``next_u32``) matches the reference's
draw-by-draw semantics bit-for-bit, including the modulo bias of ``Rand_Int``
(``src/rand.c:15-22``) and the ``/0xFFFFFFFF`` scaling of ``Rand_Double``
(``src/rand.c:24-30``).

Functions here operate on uint32 arrays and work identically in host numpy
and under ``jax.jit`` (jnp). Bit-exactness is part of the determinism
contract (SURVEY.md §2d: lockstep replay must be reproducible).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

WEYL = np.uint32(0xE120FC15)
MIX1 = np.uint32(0x4A39B70D)
MIX2 = np.uint32(0x12FAD5C9)


def _mulhilo32(xp, a, b_const: int):
    """(high, low) 32-bit halves of the 64-bit product a * b_const.

    Pure uint32 limb arithmetic — works on TPUs / under jax.jit where
    uint64 is unavailable (no x64). Standard 16-bit-limb umulhi.
    """
    a = a.astype(xp.uint32)
    b = xp.uint32(b_const)
    al = a & xp.uint32(0xFFFF)
    ah = a >> xp.uint32(16)
    bl = b & xp.uint32(0xFFFF)
    bh = b >> xp.uint32(16)
    ll = al * bl
    u = al * bh + (ll >> xp.uint32(16))
    v = ah * bl + (u & xp.uint32(0xFFFF))
    hi = ah * bh + (u >> xp.uint32(16)) + (v >> xp.uint32(16))
    lo = (v << xp.uint32(16)) | (ll & xp.uint32(0xFFFF))
    return hi, lo


def _mix(state):
    """The two multiply-xor-fold rounds of ``Rand_Next`` (src/rand.c:8-12)."""
    xp = jnp if isinstance(state, jnp.ndarray) else np
    hi, lo = _mulhilo32(xp, state, 0x4A39B70D)
    m1 = hi ^ lo
    hi, lo = _mulhilo32(xp, m1, 0x12FAD5C9)
    return hi ^ lo


def raw(seed, counter):
    """Counter-based draw: value of the (counter+1)-th ``Rand_Next`` call.

    ``seed`` is the initial ``randState``; ``counter`` may be any-shaped
    uint32 array → vectorized independent draws from one stream.
    """
    xp = jnp if isinstance(seed, jnp.ndarray) or isinstance(counter, jnp.ndarray) else np
    seed = xp.asarray(seed, dtype=xp.uint32)
    counter = xp.asarray(counter, dtype=xp.uint32)
    state = seed + (counter + xp.uint32(1)) * xp.uint32(0xE120FC15)
    return _mix(state)


def next_u32(state):
    """Sequential draw: (value, new_state). Bit-exact ``Rand_Next``."""
    xp = jnp if isinstance(state, jnp.ndarray) else np
    state = xp.asarray(state, dtype=xp.uint32)
    new_state = state + xp.uint32(0xE120FC15)
    return _mix(new_state), new_state


def rand_int(value_u32, lo: int, hi: int):
    """Map a raw draw to [lo, hi) exactly like ``Rand_Int`` (src/rand.c:15).

    Keeps the reference's modulo bias on purpose — bit-compatibility matters
    more than uniformity here. ``lo >= hi`` returns 0 like the reference.
    """
    xp = jnp if isinstance(value_u32, jnp.ndarray) else np
    if lo >= hi:
        return xp.zeros_like(value_u32, dtype=xp.int32)
    span = np.uint32(hi - lo)
    return (value_u32 % span).astype(xp.int32) + xp.int32(lo)


def rand_double(value_u32, lo: float, hi: float):
    """Map a raw draw to [lo, hi] like ``Rand_Double`` (src/rand.c:24).

    Note the reference divides by 0xFFFFFFFF (inclusive upper bound), not
    2**32 — reproduced exactly. The reference computes in f64; on the jnp
    path that requires ``jax.config.jax_enable_x64`` (otherwise
    ``astype(float64)`` silently yields f32 and traced draws diverge from
    the reference), so we raise instead of silently degrading.
    """
    if isinstance(value_u32, jnp.ndarray):
        import jax
        if not jax.config.jax_enable_x64:
            raise ValueError(
                "rand_double on a JAX array needs jax_enable_x64 for the "
                "reference's f64 semantics; use the numpy path (host-side "
                "np.uint32 input) or enable x64."
            )
        v = value_u32.astype(jnp.float64) / np.float64(0xFFFFFFFF)
    else:
        v = value_u32.astype(np.float64) / np.float64(0xFFFFFFFF)
    return lo + v * (float(hi) - float(lo))


def rand_color(state):
    """Three sequential int draws in [lo,hi) for r,g,b, alpha=255.

    Mirrors ``Rand_Color`` (src/rand.c:32-34) which burns three ``Rand_Next``
    calls. Returns ((r,g,b,a) uint8 given via rand_int by caller pattern) —
    here we fix the reference's call sites' (30, 190) bounds at the caller;
    this helper just advances the stream three times and returns the raws.
    """
    v0, state = next_u32(state)
    v1, state = next_u32(state)
    v2, state = next_u32(state)
    return (v0, v1, v2), state


class RandStream:
    """Host-side convenience wrapper with the reference's exact semantics.

    Drop-in behavioral replacement for the globals in ``src/rand.c``:
    ``RandStream(seed)`` ≙ ``randState = seed`` (``src/main.c:328`` seeds
    from ``time(NULL)``; here the seed is explicit for determinism).
    """

    def __init__(self, seed: int):
        self.state = np.uint32(seed)

    def next(self) -> int:
        v, self.state = next_u32(self.state)
        return int(v)

    def randint(self, lo: int, hi: int) -> int:
        if lo >= hi:
            return 0
        return int(rand_int(np.uint32(self.next()), lo, hi))

    def double(self, lo: float, hi: float) -> float:
        return float(rand_double(np.uint32(self.next()), lo, hi))

    def color(self, lo: int = 30, hi: int = 190):
        """(r, g, b, 255) uint8 — mirrors ``Rand_Color`` (src/rand.c:32)."""
        return (
            self.randint(lo, hi),
            self.randint(lo, hi),
            self.randint(lo, hi),
            255,
        )
