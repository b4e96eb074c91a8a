"""PRNG conformance: bit-exact against a direct C-semantics reimplementation
of the reference's src/rand.c (constants 0xE120FC15 / 0x4A39B70D /
0x12FAD5C9)."""

import numpy as np
import jax.numpy as jnp

from rl_ode_physics_tpu.utils import prng


def _c_rand_next(state):
    """Literal uint32/uint64 semantics of Rand_Next (src/rand.c:7-13)."""
    state = (state + 0xE120FC15) & 0xFFFFFFFF
    temp = (state * 0x4A39B70D) & 0xFFFFFFFFFFFFFFFF
    m1 = ((temp >> 32) ^ temp) & 0xFFFFFFFF
    temp = (m1 * 0x12FAD5C9) & 0xFFFFFFFFFFFFFFFF
    return (((temp >> 32) ^ temp) & 0xFFFFFFFF), state


def test_next_u32_bit_exact():
    state = np.uint32(12345)
    c_state = 12345
    for _ in range(100):
        v, state = prng.next_u32(state)
        cv, c_state = _c_rand_next(c_state)
        assert int(v) == cv


def test_counter_mode_matches_sequential():
    seed = np.uint32(999)
    state = seed
    seq = []
    for _ in range(16):
        v, state = prng.next_u32(state)
        seq.append(int(v))
    vec = prng.raw(seed, np.arange(16, dtype=np.uint32))
    assert [int(x) for x in vec] == seq


def test_counter_mode_jax_matches_numpy():
    seed = 4242
    a = prng.raw(np.uint32(seed), np.arange(32, dtype=np.uint32))
    b = prng.raw(jnp.asarray(seed, jnp.uint32), jnp.arange(32, dtype=jnp.uint32))
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_rand_int_semantics():
    # Rand_Int: (next % (max-min)) + min, and 0 when min >= max
    s = prng.RandStream(7)
    s2 = prng.RandStream(7)
    raws = [s2.next() for _ in range(10)]
    for i in range(10):
        v = s.randint(3, 10)
        assert v == (raws[i] % 7) + 3
    assert prng.RandStream(1).randint(5, 5) == 0


def test_rand_double_range_and_formula():
    s = prng.RandStream(11)
    s2 = prng.RandStream(11)
    raw = s2.next()
    v = s.double(-4.0, 4.0)
    expected = -4.0 + raw / float(0xFFFFFFFF) * 8.0
    assert abs(v - expected) < 1e-12
    assert -4.0 <= v <= 4.0


def test_color_burns_three_draws():
    s = prng.RandStream(5)
    c = s.color(30, 190)
    assert len(c) == 4 and c[3] == 255
    assert all(30 <= x < 190 for x in c[:3])
    # stream advanced exactly 3 draws
    s2 = prng.RandStream(5)
    for _ in range(3):
        s2.next()
    assert s.next() == s2.next()
