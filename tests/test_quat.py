import numpy as np
import jax.numpy as jnp
import pytest

from rl_ode_physics_tpu.utils import quat as q


def _rand_quat(rng):
    v = rng.normal(size=4)
    return jnp.asarray(v / np.linalg.norm(v), jnp.float32)


def test_identity_rotation():
    v = jnp.array([1.0, 2.0, 3.0])
    assert np.allclose(q.rotate(q.identity(), v), v, atol=1e-6)


def test_mul_matches_matrix_product():
    rng = np.random.default_rng(0)
    for _ in range(10):
        a, b = _rand_quat(rng), _rand_quat(rng)
        m = np.asarray(q.to_matrix(q.mul(a, b)))
        mm = np.asarray(q.to_matrix(a)) @ np.asarray(q.to_matrix(b))
        assert np.allclose(m, mm, atol=1e-5)


def test_rotate_matches_matrix():
    rng = np.random.default_rng(1)
    for _ in range(10):
        a = _rand_quat(rng)
        v = jnp.asarray(rng.normal(size=3), jnp.float32)
        assert np.allclose(
            q.rotate(a, v), np.asarray(q.to_matrix(a)) @ np.asarray(v), atol=1e-5
        )


def test_from_matrix_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(20):
        a = _rand_quat(rng)
        b = q.from_matrix(q.to_matrix(a))
        # q and -q are the same rotation
        s = np.sign(np.dot(np.asarray(a), np.asarray(b)))
        assert np.allclose(np.asarray(a), s * np.asarray(b), atol=1e-4)


def test_from_matrix_batched():
    rng = np.random.default_rng(3)
    qs = jnp.stack([_rand_quat(rng) for _ in range(8)])
    back = q.from_matrix(q.to_matrix(qs))
    dots = np.sum(np.asarray(qs) * np.asarray(back), axis=-1)
    assert np.allclose(np.abs(dots), 1.0, atol=1e-4)


def test_euler_xyz_axis_rotations():
    # pure X/Y/Z rotations match axis-angle quats
    for axis_idx, axis in [(0, [1, 0, 0]), (1, [0, 1, 0]), (2, [0, 0, 1])]:
        ang = 0.7
        e = np.zeros(3)
        e[axis_idx] = ang
        qa = q.from_euler_xyz(jnp.asarray(e, jnp.float32))
        qb = q.from_axis_angle(jnp.asarray(axis, jnp.float32), jnp.asarray(ang, jnp.float32))
        assert np.allclose(np.asarray(qa), np.asarray(qb), atol=1e-6)


def test_euler_xyz_composition_order():
    # R = Rz @ Ry @ Rx (extrinsic XYZ) — the corrected GetTransformMatV matrix
    rng = np.random.default_rng(4)
    rx, ry, rz = rng.uniform(-1, 1, size=3)
    m = np.asarray(q.to_matrix(q.from_euler_xyz(jnp.asarray([rx, ry, rz], jnp.float32))))

    def rot(axis, t):
        c, s = np.cos(t), np.sin(t)
        if axis == 0:
            return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
        if axis == 1:
            return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    expected = rot(2, rz) @ rot(1, ry) @ rot(0, rx)
    assert np.allclose(m, expected, atol=1e-5)


def test_integrate_constant_omega():
    # rotating about z at w for t seconds ≈ axis-angle w*t (small steps)
    import jax

    omega = jnp.array([0.0, 0.0, 2.0])
    dt = 1e-3
    qq, _ = jax.lax.scan(
        lambda s, _: (q.integrate(s, omega, dt), None), q.identity(), length=1000
    )
    expected = q.from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.asarray(2.0))
    assert np.allclose(np.asarray(qq), np.asarray(expected), atol=1e-3)
