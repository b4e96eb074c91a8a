import numpy as np
import jax.numpy as jnp

from rl_ode_physics_tpu.utils import quat as q
from rl_ode_physics_tpu.utils import transforms as tf


def test_wire_layout_identity():
    m = tf.mat16_from_pos_quat(jnp.zeros(3), q.identity())
    assert np.allclose(np.asarray(m), np.eye(4).flatten(order="F"))


def test_wire_layout_matches_reference_gettransformmat():
    """GetTransformMat (src/main.c:602): column-major with pos at 12..14."""
    rng = np.random.default_rng(0)
    v = rng.normal(size=4)
    quat = jnp.asarray(v / np.linalg.norm(v), jnp.float32)
    pos = jnp.asarray(rng.normal(size=3), jnp.float32)
    r = np.asarray(q.to_matrix(quat))
    m = np.asarray(tf.mat16_from_pos_rot(pos, q.to_matrix(quat)))

    # column-major: m[4c+r] == R[r,c]
    for c in range(3):
        for rr in range(3):
            assert np.isclose(m[4 * c + rr], r[rr, c], atol=1e-6)
    assert np.allclose(m[12:15], np.asarray(pos))
    assert m[3] == m[7] == m[11] == 0.0 and m[15] == 1.0


def test_roundtrip_pos_rot():
    rng = np.random.default_rng(1)
    v = rng.normal(size=4)
    quat = jnp.asarray(v / np.linalg.norm(v), jnp.float32)
    pos = jnp.asarray(rng.normal(size=3), jnp.float32)
    m = tf.mat16_from_pos_quat(pos, quat)
    assert np.allclose(np.asarray(tf.pos_from_mat16(m)), np.asarray(pos), atol=1e-6)
    back = tf.quat_from_mat16(m)
    dot = abs(float(jnp.dot(back, quat)))
    assert abs(dot - 1.0) < 1e-4


def test_batched():
    pos = jnp.asarray(np.random.default_rng(2).normal(size=(5, 3)), jnp.float32)
    quats = jnp.tile(q.identity(), (5, 1))
    m = tf.mat16_from_pos_quat(pos, quats)
    assert m.shape == (5, 16)
    assert np.allclose(np.asarray(m[:, 12:15]), np.asarray(pos))


def test_euler_transform_rowmajor_matches_reference_v():
    # mat16_rowmajor_from_pos_euler equals the *corrected* GetTransformMatV
    rx, ry, rz = 0.3, -0.4, 0.9
    m = np.asarray(tf.mat16_rowmajor_from_pos_euler(
        jnp.array([1.0, 2.0, 3.0]), jnp.array([rx, ry, rz])))
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    # reference layout (src/main.c:632-650) with the :639 typo fixed
    expected = np.array([
        cy * cz, cz * sx * sy - cx * sz, cx * cz * sy + sx * sz, 0,
        cy * sz, cx * cz + sx * sy * sz, -cz * sx + cx * sy * sz, 0,
        -sy, cy * sx, cx * cy, 0,
        1.0, 2.0, 3.0, 1.0,
    ])
    assert np.allclose(m, expected, atol=1e-5)


def test_rowmajor_roundtrip():
    rot = jnp.array([0.1, 0.2, 0.3])
    pos = jnp.array([4.0, 5.0, 6.0])
    m = tf.mat16_rowmajor_from_pos_euler(pos, rot)
    r = np.asarray(tf.rot_from_mat16_rowmajor(m))
    expected = np.asarray(q.to_matrix(q.from_euler_xyz(rot)))
    assert np.allclose(r, expected, atol=1e-6)
    assert np.allclose(np.asarray(tf.pos_from_mat16(m)), np.asarray(pos))
