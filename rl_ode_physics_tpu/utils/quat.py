"""Quaternion and rotation utilities (ODE conventions, jit/vmap friendly).

Quaternions are stored ``(w, x, y, z)`` — the same layout ODE's ``dQuaternion``
uses. All functions are shape-polymorphic over leading batch dimensions: they
accept ``(..., 4)`` / ``(..., 3)`` arrays and are safe under ``jax.vmap``.

Replaces the transform math of the reference game
(``/root/reference/src/main.c:602-672``) with a quaternion-first design: on
TPU we keep orientation as a quaternion in the state pytree (4 floats instead
of 9, cheap renormalization) and materialize rotation matrices only where the
narrowphase needs them.
"""

from __future__ import annotations

import jax.numpy as jnp


def identity(dtype=jnp.float32) -> jnp.ndarray:
    """The identity quaternion (w=1)."""
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalize to a unit quaternion; guards the zero quaternion."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b, (..., 4) × (..., 4) → (..., 4)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def conj(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (inverse for unit quaternions)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by unit quaternion(s) q.

    Uses the 2-cross-product formulation (15 mul + 15 add), cheaper than
    building the rotation matrix for a single vector.
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate v by the inverse of unit quaternion q (world → body frame)."""
    return rotate(conj(q), v)


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion → 3×3 rotation matrix, (..., 4) → (..., 3, 3).

    Rows are the world-frame images of the body axes' dual; ``R @ v_body``
    gives the world-frame vector (same convention as ODE's ``dRfromQ``).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(r.shape[:-1] + (3, 3))


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """3×3 rotation matrix → unit quaternion, (..., 3, 3) → (..., 4).

    Branch-free (jit-safe) Shepperd-style extraction: computes all four
    candidate 4-vectors and selects the best-conditioned one with
    ``jnp.where`` — no data-dependent control flow.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each valid when its pivot is the largest.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5

    c0 = jnp.stack([qw[..., 0],
                    (m21 - m12) / (4.0 * qw[..., 0]),
                    (m02 - m20) / (4.0 * qw[..., 0]),
                    (m10 - m01) / (4.0 * qw[..., 0])], axis=-1)
    c1 = jnp.stack([(m21 - m12) / (4.0 * qw[..., 1]),
                    qw[..., 1],
                    (m01 + m10) / (4.0 * qw[..., 1]),
                    (m02 + m20) / (4.0 * qw[..., 1])], axis=-1)
    c2 = jnp.stack([(m02 - m20) / (4.0 * qw[..., 2]),
                    (m01 + m10) / (4.0 * qw[..., 2]),
                    qw[..., 2],
                    (m12 + m21) / (4.0 * qw[..., 2])], axis=-1)
    c3 = jnp.stack([(m10 - m01) / (4.0 * qw[..., 3]),
                    (m02 + m20) / (4.0 * qw[..., 3]),
                    (m12 + m21) / (4.0 * qw[..., 3]),
                    qw[..., 3]], axis=-1)

    # Pick the branch with the largest pivot (numerically safest).
    piv = jnp.stack([tr, m00, m11, m22], axis=-1)
    best = jnp.argmax(piv, axis=-1)[..., None]
    out = jnp.where(best == 0, c0,
          jnp.where(best == 1, c1,
          jnp.where(best == 2, c2, c3)))
    return normalize(out)


def from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Unit axis + angle (rad) → quaternion."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def from_euler_xyz(rot: jnp.ndarray) -> jnp.ndarray:
    """Euler angles (X then Y then Z, extrinsic — i.e. R = Rz·Ry·Rx) → quat.

    Matches the *intended* rotation of the reference's ``GetTransformMatV``
    (``src/main.c:624-651``). The reference contains a typo in one matrix
    entry (``src/main.c:639``: the final ``sx`` should be ``sz``); per
    SURVEY.md §2e we implement the correct Euler-XYZ matrix.
    """
    rx, ry, rz = rot[..., 0], rot[..., 1], rot[..., 2]
    hx, hy, hz = 0.5 * rx, 0.5 * ry, 0.5 * rz
    cx, sx = jnp.cos(hx), jnp.sin(hx)
    cy, sy = jnp.cos(hy), jnp.sin(hy)
    cz, sz = jnp.cos(hz), jnp.sin(hz)
    # q = qz ⊗ qy ⊗ qx (extrinsic XYZ == R = Rz Ry Rx)
    return jnp.stack(
        [
            cz * cy * cx + sz * sy * sx,
            cz * cy * sx - sz * sy * cx,
            cz * sy * cx + sz * cy * sx,
            sz * cy * cx - cz * sy * sx,
        ],
        axis=-1,
    )


def integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Advance orientation by world-frame angular velocity over dt.

    ODE's default "infinitesimal" update: q ← normalize(q + dt/2·(ω ⊗ q)),
    with ω embedded as the pure quaternion (0, ωx, ωy, ωz). Deterministic and
    branch-free — safe inside ``lax.scan`` step loops.
    """
    omega_q = jnp.concatenate(
        [jnp.zeros_like(omega_world[..., :1]), omega_world], axis=-1
    )
    dq = 0.5 * mul(omega_q, q)
    return normalize(q + dt * dq)
