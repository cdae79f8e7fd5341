"""Rotation math: 6DoF Gram-Schmidt rotations, axis-angle (Rodrigues), Euler
roll/pitch/yaw — all pure JAX, batched, differentiable.

Semantics match the reference:
  - ``rot_mat_from_6dof``: /root/reference/model_training/model/utils.py:92-101
    (b1 = norm(vx); b3 = norm(b1 x vy); b2 = -(b1 x b3); columns [b1 b2 b3]).
  - ``calculate_rpy``: /root/reference/model_training/model/flame.py:239-259
    (transpose, xyz-euler in degrees, remap [z, x-180, y] with angle limiting).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


class RPY(NamedTuple):
    roll: jax.Array
    pitch: jax.Array
    yaw: jax.Array


def _safe_norm(v: jax.Array, axis: int = -1) -> jax.Array:
    """L2 norm whose GRADIENT is zero (not NaN) at v == 0.

    ``jnp.linalg.norm``'s VJP at zero is 0/0 = NaN, and a downstream
    ``jnp.maximum(norm, eps)`` only fixes the forward value (0 * NaN = NaN
    still poisons the backward pass). ``sqrt(maximum(sum(v^2), eps^2))``
    routes the gradient through ``maximum``'s zero branch instead — matching
    the torch reference, whose F.normalize/norm backward is finite at zero
    (a zero-init rotation head on step 0 hits exactly this)."""
    sq = jnp.sum(v * v, axis=axis, keepdims=True)
    return jnp.sqrt(jnp.maximum(sq, _EPS * _EPS))


def _normalize(v: jax.Array, axis: int = -1) -> jax.Array:
    return v / _safe_norm(v, axis=axis)


def rot_mat_from_6dof(v: jax.Array) -> jax.Array:
    """6D rotation representation -> rotation matrices.

    Args:
      v: (..., 6) continuous 6D rotation representation.
    Returns:
      (..., 3, 3) rotation matrices with columns [b1, b2, b3].
    """
    assert v.shape[-1] == 6, v.shape
    vx, vy = v[..., :3], v[..., 3:]
    b1 = _normalize(vx)
    b3 = _normalize(jnp.cross(b1, vy))
    b2 = -jnp.cross(b1, b3)
    return jnp.stack((b1, b2, b3), axis=-1)


def rotate_vertices(R: jax.Array, vertices: jax.Array) -> jax.Array:
    """Apply (B, 3, 3) rotations to (B, V, 3) vertices — THE canonical
    global-rotation application (fp32 MXU precision); flame_decode, the
    losses' shared decode, and the predictor all route through it so the
    train-time geometry can never drift from inference."""
    return jnp.einsum(
        "bxy,bvy->bvx", R, vertices, precision=jax.lax.Precision.HIGHEST
    )


def rodrigues(aa: jax.Array) -> jax.Array:
    """Axis-angle vectors -> rotation matrices (batched Rodrigues formula).

    Args:
      aa: (..., 3) axis-angle.
    Returns:
      (..., 3, 3) rotation matrices.
    """
    angle = _safe_norm(aa, axis=-1)  # (..., 1); zero-safe gradient
    axis = aa / angle
    cos = jnp.cos(angle)[..., None]
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(aa.shape[:-1] + (3, 3))
    eye = jnp.eye(3, dtype=aa.dtype)
    outer = axis[..., :, None] * axis[..., None, :]
    return cos * eye + (1.0 - cos) * outer + sin * K


def mat_to_euler_xyz(R: jax.Array) -> jax.Array:
    """Rotation matrices -> intrinsic xyz Euler angles in radians.

    Matches scipy's ``Rotation.as_euler('xyz')`` convention for the
    non-degenerate case: R = Rz(c) @ Ry(b) @ Rx(a), returns (a, b, c).
    """
    sy = -R[..., 2, 0]
    sy = jnp.clip(sy, -1.0, 1.0)
    b = jnp.arcsin(sy)
    a = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    c = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


def limit_angle(angle: jax.Array, pi: float = 180.0) -> jax.Array:
    """Wrap angles (degrees) into (-pi, pi]."""
    return angle - 2.0 * pi * jnp.round(angle / (2.0 * pi))


def calculate_rpy(rotation_6dof: jax.Array) -> RPY:
    """6DoF rotation -> roll/pitch/yaw in degrees (reference head-pose axes)."""
    R = rot_mat_from_6dof(jnp.atleast_2d(rotation_6dof))
    ang = jnp.degrees(mat_to_euler_xyz(jnp.swapaxes(R, -1, -2)))
    roll = limit_angle(ang[..., 2])
    pitch = limit_angle(ang[..., 0] - 180.0)
    yaw = limit_angle(ang[..., 1])
    return RPY(roll=roll, pitch=pitch, yaw=yaw)
