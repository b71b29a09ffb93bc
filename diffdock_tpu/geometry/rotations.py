"""Branch-free rotation conversions for TPU.

Semantics match the conversions the reference uses (pytorch3d-style
quaternion route, reference ``utils/geometry.py:7-200``), but every function
here is written branch-free (``jnp.where`` instead of boolean indexing) so it
jits, vmaps and differentiates cleanly on TPU.

Conventions:
  * quaternions are (w, x, y, z) with real part first,
  * axis-angle vectors encode the rotation angle as their norm,
  * rotation matrices act on column vectors, ``x' = R @ x``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


def _sin_half_over_angle(angles: jnp.ndarray) -> jnp.ndarray:
    """sin(angle/2)/angle with a 2nd-order Taylor fallback near zero.

    Matches the small-angle branch of the reference conversion
    (``utils/geometry.py:56-64``): 0.5 - angle^2 / 48.
    """
    small = jnp.abs(angles) < _EPS
    safe = jnp.where(small, 1.0, angles)
    exact = jnp.sin(0.5 * safe) / safe
    taylor = 0.5 - (angles * angles) / 48.0
    return jnp.where(small, taylor, exact)


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle -> (..., 4) unit quaternion (w first)."""
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    sin_half_over = _sin_half_over_angle(angles)
    return jnp.concatenate(
        [jnp.cos(0.5 * angles), axis_angle * sin_half_over], axis=-1
    )


def quaternion_to_matrix(quaternions: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) quaternion (w first, not necessarily unit) -> (..., 3, 3)."""
    r, i, j, k = jnp.moveaxis(quaternions, -1, 0)
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(quaternions.shape[:-1] + (3, 3))


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle -> (..., 3, 3) rotation matrix."""
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 4) quaternion (w first).

    Branch-free variant of the best-conditioned-candidate method
    (reference ``utils/geometry.py:100-160``): compute all four candidate
    quaternions and select via one-hot on the largest |q| component.
    """
    batch = matrix.shape[:-2]
    m = matrix.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(m, -1, 0)

    q_abs_sq = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs_sq, 0.0))

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    denom = 2.0 * jnp.maximum(q_abs[..., None], 0.1)
    quat_candidates = quat_by_rijk / denom

    best = jax.nn.one_hot(jnp.argmax(q_abs, axis=-1), 4, dtype=matrix.dtype)
    quat = jnp.sum(quat_candidates * best[..., None], axis=-2)
    # canonicalize to w >= 0 so the derived axis-angle has angle <= pi
    return quat * jnp.where(quat[..., :1] < 0, -1.0, 1.0)


def quaternion_to_axis_angle(quaternions: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) quaternion (w first) -> (..., 3) axis-angle."""
    norms = jnp.linalg.norm(quaternions[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    angles = 2.0 * half_angles
    sin_half_over = _sin_half_over_angle(angles)
    return quaternions[..., 1:] / sin_half_over


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation matrix -> (..., 3) axis-angle."""
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def random_rotation_matrix(key: jax.Array, shape=()) -> jnp.ndarray:
    """Haar-uniform random rotation matrices of shape ``shape + (3, 3)``.

    Uses the normalized-Gaussian quaternion construction (equivalent in
    distribution to ``scipy.spatial.transform.Rotation.random`` used at
    reference ``utils/sampling.py:44``).
    """
    q = jax.random.normal(key, shape + (4,))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return quaternion_to_matrix(q)
