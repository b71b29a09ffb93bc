"""Closed-form 3x3 Kabsch alignment via Horn's quaternion method.

The reference computes the optimal rigid alignment with a batched
``torch.linalg.svd`` plus an explicit reflection fix
(``utils/geometry.py:209-283``). On TPU we avoid SVD entirely: the optimal
*proper* rotation is the eigenvector of Horn's symmetric 4x4 quaternion
matrix with the largest eigenvalue (same construction as the QCP method in
the reference's vendored ``spyrmsd/qcp.py``). ``jnp.linalg.eigh`` on a 4x4
symmetric matrix is branch-free, batched, and differentiable, and it returns
the best proper rotation directly — no det(R) < 0 special case.

Supports masked (padded) point sets; masked rows are excluded from centroids
and the correlation matrix.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from diffdock_tpu.geometry.rotations import quaternion_to_matrix


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x, axis=axis, keepdims=True)
    w = mask[..., None].astype(x.dtype)
    denom = jnp.maximum(jnp.sum(w, axis=axis, keepdims=True), 1.0)
    return jnp.sum(x * w, axis=axis, keepdims=True) / denom


def kabsch_rotation(
    a: jnp.ndarray,
    b: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Optimal proper rigid transform mapping point set ``a`` onto ``b``.

    Args:
      a: (..., N, 3) source points.
      b: (..., N, 3) target points (row-wise corresponding).
      mask: optional (..., N) validity mask for padded rows.

    Returns:
      (R, t) with R (..., 3, 3), t (..., 3) such that ``a @ R.T + t`` best
      matches ``b`` in least squares among proper rotations — the same
      optimum as reference ``rigid_transform_Kabsch_3D_torch_batch``
      (``utils/geometry.py:246-283``) after its reflection fix.
    """
    centroid_a = _masked_mean(a, mask, axis=-2)
    centroid_b = _masked_mean(b, mask, axis=-2)
    am = a - centroid_a
    bm = b - centroid_b
    if mask is not None:
        w = mask[..., None].astype(a.dtype)
        am = am * w
        bm = bm * w

    # Correlation matrix H[i, j] = sum_n am[n, i] * bm[n, j]
    # HIGHEST precision: TPU matmuls default to bf16, which visibly distorts
    # rigid-body geometry (bond lengths drift by ~0.1 A at pose scale).
    h = jnp.einsum("...ni,...nj->...ij", am, bm, precision=jax.lax.Precision.HIGHEST)

    sxx, sxy, sxz = h[..., 0, 0], h[..., 0, 1], h[..., 0, 2]
    syx, syy, syz = h[..., 1, 0], h[..., 1, 1], h[..., 1, 2]
    szx, szy, szz = h[..., 2, 0], h[..., 2, 1], h[..., 2, 2]

    # Horn's K matrix: largest-eigenvalue eigenvector = optimal quaternion.
    k00 = sxx + syy + szz
    k01 = syz - szy
    k02 = szx - sxz
    k03 = sxy - syx
    k11 = sxx - syy - szz
    k12 = sxy + syx
    k13 = szx + sxz
    k22 = -sxx + syy - szz
    k23 = syz + szy
    k33 = -sxx - syy + szz
    k = jnp.stack(
        [
            jnp.stack([k00, k01, k02, k03], axis=-1),
            jnp.stack([k01, k11, k12, k13], axis=-1),
            jnp.stack([k02, k12, k22, k23], axis=-1),
            jnp.stack([k03, k13, k23, k33], axis=-1),
        ],
        axis=-2,
    )

    _, eigvecs = jnp.linalg.eigh(k)  # ascending eigenvalues
    quat = eigvecs[..., :, -1]  # (w, x, y, z)
    rot = quaternion_to_matrix(quat)

    t = centroid_b[..., 0, :] - jnp.einsum(
        "...ij,...j->...i", rot, centroid_a[..., 0, :],
        precision=jax.lax.Precision.HIGHEST,
    )
    return rot, t


def kabsch_align(
    a: jnp.ndarray,
    b: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Return ``a`` rigidly aligned onto ``b``: ``a @ R.T + t``."""
    rot, t = kabsch_rotation(a, b, mask=mask)
    return (
        jnp.einsum("...ni,...ji->...nj", a, rot, precision=jax.lax.Precision.HIGHEST)
        + t[..., None, :]
    )
