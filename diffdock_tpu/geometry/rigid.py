"""Conformer update on the product manifold T(3) x SO(3) x SO(2)^m.

``modify_conformer`` applies one reverse-diffusion update to a ligand pose:
rigid rotation about the ligand center, translation, sequential torsion
rotations, then a Kabsch re-alignment of the torsioned conformer onto the
rigidly-moved one so the torsion update stays disentangled from tr/rot
(reference ``utils/diffusion_utils.py:35-78``).

Everything is mask-aware for padded atom slots and designed to be ``vmap``-ed
over a batch of poses — unlike the reference's ``modify_conformer_batch``
which requires equal-size replicas flattened into one tensor, here each pose
is an independent (N, 3) array and batching is a functional transform.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from diffdock_tpu.geometry.kabsch import kabsch_align
from diffdock_tpu.geometry.rotations import axis_angle_to_matrix
from diffdock_tpu.geometry.torsion import apply_torsion_updates


def _masked_center(pos: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(pos, axis=-2, keepdims=True)
    w = mask[..., None].astype(pos.dtype)
    return jnp.sum(pos * w, axis=-2, keepdims=True) / jnp.maximum(
        jnp.sum(w, axis=-2, keepdims=True), 1.0
    )


def modify_conformer(
    pos: jnp.ndarray,
    tr_update: jnp.ndarray,
    rot_update: jnp.ndarray,
    torsion_updates: Optional[jnp.ndarray] = None,
    bond_u: Optional[jnp.ndarray] = None,
    bond_v: Optional[jnp.ndarray] = None,
    mask_rotate: Optional[jnp.ndarray] = None,
    bond_mask: Optional[jnp.ndarray] = None,
    atom_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Apply (tr, rot, torsions) to one ligand pose.

    Args:
      pos: (N, 3) ligand positions.
      tr_update: (3,) translation.
      rot_update: (3,) axis-angle rotation applied about the ligand center.
      torsion_updates: optional (B,) torsion angles for rotatable bonds.
      bond_u / bond_v / mask_rotate / bond_mask: rotatable-bond structure as
        in :func:`diffdock_tpu.geometry.torsion.apply_torsion_updates`.
      atom_mask: optional (N,) validity mask for padded atoms.

    Returns:
      (N, 3) new positions (padded slots follow the rigid motion; they are
      masked out of the center and the Kabsch alignment so they never affect
      real atoms).
    """
    center = _masked_center(pos, atom_mask)
    rot_mat = axis_angle_to_matrix(rot_update)
    # HIGHEST precision: TPU default bf16 matmul visibly distorts geometry
    rigid_new_pos = (
        jnp.einsum("...ni,...ji->...nj", pos - center, rot_mat,
                   precision=jax.lax.Precision.HIGHEST)
        + tr_update + center
    )

    if torsion_updates is None:
        return rigid_new_pos

    flexible_new_pos = apply_torsion_updates(
        rigid_new_pos, bond_u, bond_v, mask_rotate, torsion_updates, bond_mask
    )
    return kabsch_align(flexible_new_pos, rigid_new_pos, mask=atom_mask)
