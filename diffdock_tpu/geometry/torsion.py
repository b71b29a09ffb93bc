"""Torsion-angle updates about rotatable bonds.

Device side: ``apply_torsion_updates`` applies per-bond dihedral rotations
sequentially with a ``lax.scan`` (order matters — later bonds rotate about
axes already moved by earlier bonds, exactly like the reference's Python
loop in ``utils/torsion.py:48-90``). Bond count is padded to a static
capacity; padding slots carry zero angle and an all-false rotation mask and
are exact no-ops.

Host side: ``rotatable_bond_mask`` reproduces the bridge-bond discovery of
reference ``utils/torsion.py:15-45`` (``get_transformation_mask``): a bond is
rotatable iff removing it disconnects the molecular graph into a smaller
component of >1 atoms; the moved side is the component containing the bond's
second endpoint.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffdock_tpu.geometry.rotations import axis_angle_to_matrix


def apply_torsion_updates(
    pos: jnp.ndarray,
    bond_u: jnp.ndarray,
    bond_v: jnp.ndarray,
    mask_rotate: jnp.ndarray,
    torsion_updates: jnp.ndarray,
    bond_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Sequentially rotate atom subsets about rotatable bonds.

    Args:
      pos: (N, 3) atom positions.
      bond_u: (B,) int source atoms of rotatable bonds (fixed side).
      bond_v: (B,) int second endpoints (on the rotated side).
      mask_rotate: (B, N) bool; row b marks atoms moved by bond b. By the
        reference convention ``mask_rotate[b, bond_u[b]]`` is False and
        ``mask_rotate[b, bond_v[b]]`` is True (``utils/torsion.py:60-66``).
      torsion_updates: (B,) rotation angles in radians.
      bond_mask: optional (B,) bool for padded bond slots.

    Returns:
      (N, 3) updated positions. Rotation convention matches the reference:
      axis = pos[u] - pos[v], positive angle rotates the masked side about
      the axis pointing "inwards".
    """
    if bond_mask is None:
        bond_mask = jnp.ones(bond_u.shape, dtype=bool)

    out, _ = jax.lax.scan(
        _torsion_scan_body, pos,
        (bond_u, bond_v, mask_rotate, torsion_updates, bond_mask),
    )
    return out


def _torsion_scan_body(p, inp):
    """Scan body of :func:`apply_torsion_updates`. Module-level (not a
    per-call closure) so its identity is stable: JAX's scan-jaxpr cache is
    keyed on (body function, input avals), and the avals here depend only
    on (n_atoms, n_bonds) — a sweep over many receptor sizes re-traces the
    outer program but reuses this body's trace whenever the ligand shape
    repeats (and the 'function is being re-defined repeatedly' tracing-
    cache warnings disappear from bench stderr)."""
    u, v, row_mask, theta, valid = inp
    axis = p[u] - p[v]
    norm = jnp.linalg.norm(axis)
    unit = axis / jnp.maximum(norm, 1e-12)
    rot = axis_angle_to_matrix(unit * theta)
    pivot = p[v]
    # HIGHEST precision: TPU default bf16 matmul visibly distorts geometry
    rotated = (
        jnp.einsum("ni,ji->nj", p - pivot, rot,
                   precision=jax.lax.Precision.HIGHEST)
        + pivot
    )
    keep = valid & row_mask
    p = jnp.where(keep[:, None], rotated, p)
    return p, None


def rotatable_bond_mask(
    num_atoms: int, bonds: Sequence[Tuple[int, int]]
) -> Tuple[np.ndarray, np.ndarray]:
    """Find rotatable bonds on the host (preprocessing).

    Args:
      num_atoms: number of atoms in the ligand.
      bonds: undirected bond list [(i, j), ...] in file order.

    Returns:
      edge_mask: (2 * n_bonds,) bool over the interleaved directed edge list
        [(i->j), (j->i), ...]; exactly one direction of each rotatable bond
        is marked, oriented so the rotated component contains the edge's
        *destination* atom (reference ``utils/torsion.py:15-45``).
      mask_rotate: (n_rotatable, num_atoms) bool; which atoms move per bond,
        rows ordered by directed-edge order.
    """
    import networkx as nx

    graph = nx.Graph()
    graph.add_nodes_from(range(num_atoms))
    graph.add_edges_from(bonds)

    to_rotate: List[List[int]] = []
    for i, j in bonds:
        g2 = graph.copy()
        g2.remove_edge(i, j)
        rotated_directed0: List[int] = []
        rotated_directed1: List[int] = []
        if not nx.is_connected(g2):
            smaller = sorted(nx.connected_components(g2), key=len)[0]
            if len(smaller) > 1:
                if i in smaller:
                    # directed edge (j -> i) moves component containing i
                    rotated_directed1 = sorted(smaller)
                else:
                    # directed edge (i -> j) moves component containing j
                    rotated_directed0 = sorted(smaller)
        to_rotate.append(rotated_directed0)
        to_rotate.append(rotated_directed1)

    edge_mask = np.array([len(l) > 0 for l in to_rotate], dtype=bool)
    mask_rotate = np.zeros((int(edge_mask.sum()), num_atoms), dtype=bool)
    idx = 0
    for l in to_rotate:
        if l:
            mask_rotate[idx, np.asarray(l, dtype=int)] = True
            idx += 1
    return edge_mask, mask_rotate
