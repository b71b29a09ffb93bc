"""Symmetry-corrected heavy-atom RMSD (spyrmsd-equivalent, host-side).

The reference vendors spyrmsd and evaluates min RMSD over molecular-graph
automorphisms (``spyrmsd/rmsd.py:209-304``, called via
``utils/molecules_utils.py:3-18`` with a 10s timeout). Here: networkx VF2
automorphism enumeration with element-labeled nodes, an enumeration cap, and
a plain-RMSD fallback — evaluation-plane code, no device work.
"""

from __future__ import annotations

import itertools
import time
from typing import List, Optional, Sequence, Tuple

import numpy as np


def simple_rmsd(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.sqrt(np.mean(np.sum((a - b) ** 2, axis=1))))


def molecular_automorphisms(
    elements: Sequence[str],
    bonds: Sequence[Tuple[int, int]],
    max_isomorphisms: int = 10000,
    time_budget_s: float = 10.0,
) -> List[np.ndarray]:
    """Element-preserving graph automorphisms as index permutations."""
    import networkx as nx
    from networkx.algorithms.isomorphism import GraphMatcher, categorical_node_match

    g = nx.Graph()
    for i, el in enumerate(elements):
        g.add_node(i, element=el)
    g.add_edges_from(bonds)

    matcher = GraphMatcher(g, g, node_match=categorical_node_match("element", None))
    perms = []
    t0 = time.time()
    n = len(elements)
    for mapping in matcher.isomorphisms_iter():
        perm = np.empty(n, dtype=np.int64)
        for src, dst in mapping.items():
            perm[src] = dst
        perms.append(perm)
        if len(perms) >= max_isomorphisms or time.time() - t0 > time_budget_s:
            break
    if not perms:
        perms = [np.arange(n)]
    return perms


def symmetry_rmsd(
    ref_coords: np.ndarray,
    pose_coords: np.ndarray,
    elements: Sequence[str],
    bonds: Sequence[Tuple[int, int]],
    perms: Optional[List[np.ndarray]] = None,
    time_budget_s: float = 10.0,
) -> float:
    """Min RMSD over graph automorphisms; reuse ``perms`` across poses of the
    same molecule (the reference caches isomorphisms the same way,
    ``spyrmsd/rmsd.py:246-260``).

    pose_coords may be (N, 3) or (P, N, 3); returns float or (P,) array.
    """
    if perms is None:
        perms = molecular_automorphisms(
            elements, bonds, time_budget_s=time_budget_s
        )
    single = pose_coords.ndim == 2
    poses = pose_coords[None] if single else pose_coords

    perm_arr = np.stack(perms)  # (M, N)
    # rmsd[p, m] over permuted reference
    ref_perm = ref_coords[perm_arr]  # (M, N, 3)
    diff = poses[:, None, :, :] - ref_perm[None, :, :, :]
    rmsds = np.sqrt(np.mean(np.sum(diff**2, axis=-1), axis=-1))  # (P, M)
    best = rmsds.min(axis=1)
    return float(best[0]) if single else best
