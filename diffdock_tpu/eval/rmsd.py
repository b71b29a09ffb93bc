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


def qcp_rmsd(a: np.ndarray, b: np.ndarray) -> float:
    """Minimum RMSD after optimal superposition via the quaternion
    characteristic polynomial (reference vendored ``spyrmsd/qcp.py:15-288``,
    Theobald 2005). Host-side numpy; used for alignment-invariant metrics
    like conformer-matching quality."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    n = a.shape[0]
    ac = a - a.mean(0)
    bc = b - b.mean(0)
    ga = (ac * ac).sum()
    gb = (bc * bc).sum()
    M = ac.T @ bc  # (3, 3)
    # Davenport K matrix: its largest eigenvalue is the QCP lambda_max
    Sxx, Sxy, Sxz = M[0]
    Syx, Syy, Syz = M[1]
    Szx, Szy, Szz = M[2]
    K = np.array([
        [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
        [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
        [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
        [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
    ])
    lam = float(np.linalg.eigvalsh(K)[-1])
    msd = max((ga + gb - 2.0 * lam) / n, 0.0)
    return float(np.sqrt(msd))


def hungarian_rmsd(
    a: np.ndarray, b: np.ndarray, elements: Sequence[str]
) -> float:
    """Element-wise optimal-assignment RMSD (reference vendored
    ``spyrmsd/hungarian.py:13-120``): within each element class, atoms of
    ``b`` are re-assigned to atoms of ``a`` by solving the linear sum
    assignment over squared distances."""
    from scipy.optimize import linear_sum_assignment

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    elements = np.asarray(elements)
    total, n = 0.0, a.shape[0]
    for el in np.unique(elements):
        idx = np.flatnonzero(elements == el)
        cost = ((a[idx][:, None] - b[idx][None]) ** 2).sum(-1)
        ri, ci = linear_sum_assignment(cost)
        total += cost[ri, ci].sum()
    return float(np.sqrt(total / n))


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
