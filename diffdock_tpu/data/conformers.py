"""Conformer generation and matching (reference
``datasets/conformer_matching.py:16-85``, ``process_mols.py:304-384``).

Training data prep: the model must learn from *generated* conformers whose
torsions are optimized to match the crystal pose ("conformer matching" from
Torsional Diffusion). Host-side numpy/scipy:

* conformer generation: RDKit ETKDG when available; otherwise torsion
  randomization of the input conformer (exact same degrees of freedom the
  diffusion acts on — self-consistent for training, documented deviation),
* torsion optimization: scipy differential evolution over rotatable-bond
  angles minimizing RMSD to the crystal pose, like the reference's
  ``OptimizeConformer``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from diffdock_tpu.data.chem import HAVE_RDKIT, Molecule
from diffdock_tpu.geometry.torsion import rotatable_bond_mask


def apply_torsion_np(
    pos: np.ndarray,
    edges: np.ndarray,
    mask_rotate: np.ndarray,
    updates: np.ndarray,
) -> np.ndarray:
    """Numpy twin of the device torsion update (reference
    ``utils/torsion.py:48-72``) for host-side optimization loops."""
    from scipy.spatial.transform import Rotation as R

    pos = pos.copy()
    for idx, (u, v) in enumerate(edges):
        theta = updates[idx]
        if theta == 0:
            continue
        axis = pos[u] - pos[v]
        axis = axis / np.linalg.norm(axis) * theta
        rot = R.from_rotvec(axis).as_matrix()
        sel = mask_rotate[idx]
        pos[sel] = (pos[sel] - pos[v]) @ rot.T + pos[v]
    return pos


def rotatable_edges(mol: Molecule) -> Tuple[np.ndarray, np.ndarray]:
    bonds = [(i, j) for i, j, _ in mol.bonds]
    edge_mask, mask_rotate = rotatable_bond_mask(mol.num_atoms, bonds)
    directed = []
    for i, j in bonds:
        directed += [(i, j), (j, i)]
    edges = np.asarray(
        [directed[k] for k in np.flatnonzero(edge_mask)], np.int64
    ).reshape(-1, 2)
    return edges, mask_rotate


def generate_conformer(
    mol: Molecule, seed: int = 0, randomize_torsions: bool = True
) -> Molecule:
    """A fresh conformer: RDKit ETKDG when importable, else torsion
    randomization of the given geometry."""
    if HAVE_RDKIT:  # pragma: no cover - optional path
        from rdkit import Chem
        from rdkit.Chem import AllChem

        from diffdock_tpu.data.chem import molecule_from_rdkit

        rd = Chem.RWMol()
        for el in mol.elements:
            rd.AddAtom(Chem.Atom(el))
        order_map = {1: Chem.BondType.SINGLE, 2: Chem.BondType.DOUBLE,
                     3: Chem.BondType.TRIPLE, 4: Chem.BondType.AROMATIC}
        for i, j, o in mol.bonds:
            rd.AddBond(i, j, order_map.get(o, Chem.BondType.SINGLE))
        m = rd.GetMol()
        try:
            Chem.SanitizeMol(m)
            ps = AllChem.ETKDGv3()
            ps.randomSeed = seed
            if AllChem.EmbedMolecule(m, ps) == 0:
                out = molecule_from_rdkit(m)
                out.charges = list(mol.charges)
                out.name = mol.name
                return out
        except Exception:
            pass

    edges, mask_rotate = rotatable_edges(mol)
    rng = np.random.RandomState(seed)
    pos = np.asarray(mol.coords, np.float64)
    if randomize_torsions and len(edges):
        updates = rng.uniform(-np.pi, np.pi, size=len(edges))
        pos = apply_torsion_np(pos, edges, mask_rotate, updates)
    return Molecule(
        elements=list(mol.elements), coords=pos.astype(np.float32),
        bonds=list(mol.bonds), charges=list(mol.charges), name=mol.name,
    )


def _aligned_rmsd(a: np.ndarray, b: np.ndarray) -> float:
    """RMSD after optimal rigid alignment (the matching objective aligns
    before scoring, reference ``conformer_matching.py:39-52``)."""
    ca, cb = a.mean(0), b.mean(0)
    am, bm = a - ca, b - cb
    h = am.T @ bm
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    rot = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    return float(np.sqrt(np.mean(np.sum((am @ rot.T - bm) ** 2, axis=1))))


def optimize_rotatable_bonds(
    conf_pos: np.ndarray,
    ref_pos: np.ndarray,
    edges: np.ndarray,
    mask_rotate: np.ndarray,
    popsize: int = 20,
    maxiter: int = 20,
    seed: int = 0,
) -> Tuple[np.ndarray, float]:
    """Differential evolution over torsions to best match the reference pose
    (reference ``optimize_rotatable_bonds``, ``conformer_matching.py:16-38``).

    Returns (optimized positions, aligned RMSD)."""
    from scipy.optimize import differential_evolution

    if len(edges) == 0:
        return conf_pos.copy(), _aligned_rmsd(conf_pos, ref_pos)

    def objective(x):
        moved = apply_torsion_np(conf_pos, edges, mask_rotate, x)
        return _aligned_rmsd(moved, ref_pos)

    bounds = [(-np.pi, np.pi)] * len(edges)
    res = differential_evolution(
        objective, bounds, popsize=popsize, maxiter=maxiter, seed=seed,
        polish=False,
    )
    out = apply_torsion_np(conf_pos, edges, mask_rotate, res.x)
    return out, float(res.fun)


def conformer_match(
    mol: Molecule, tries: int = 1, popsize: int = 20, maxiter: int = 20,
    seed: int = 0,
) -> Tuple[Molecule, float]:
    """Full matching flow: generate conformer(s), optimize torsions to the
    crystal pose, keep the best (reference ``get_lig_graph_with_matching``,
    ``process_mols.py:304-384``)."""
    edges, mask_rotate = rotatable_edges(mol)
    ref = np.asarray(mol.coords, np.float64)
    best_pos, best_rmsd = None, np.inf
    for k in range(tries):
        conf = generate_conformer(mol, seed=seed + k)
        pos, rmsd = optimize_rotatable_bonds(
            np.asarray(conf.coords, np.float64), ref, edges, mask_rotate,
            popsize=popsize, maxiter=maxiter, seed=seed + k,
        )
        if rmsd < best_rmsd:
            best_pos, best_rmsd = pos, rmsd
    matched = Molecule(
        elements=list(mol.elements), coords=best_pos.astype(np.float32),
        bonds=list(mol.bonds), charges=list(mol.charges), name=mol.name,
    )
    return matched, best_rmsd
