"""Conformer matching: torsion randomization must be recoverable."""

import numpy as np

from diffdock_tpu.data.chem import read_molecule_file
from diffdock_tpu.data.conformers import (
    apply_torsion_np,
    conformer_match,
    generate_conformer,
    rotatable_edges,
)

EXAMPLE = "/root/reference/examples/6w70_ligand.sdf"


def test_generate_conformer_changes_torsions_not_bonds():
    mol = read_molecule_file(EXAMPLE).remove_hs()
    conf = generate_conformer(mol, seed=1)
    # bond lengths preserved
    for i, j, _ in mol.bonds:
        b0 = np.linalg.norm(mol.coords[i] - mol.coords[j])
        b1 = np.linalg.norm(conf.coords[i] - conf.coords[j])
        np.testing.assert_allclose(b0, b1, atol=1e-3)
    # geometry actually changed
    assert np.abs(conf.coords - mol.coords).max() > 0.5


def test_conformer_match_recovers_crystal_torsions():
    mol = read_molecule_file(EXAMPLE).remove_hs()
    matched, rmsd = conformer_match(mol, tries=1, popsize=15, maxiter=25, seed=3)
    # torsion-only DOF: matching should get reasonably close to the crystal
    # (the reference reports ~1-2 A matching RMSD on PDBBind ligands)
    assert rmsd < 2.5, rmsd
    # and far better than the unmatched randomized conformer
    conf = generate_conformer(mol, seed=3)
    from diffdock_tpu.data.conformers import _aligned_rmsd

    unmatched = _aligned_rmsd(
        np.asarray(conf.coords, float), np.asarray(mol.coords, float)
    )
    assert rmsd < unmatched


def test_apply_torsion_np_roundtrip():
    mol = read_molecule_file(EXAMPLE).remove_hs()
    edges, mask_rotate = rotatable_edges(mol)
    rng = np.random.RandomState(0)
    updates = rng.uniform(-1, 1, size=len(edges))
    pos = np.asarray(mol.coords, float)
    fwd = apply_torsion_np(pos, edges, mask_rotate, updates)
    back = apply_torsion_np(fwd, edges[::-1].copy(), mask_rotate[::-1].copy(),
                            -updates[::-1].copy())
    np.testing.assert_allclose(back, pos, atol=1e-6)
