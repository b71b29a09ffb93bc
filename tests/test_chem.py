"""Native chem I/O against the reference example fixtures (data files only)."""

import os

import numpy as np
import pytest

from diffdock_tpu.data.chem import (
    Molecule,
    parse_pdb,
    parse_sdf,
    read_molecule_file,
    read_pdb_file,
    write_sdf,
)
from diffdock_tpu.data.featurize import build_complex_data, featurize_ligand

EXAMPLES = "/root/reference/examples"
HAVE_EXAMPLES = os.path.isdir(EXAMPLES)


def _toy_mol():
    # ethanol-ish with explicit H
    return Molecule(
        elements=["C", "C", "O", "H"],
        coords=np.array(
            [[0, 0, 0], [1.5, 0, 0], [2.1, 1.2, 0], [2.9, 1.2, 0.4]], np.float32
        ),
        bonds=[(0, 1, 1), (1, 2, 1), (2, 3, 1)],
        charges=[0, 0, 0, 0],
        name="toy",
    )


def test_sdf_roundtrip():
    mol = _toy_mol()
    text = write_sdf(mol, props={"confidence": "0.5"})
    back = parse_sdf(text)[0]
    assert back.elements == mol.elements
    assert back.bonds == mol.bonds
    np.testing.assert_allclose(back.coords, mol.coords, atol=1e-3)


def test_remove_hs():
    mol = _toy_mol().remove_hs()
    assert mol.elements == ["C", "C", "O"]
    assert (2, 3, 1) not in mol.bonds
    assert mol.num_atoms == 3


def test_featurize_toy():
    mol = _toy_mol().remove_hs()
    feats = featurize_ligand(mol)
    assert feats.shape == (3, 16)
    # atomic numbers: C=6 -> index 5, O=8 -> index 7
    assert feats[0, 0] == 5 and feats[2, 0] == 7
    # terminal C: heavy degree 1 + 3 H = 4 total degree -> index 4
    assert feats[0, 2] == 4
    # numH: CH3 -> 3
    assert feats[0, 5] == 3
    # not aromatic, no rings
    assert feats[0, 8] == 0 and feats[0, 9] == 0


@pytest.mark.skipif(not HAVE_EXAMPLES, reason="reference examples not mounted")
def test_parse_reference_ligand():
    mol = read_molecule_file(f"{EXAMPLES}/6w70_ligand.sdf")
    assert mol.num_atoms == 59
    assert len(mol.bonds) == 63
    heavy = mol.remove_hs()
    assert 0 < heavy.num_atoms <= 59
    feats = featurize_ligand(heavy)
    assert feats.shape == (heavy.num_atoms, 16)
    # all indices within vocab ranges
    from diffdock_tpu.data.featurize import LIG_CATEGORICAL_DIMS

    for col, dim in enumerate(LIG_CATEGORICAL_DIMS):
        assert feats[:, col].max() < dim


@pytest.mark.skipif(not HAVE_EXAMPLES, reason="reference examples not mounted")
def test_parse_reference_protein():
    prot = read_pdb_file(f"{EXAMPLES}/6w70.pdb")
    cas = prot.ca_coords()
    assert cas.shape[0] > 100
    assert np.isfinite(cas).all()
    seq = prot.sequence()
    assert len(seq) == cas.shape[0]
    assert set(seq) <= set("ACDEFGHIKLMNPQRSTVWYX")


@pytest.mark.skipif(not HAVE_EXAMPLES, reason="reference examples not mounted")
def test_build_complex_from_example():
    mol = read_molecule_file(f"{EXAMPLES}/6w70_ligand.sdf")
    prot = read_pdb_file(f"{EXAMPLES}/6w70.pdb")
    data, heavy = build_complex_data(mol, prot)
    assert data.lig_pos.shape == (heavy.num_atoms, 3)
    assert data.rec_pos.shape[0] == len(prot.residues_with_ca())
    # receptor is centered
    np.testing.assert_allclose(
        np.asarray(data.rec_pos).mean(0), 0.0, atol=1e-3
    )
    # rotatable bond structure is consistent
    nb = data.rot_u.shape[0]
    assert data.mask_rotate.shape == (nb, heavy.num_atoms)
    for b in range(nb):
        assert not data.mask_rotate[b, data.rot_u[b]]
        assert data.mask_rotate[b, data.rot_v[b]]
    # kNN neighbor lists valid
    assert data.rec_nbr.max() < data.rec_pos.shape[0]


def test_radius_capped_receptor_graph():
    """receptor_radius caps neighbors but never isolates a residue
    (reference process_mols.py:170-190)."""
    import numpy as np

    from diffdock_tpu.data.chem import read_pdb_file
    from diffdock_tpu.data.featurize import build_receptor_arrays

    protein = read_pdb_file("/root/reference/examples/6w70.pdb")
    loose = build_receptor_arrays(protein, c_alpha_max_neighbors=10)
    tight = build_receptor_arrays(
        protein, c_alpha_max_neighbors=10, receptor_radius=8.0
    )
    assert tight["rec_nbr_mask"].sum() < loose["rec_nbr_mask"].sum()
    # no residue isolated
    assert tight["rec_nbr_mask"].any(axis=1).all()
    # surviving edges really are within the cutoff (beyond the first
    # keep-nearest column)
    pos = tight["rec_pos"]
    d = np.linalg.norm(pos[:, None] - pos[tight["rec_nbr"]], axis=-1)
    capped = d[tight["rec_nbr_mask"]]
    assert np.percentile(capped, 99) <= 8.0 + 1e-4
