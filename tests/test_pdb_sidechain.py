"""PDB sidechain (van der Mers) dataset behavior."""

import shutil

import numpy as np

from diffdock_tpu.data.chem import read_pdb_file
from diffdock_tpu.data.pdb_sidechain import (
    PDBSidechainConfig,
    PDBSidechainDataset,
    contact_counts,
    sidechain_molecule,
)

EXAMPLE_PDB = "/root/reference/examples/6w70.pdb"


def test_contact_counts_excludes_sequence_neighbors():
    # 10 "residues" on a line, 1 atom each, 3 A apart: every residue is
    # within 5 A only of +-1 neighbors, which the +-7 buffer excludes.
    coords = np.stack(
        [np.arange(10) * 3.0, np.zeros(10), np.zeros(10)], axis=1
    ).astype(np.float32)
    c = contact_counts(coords, np.arange(10, dtype=np.int32), 10,
                       max_dist=5.0, buffer_residue_num=7)
    assert c.max() == 0
    # with no buffer the chain neighbors count
    c2 = contact_counts(coords, np.arange(10, dtype=np.int32), 10,
                        max_dist=5.0, buffer_residue_num=0)
    assert c2.max() == 2


def test_sidechain_molecule_excludes_backbone():
    protein = read_pdb_file(EXAMPLE_PDB)
    res = next(
        r for r in protein.residues_with_ca()
        if r.name in ("TRP", "PHE", "TYR", "ARG", "LYS")
    )
    mol = sidechain_molecule(res)
    assert mol is not None and mol.num_atoms >= 4
    assert len(mol.bonds) >= mol.num_atoms - 1  # connected-ish


def test_dataset_serves_sidechain_complexes(tmp_path):
    pdb_dir = tmp_path / "pdbs"
    pdb_dir.mkdir()
    shutil.copy(EXAMPLE_PDB, pdb_dir / "6w70.pdb")
    cfg = PDBSidechainConfig(
        data_dir=str(pdb_dir), cache_dir=str(tmp_path / "cache"),
        min_contacts=2, min_best_contacts=5,
    )
    ds = PDBSidechainDataset(cfg)
    ds.preprocess(verbose=False)
    assert ds.names == ["6w70"]

    rng = np.random.RandomState(0)
    item = ds.get(0, rng)
    assert item is not None
    name, data = item
    assert name.startswith("6w70_sc")
    sc_idx = int(name.split("_sc")[1])
    # the +-7 window around the extracted sidechain is gone
    protein = read_pdb_file(EXAMPLE_PDB)
    n_res = len(protein.residues_with_ca())
    removed = min(sc_idx + 8, n_res) - max(0, sc_idx - 7)
    assert data.rec_pos.shape[0] == n_res - removed
    # pseudo-ligand sits inside the receptor's pocket (absolute frames agree)
    lig_abs = np.asarray(data.lig_pos) + np.asarray(data.original_center)
    rec_abs = np.asarray(data.rec_pos) + np.asarray(data.original_center)
    dmin = np.linalg.norm(
        lig_abs[:, None] - rec_abs[None], axis=-1
    ).min()
    assert dmin < 10.0
    # receptor recentered
    np.testing.assert_allclose(
        np.asarray(data.rec_pos).mean(0), np.zeros(3), atol=1e-3
    )


def test_second_segment_removal(tmp_path):
    pdb_dir = tmp_path / "pdbs"
    pdb_dir.mkdir()
    shutil.copy(EXAMPLE_PDB, pdb_dir / "6w70.pdb")
    cfg = PDBSidechainConfig(
        data_dir=str(pdb_dir), cache_dir=str(tmp_path / "cache"),
        remove_second_segment=True, min_contacts=2, min_best_contacts=5,
    )
    ds = PDBSidechainDataset(cfg)
    ds.preprocess(verbose=False)
    item = ds.get(0, np.random.RandomState(1))
    assert item is not None
    _, data = item
    protein = read_pdb_file(EXAMPLE_PDB)
    n_res = len(protein.residues_with_ca())
    # two windows removed -> strictly fewer residues than single-segment max
    assert data.rec_pos.shape[0] <= n_res - 16
