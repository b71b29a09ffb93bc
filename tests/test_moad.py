"""MOAD dataset: split caches, cluster-balanced sampling, chain cutoff."""

import os
import shutil

import numpy as np
import pytest

from diffdock_tpu.data.chem import (
    parse_pdb_ligand,
    read_molecule_file,
    write_pdb_ligand,
)
from diffdock_tpu.data.moad import MOADConfig, MOADDataset, apply_chain_cutoff

EXAMPLE_PDB = "/root/reference/examples/6w70.pdb"
EXAMPLE_SDF = "/root/reference/examples/6w70_ligand.sdf"


def make_moad_dir(tmp_path, n_ligands=3):
    """Fake MOAD layout: one receptor (6w70), n translated ligand copies."""
    moad = tmp_path / "moad"
    (moad / "pdb_protein").mkdir(parents=True)
    (moad / "pdb_superligand").mkdir()
    shutil.copy(EXAMPLE_PDB, moad / "pdb_protein" / "6w70_1_protein.pdb")
    mol = read_molecule_file(EXAMPLE_SDF).remove_hs()
    rng = np.random.RandomState(0)
    for i in range(n_ligands):
        coords = mol.coords + rng.randn(3) * 2.0
        (moad / "pdb_superligand" / f"6w70_1_A_{i}.pdb").write_text(
            write_pdb_ligand(mol, coords)
        )
    return str(moad)


def test_pdb_ligand_roundtrip():
    mol = read_molecule_file(EXAMPLE_SDF).remove_hs()
    text = write_pdb_ligand(mol)
    back = parse_pdb_ligand(text)
    assert back.num_atoms == mol.num_atoms
    np.testing.assert_allclose(back.coords, mol.coords, atol=1e-3)
    # CONECT round-trips the topology exactly
    assert sorted((min(i, j), max(i, j)) for i, j, _ in back.bonds) == sorted(
        (min(i, j), max(i, j)) for i, j, _ in mol.bonds
    )


def test_pdb_ligand_bond_perception_without_conect():
    mol = read_molecule_file(EXAMPLE_SDF).remove_hs()
    text = "\n".join(
        ln for ln in write_pdb_ligand(mol).splitlines()
        if not ln.startswith("CONECT")
    )
    back = parse_pdb_ligand(text)
    inferred = {(min(i, j), max(i, j)) for i, j, _ in back.bonds}
    actual = {(min(i, j), max(i, j)) for i, j, _ in mol.bonds}
    # proximity perception recovers the vast majority of covalent bonds
    assert len(actual & inferred) / len(actual) > 0.9


def test_moad_dataset_preprocess_and_sampling(tmp_path):
    moad_dir = make_moad_dir(tmp_path)
    cfg = MOADConfig(moad_dir=moad_dir, cache_dir=str(tmp_path / "cache"))
    ds = MOADDataset(cfg)
    ds.preprocess(verbose=False)
    assert len(ds.clusters) == 1  # one receptor prefix -> one cluster
    assert len(ds.names) == 3

    rng = np.random.RandomState(0)
    seen = set()
    for _ in range(20):
        name, data = ds.get(0, rng)
        seen.add(name)
        assert data.lig_pos.shape[1] == 3
    assert len(seen) > 1  # random member selection within the cluster

    # deterministic mode always serves the first sorted member
    cfg2 = MOADConfig(
        moad_dir=moad_dir, cache_dir=str(tmp_path / "cache"),
        no_randomness=True,
    )
    ds2 = MOADDataset(cfg2)
    ds2.preprocess(verbose=False)
    names = {ds2.get(0, rng)[0] for _ in range(5)}
    assert names == {"6w70_1_A_0"}


def test_moad_alternative_ground_truths(tmp_path):
    moad_dir = make_moad_dir(tmp_path)
    cfg = MOADConfig(moad_dir=moad_dir, cache_dir=str(tmp_path / "cache"))
    ds = MOADDataset(cfg)
    ds.preprocess(verbose=False)
    alts = ds.alternative_ground_truths("6w70_1_A_0")
    assert len(alts) == 3  # identical formula -> all copies count


def test_chain_cutoff_keeps_near_chain(tmp_path):
    moad_dir = make_moad_dir(tmp_path, n_ligands=1)
    cfg = MOADConfig(moad_dir=moad_dir, cache_dir=str(tmp_path / "cache"))
    ds = MOADDataset(cfg)
    ds.preprocess(verbose=False)
    data = ds.get_by_name("6w70_1_A_0")

    # synthesize two chains: second chain far away
    nr = data.rec_pos.shape[0]
    chain_ids = np.zeros(nr, np.int32)
    chain_ids[nr // 2 :] = 1
    far = np.asarray(data.rec_pos).copy()
    far[nr // 2 :] += 500.0
    data_far = data._replace(rec_pos=far)

    cropped = apply_chain_cutoff(data_far, chain_ids, cutoff=10.0)
    assert cropped is not None
    assert cropped.rec_pos.shape[0] == nr // 2
    # recentered: kept residues centered at origin
    np.testing.assert_allclose(
        np.asarray(cropped.rec_pos).mean(0), np.zeros(3), atol=1e-3
    )
    # ligand shifted consistently: absolute frame preserved
    np.testing.assert_allclose(
        np.asarray(cropped.lig_pos) + np.asarray(cropped.original_center),
        np.asarray(data.lig_pos) + np.asarray(data.original_center),
        atol=1e-3,
    )
