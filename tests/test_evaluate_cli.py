"""Evaluate CLI end-to-end on a synthetic PDBBind/MOAD layout (CPU)."""

import json
import os
import shutil

import numpy as np
import pytest

from diffdock_tpu.data.chem import read_molecule_file, write_pdb_ligand

EXAMPLE_PDB = "/root/reference/examples/6w70.pdb"
EXAMPLE_SDF = "/root/reference/examples/6w70_ligand.sdf"


def test_evaluate_pdbbind_mode(tmp_path):
    root = tmp_path / "pdbbind" / "6w70"
    root.mkdir(parents=True)
    shutil.copy(EXAMPLE_PDB, root / "6w70_protein_processed.pdb")
    shutil.copy(EXAMPLE_SDF, root / "6w70_ligand.sdf")

    from diffdock_tpu.cli.evaluate import main

    out = tmp_path / "eval"
    rc = main([
        "--data_dir", str(tmp_path / "pdbbind"),
        "--out_dir", str(out),
        "--cache_path", str(tmp_path / "cache"),
        "--samples_per_complex", "2",
        "--inference_steps", "2", "--actual_steps", "2",
        "--model_preset", "diffdock_s",
        "--compute_dtype", "float32",
    ])
    assert rc == 0
    table = json.loads((out / "metrics.json").read_text())
    assert "rmsds_below_2" in table and "steric_clash_fraction" in table
    rmsds = np.load(out / "rmsds.npy")
    assert rmsds.shape == (1, 2) and np.isfinite(rmsds).all()


def test_evaluate_moad_mode(tmp_path):
    moad = tmp_path / "moad"
    (moad / "pdb_protein").mkdir(parents=True)
    (moad / "pdb_ligand").mkdir()
    shutil.copy(EXAMPLE_PDB, moad / "pdb_protein" / "6w70_1_protein.pdb")
    mol = read_molecule_file(EXAMPLE_SDF).remove_hs()
    rng = np.random.RandomState(0)
    for i in range(2):
        (moad / "pdb_ligand" / f"6w70_1_A_{i}.pdb").write_text(
            write_pdb_ligand(mol, mol.coords + rng.randn(3))
        )

    from diffdock_tpu.cli.evaluate import main

    out = tmp_path / "eval"
    rc = main([
        "--data_dir", str(moad), "--dataset", "moad",
        "--out_dir", str(out),
        "--cache_path", str(tmp_path / "cache"),
        "--samples_per_complex", "2",
        "--inference_steps", "2", "--actual_steps", "2",
        "--model_preset", "diffdock_s",
        "--compute_dtype", "float32",
    ])
    assert rc == 0
    rmsds = np.load(out / "rmsds.npy")
    # two ligand entries, min-over-ground-truths applied
    assert rmsds.shape == (2, 2) and np.isfinite(rmsds).all()
