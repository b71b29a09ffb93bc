"""ESM embedding tooling: FASTA prep and esm-extract conversion."""

import os

import numpy as np

from diffdock_tpu.data.chem import read_pdb_file
from diffdock_tpu.data.esm import (
    ESM_LAYER,
    chain_sequences,
    convert_esm_extract_dir,
    fasta_records_for_pdbs,
    write_fasta,
)

EXAMPLE_PDB = "/root/reference/examples/6w70.pdb"


def test_chain_sequences_align_with_featurizer_residues():
    protein = read_pdb_file(EXAMPLE_PDB)
    seqs = chain_sequences(protein)
    assert len(seqs) >= 1
    total = sum(len(s) for _, s in seqs)
    assert total == len(protein.residues_with_ca())


def test_fasta_roundtrip(tmp_path):
    records = fasta_records_for_pdbs({"6w70": EXAMPLE_PDB})
    assert all(k.startswith("6w70_chain_") for k in records)
    path = tmp_path / "prep.fasta"
    write_fasta(records, str(path))
    text = path.read_text().splitlines()
    labels = [ln[1:] for ln in text if ln.startswith(">")]
    assert labels == list(records.keys())


def test_convert_esm_extract_dir(tmp_path):
    import torch

    protein = read_pdb_file(EXAMPLE_PDB)
    seqs = chain_sequences(protein)
    extract = tmp_path / "extract"
    extract.mkdir()
    rng = np.random.RandomState(0)
    expected = []
    for i, (_, seq) in enumerate(seqs):
        rep = rng.randn(len(seq), 8).astype(np.float32)
        expected.append(rep)
        torch.save(
            {"representations": {ESM_LAYER: torch.from_numpy(rep)}},
            extract / f"6w70_chain_{i}.pt",
        )
    out = convert_esm_extract_dir(str(extract), str(tmp_path / "npy"),
                                  verbose=False)
    emb = np.load(out["6w70"])
    np.testing.assert_array_equal(emb, np.concatenate(expected, axis=0))
    # row count matches the featurizer's residue set
    assert emb.shape[0] == len(protein.residues_with_ca())


def test_lazy_npy_table(tmp_path):
    from diffdock_tpu.data.esm import LazyNpyTable

    arr = np.random.RandomState(0).randn(5, 8).astype(np.float32)
    np.save(tmp_path / "6w70_1.npy", arr)
    t = LazyNpyTable(str(tmp_path))
    assert "6w70_1" in t and "nope" not in t
    np.testing.assert_array_equal(t["6w70_1"], arr)
    assert t.get("nope") is None


def test_moad_preprocess_with_esm_table(tmp_path):
    import shutil

    from diffdock_tpu.data.chem import read_molecule_file, read_pdb_file, write_pdb_ligand
    from diffdock_tpu.data.esm import LazyNpyTable
    from diffdock_tpu.data.moad import MOADConfig, MOADDataset

    moad = tmp_path / "moad"
    (moad / "pdb_protein").mkdir(parents=True)
    (moad / "pdb_superligand").mkdir()
    shutil.copy("/root/reference/examples/6w70.pdb",
                moad / "pdb_protein" / "6w70_1_protein.pdb")
    mol = read_molecule_file(
        "/root/reference/examples/6w70_ligand.sdf").remove_hs()
    (moad / "pdb_superligand" / "6w70_1_A_0.pdb").write_text(
        write_pdb_ligand(mol))

    protein = read_pdb_file(str(moad / "pdb_protein" / "6w70_1_protein.pdb"))
    n_res = len(protein.residues_with_ca())
    emb_dir = tmp_path / "esm"
    emb_dir.mkdir()
    np.save(emb_dir / "6w70_1.npy",
            np.random.RandomState(0).randn(n_res, 16).astype(np.float32))

    ds = MOADDataset(MOADConfig(moad_dir=str(moad),
                                cache_dir=str(tmp_path / "c")))
    ds.preprocess(esm_table=LazyNpyTable(str(emb_dir)), verbose=False)
    data = ds.get_by_name("6w70_1_A_0")
    assert data.rec_lm.shape == (n_res, 16)
