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
