"""Inference dataset: spec resolution, CSV parsing, gating, success flags."""

import numpy as np
import pytest

from diffdock_tpu.data.chem import HAVE_RDKIT
from diffdock_tpu.data.inference_dataset import (
    InferenceDatasetBuilder,
    InferenceSpec,
    read_ligand_description,
    specs_from_csv,
)

EXAMPLE_PDB = "/root/reference/examples/6w70.pdb"
EXAMPLE_SDF = "/root/reference/examples/6w70_ligand.sdf"


def test_build_from_files():
    b = InferenceDatasetBuilder()
    c = b.build(InferenceSpec("6w70", EXAMPLE_PDB, None, EXAMPLE_SDF))
    assert c.success, c.error
    assert c.data is not None and c.data.n_lig > 0
    assert c.mol.num_atoms == c.data.n_lig


def test_smiles_requires_rdkit_or_clear_error():
    if HAVE_RDKIT:
        mol = read_ligand_description("CCO")
        assert mol.num_atoms == 3
    else:
        with pytest.raises(RuntimeError, match="RDKit"):
            read_ligand_description("CCO")


def test_failure_is_flagged_not_fatal():
    b = InferenceDatasetBuilder()
    out = b.build_all(
        [
            InferenceSpec("good", EXAMPLE_PDB, None, EXAMPLE_SDF),
            InferenceSpec("bad", "/nonexistent.pdb", None, EXAMPLE_SDF),
        ],
        verbose=False,
    )
    assert [c.success for c in out] == [True, False]
    assert out[1].error


def test_specs_from_csv(tmp_path):
    csv_path = tmp_path / "jobs.csv"
    csv_path.write_text(
        "complex_name,protein_path,protein_sequence,ligand_description\n"
        f"a,{EXAMPLE_PDB},,{EXAMPLE_SDF}\n"
        f",{EXAMPLE_PDB},,CCO\n"
        "seqonly,,MKV,CCO\n"
    )
    specs = specs_from_csv(str(csv_path))
    assert specs[0].name == "a"
    assert specs[0].ligand_description == EXAMPLE_SDF
    assert specs[1].name == "complex_1"
    assert specs[2].protein_sequence == "MKV"
    assert specs[2].protein_path is None


def test_sequence_without_weights_raises_actionable_error(tmp_path):
    b = InferenceDatasetBuilder(workdir=str(tmp_path))
    c = b.build(InferenceSpec("seq", None, "MKVLLA", EXAMPLE_SDF))
    # ESMFold weights are not cached in this image -> flagged failure with
    # an actionable message (or success if someone baked the weights in)
    if not c.success:
        assert "ESMFold" in c.error or "transformers" in c.error
