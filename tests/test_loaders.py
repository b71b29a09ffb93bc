"""Combined data sources and streaming bucketized batching."""

import shutil

import numpy as np
import pytest

from diffdock_tpu.data.chem import read_molecule_file, write_pdb_ligand
from diffdock_tpu.data.loaders import (
    CombinedSource,
    EpochIteratorSource,
    iter_bucketed_batches,
)
from diffdock_tpu.data.moad import MOADConfig, MOADDataset

EXAMPLE_PDB = "/root/reference/examples/6w70.pdb"
EXAMPLE_SDF = "/root/reference/examples/6w70_ligand.sdf"


def make_moad(tmp_path, n=3):
    moad = tmp_path / "moad"
    (moad / "pdb_protein").mkdir(parents=True)
    (moad / "pdb_superligand").mkdir()
    shutil.copy(EXAMPLE_PDB, moad / "pdb_protein" / "6w70_1_protein.pdb")
    mol = read_molecule_file(EXAMPLE_SDF).remove_hs()
    rng = np.random.RandomState(0)
    for i in range(n):
        (moad / "pdb_superligand" / f"6w70_1_A_{i}.pdb").write_text(
            write_pdb_ligand(mol, mol.coords + rng.randn(3))
        )
    ds = MOADDataset(MOADConfig(moad_dir=str(moad),
                                cache_dir=str(tmp_path / f"c{n}")))
    ds.preprocess(verbose=False)
    return ds


def test_bucketed_batches_stream(tmp_path):
    ds = make_moad(tmp_path)
    src = EpochIteratorSource(ds)
    batches = list(iter_bucketed_batches(src.epoch_items(0), batch_size=2))
    total = sum(len(names) for names, _ in batches)
    assert total == 1  # one cluster -> one item per epoch
    names, stacked = batches[0]
    assert stacked.lig_pos.ndim == 3  # leading batch axis


def test_combined_source_interleaves(tmp_path):
    a = EpochIteratorSource(make_moad(tmp_path / "a"))
    b = EpochIteratorSource(make_moad(tmp_path / "b"))
    comb = CombinedSource([a, b])
    assert len(comb) == len(a) + len(b)
    items = list(comb.epoch_items(0))
    assert len(items) == 2
    # deterministic given the seed
    items2 = list(comb.epoch_items(0))
    assert [n for n, _ in items] == [n for n, _ in items2]


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_train_cli_on_moad(tmp_path):
    make_moad(tmp_path)  # creates tmp_path/moad + cache
    from diffdock_tpu.cli.train import main

    rc = main([
        "--dataset", "moad", "--moad_dir", str(tmp_path / "moad"),
        "--cache_path", str(tmp_path / "cache_train"),
        "--n_epochs", "1", "--batch_size", "2",
        "--log_dir", str(tmp_path / "run"),
        "--model_preset", "diffdock_s", "--ns", "8", "--nv", "2",
        "--num_conv_layers", "2", "--num_prot_emb_layers", "1",
    ])
    assert rc == 0
    assert (tmp_path / "run" / "last_model.msgpack").exists()
