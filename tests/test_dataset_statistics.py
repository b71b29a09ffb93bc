"""Dataset statistics printing + CPU thread caps — the two reference
conveniences VERDICT r3 noted as absent (datasets/pdbbind.py:421-452,
evaluate.py:186-196)."""

import os

import numpy as np

from diffdock_tpu.data.datasets import (
    ComplexDataset,
    ComplexSpec,
    DatasetConfig,
)

EXAMPLE_PDB = "/root/reference/examples/6w70.pdb"
EXAMPLE_SDF = "/root/reference/examples/6w70_ligand.sdf"


def test_print_statistics(tmp_path, capsys):
    ds = ComplexDataset(
        [ComplexSpec("6w70", EXAMPLE_PDB, EXAMPLE_SDF)],
        DatasetConfig(cache_dir=str(tmp_path)),
    )
    ds.preprocess()
    assert ds.names == ["6w70"]
    stats = ds.print_statistics()
    out = capsys.readouterr().out
    assert "Number of complexes: 1" in out
    for label in ("radius protein", "radius molecule",
                  "distance protein-mol", "ligand atoms",
                  "receptor residues"):
        assert label in out
        assert stats[label]["max"] >= stats[label]["mean"] >= 0
    # 6w70 sanity: receptor bigger than ligand, ligand near the pocket
    assert stats["radius protein"]["mean"] > stats["radius molecule"]["mean"]
    assert np.isfinite(stats["distance protein-mol"]["mean"])
    # memoized to a sidecar: a second call must not re-read the dataset
    assert (ds.cache / "statistics.json").exists()
    ds.get = None  # any re-read would now raise
    stats2 = ds.print_statistics()
    assert stats2 == stats


def test_restrict_cpu_threads(monkeypatch):
    from diffdock_tpu.cli.evaluate import restrict_cpu_threads

    for var in ("OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        monkeypatch.delenv(var, raising=False)
    restrict_cpu_threads(4)
    assert os.environ["OMP_NUM_THREADS"] == "4"
    assert os.environ["OPENBLAS_NUM_THREADS"] == "4"
    import torch

    assert torch.get_num_threads() == 4


def test_lm_presence_changes_shard_identity(tmp_path):
    """Round-5 review finding: the featurized-shard cache must key on
    LM-embedding presence — a cache built without --esm_embeddings_path
    used to silently serve dim-0 rec_lm features when the flag was added
    on a later run (and vice versa)."""
    # cache built WITHOUT embeddings
    ds0 = ComplexDataset(
        [ComplexSpec("6w70", EXAMPLE_PDB, EXAMPLE_SDF)],
        DatasetConfig(cache_dir=str(tmp_path)),
    )
    ds0.preprocess()
    assert ds0.get("6w70").rec_lm.shape[1] == 0

    # same cache dir, now WITH a precomputed embedding: must refeaturize,
    # not serve the stale dim-0 shard
    n_rec = ds0.get("6w70").rec_lm.shape[0]
    lm_path = tmp_path / "6w70.npy"
    np.save(lm_path, np.zeros((n_rec, 16), np.float32))
    ds1 = ComplexDataset(
        [ComplexSpec("6w70", EXAMPLE_PDB, EXAMPLE_SDF, str(lm_path))],
        DatasetConfig(cache_dir=str(tmp_path)),
    )
    ds1.preprocess()
    assert ds1.get("6w70").rec_lm.shape[1] == 16
    # and the original no-LM dataset still reads its own shard
    assert ds0.get("6w70").rec_lm.shape[1] == 0
