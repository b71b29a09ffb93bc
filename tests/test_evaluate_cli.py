"""Evaluate CLI end-to-end on a synthetic PDBBind/MOAD layout (CPU)."""

import json
import os
import shutil

import numpy as np
import pytest

from diffdock_tpu.data.chem import read_molecule_file, write_pdb_ligand

EXAMPLE_PDB = "/root/reference/examples/6w70.pdb"
EXAMPLE_SDF = "/root/reference/examples/6w70_ligand.sdf"


pytestmark = pytest.mark.slow  # compile-heavy e2e

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


def test_evaluate_complex_parallel(tmp_path):
    """--complex_devices: two complexes docked concurrently, one per
    device of the virtual mesh (dock_batch), with amortized run_times and
    the same artifact contract as the sequential path."""
    for name in ("6w70", "6w71"):
        root = tmp_path / "pdbbind" / name
        root.mkdir(parents=True)
        shutil.copy(EXAMPLE_PDB, root / f"{name}_protein_processed.pdb")
        shutil.copy(EXAMPLE_SDF, root / f"{name}_ligand.sdf")

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
        "--complex_devices", "2",
    ])
    assert rc == 0
    rmsds = np.load(out / "rmsds.npy")
    assert rmsds.shape == (2, 2) and np.isfinite(rmsds).all()
    rt = np.load(out / "run_times.npy")
    # amortized chunk wall-clock: both members of the chunk share it
    assert rt.shape == (2,) and np.isfinite(rt).all()
    np.testing.assert_allclose(rt[0], rt[1])


def test_evaluate_posebusters_mode_with_gnina(tmp_path):
    """Posebusters layout ({name}_protein.pdb, {name}_ligand.sdf,
    alternative GTs in {name}_ligands.sdf) + gnina rescoring via a fake
    binary (reference evaluate.py:36-87,434-472)."""
    root = tmp_path / "pb" / "6w70"
    root.mkdir(parents=True)
    shutil.copy(EXAMPLE_PDB, root / "6w70_protein.pdb")
    shutil.copy(EXAMPLE_SDF, root / "6w70_ligand.sdf")
    # two alternative ground truths: the original + a translated copy
    from diffdock_tpu.data.chem import write_sdf

    mol = read_molecule_file(EXAMPLE_SDF)
    (root / "6w70_ligands.sdf").write_text(
        write_sdf(mol) + write_sdf(mol, mol.coords + 1.5)
    )

    fake_gnina = tmp_path / "gnina"
    fake_gnina.write_text(
        "#!/bin/bash\n"
        'lig=""; out=""\n'
        "while [ $# -gt 0 ]; do\n"
        '  case $1 in --ligand|-l) lig=$2; shift;; -o) out=$2; shift;;\n'
        "  esac; shift\n"
        "done\n"
        "awk '/^\\$\\$\\$\\$/{print \"> <CNNscore>\"; print \"0.73\";"
        " print \"\"} {print}' \"$lig\" > \"$out\"\n"
    )
    fake_gnina.chmod(0o755)

    from diffdock_tpu.cli.evaluate import main

    out = tmp_path / "eval"
    rc = main([
        "--data_dir", str(tmp_path / "pb"), "--dataset", "posebusters",
        "--out_dir", str(out),
        "--cache_path", str(tmp_path / "cache"),
        "--samples_per_complex", "2",
        "--inference_steps", "2", "--actual_steps", "2",
        "--model_preset", "diffdock_s",
        "--compute_dtype", "float32",
        "--gnina_minimize", "--gnina_path", str(fake_gnina),
        "--gnina_poses_to_optimize", "2",
    ])
    assert rc == 0
    table = json.loads((out / "metrics.json").read_text())
    assert "gnina_rmsds_below_2" in table
    assert "gnina_filtered_rmsds_below_2" in table
    g_scores = np.load(out / "gnina_scores.npy")
    assert g_scores.shape == (1, 2) and np.allclose(g_scores, 0.73)
    g_rmsds = np.load(out / "gnina_rmsds.npy")
    assert g_rmsds.shape == (1, 2) and np.isfinite(g_rmsds).all()


def test_dock_with_retry_halves_pose_chunks():
    """Batch-halving recovery (reference evaluate.py:523-527): a pipeline
    that OOMs above 2 poses still returns the full pose count."""
    from diffdock_tpu.cli.evaluate import dock_with_retry

    class FakeResult:
        def __init__(self, n, seed):
            self.poses = np.full((n, 3, 3), float(seed))
            self.confidence = np.arange(n, dtype=float) + seed
            self.order = np.argsort(-self.confidence)

    class FakePipeline:
        calls = []
        mesh = None

        def effective_pose_chunk(self, data, num_poses, batch_size=None):
            return min(num_poses, batch_size or num_poses)

        def dock_complex(self, data, num_poses, seed, batch_size=None,
                         **kw):
            # poses in flight = the chunk the pipeline would vmap
            in_flight = min(num_poses, batch_size or num_poses)
            self.calls.append(in_flight)
            if in_flight > 2:
                raise RuntimeError("RESOURCE_EXHAUSTED")
            return FakeResult(num_poses, seed)

    result = dock_with_retry(FakePipeline(), None, 8, seed=0, max_retries=4)
    assert result.poses.shape == (8, 3, 3)
    assert result.confidence.shape == (8,)
    # order is a valid permutation sorted by confidence desc
    c = result.confidence[result.order]
    assert (np.diff(c) <= 0).all()


def test_dock_with_retry_exhausted_raises():
    from diffdock_tpu.cli.evaluate import dock_with_retry

    class AlwaysFails:
        mesh = None

        def effective_pose_chunk(self, data, num_poses, batch_size=None):
            return min(num_poses, batch_size or num_poses)

        def dock_complex(self, data, num_poses, seed, **kw):
            raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        dock_with_retry(AlwaysFails(), None, 4, seed=0, max_retries=3)


def test_dock_with_retry_stops_at_mesh_floor():
    """On a pose mesh the program can't shrink below one pose per device:
    once the real in-flight count hits mesh.size, retrying is pointless —
    raise instead of re-running the identical program (ADVICE r3)."""
    from diffdock_tpu.cli.evaluate import dock_with_retry

    class Mesh:
        size = 8

    calls = []

    class MeshedFails:
        mesh = Mesh()

        def effective_pose_chunk(self, data, num_poses, batch_size=None):
            chunk = min(num_poses, batch_size or num_poses)
            return -(-chunk // 8) * 8  # dock_complex's mesh round-up

        def dock_complex(self, data, num_poses, seed, batch_size=None,
                         **kw):
            calls.append(batch_size)
            raise RuntimeError("RESOURCE_EXHAUSTED")

    with pytest.raises(RuntimeError):
        dock_with_retry(MeshedFails(), None, 16, seed=0, max_retries=10)
    # 16 -> 8 (= mesh floor) -> stop; never 4/2/1 identical re-runs
    assert calls == [None, 8]


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
