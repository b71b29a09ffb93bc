"""Confidence training: label modes and the synthetic CLI end-to-end."""

import numpy as np
import pytest

from diffdock_tpu.train.confidence import ConfidenceTrainConfig



def test_label_modes():
    rmsds = np.array([0.5, 1.5, 3.0, 7.0])
    bce = ConfidenceTrainConfig(rmsd_classification_cutoff=(2.0,))
    np.testing.assert_array_equal(
        bce.labels_from_rmsds(rmsds), [1, 1, 0, 0]
    )
    assert bce.num_outputs == 1

    multi = ConfidenceTrainConfig(rmsd_classification_cutoff=(2.0, 5.0))
    np.testing.assert_array_equal(
        multi.labels_from_rmsds(rmsds), [0, 0, 1, 2]
    )
    assert multi.num_outputs == 3

    reg = ConfidenceTrainConfig(rmsd_prediction=True)
    np.testing.assert_array_equal(reg.labels_from_rmsds(rmsds), rmsds)
    assert reg.num_outputs == 1


@pytest.mark.slow
@pytest.mark.parametrize("extra", [
    [],
    ["--rmsd_classification_cutoff", "2.0", "5.0"],
    ["--rmsd_prediction"],
    ["--all_atoms"],
])
def test_confidence_train_cli_synthetic(tmp_path, extra):
    from diffdock_tpu.cli.confidence_train import main

    rc = main([
        "--synthetic", "3", "--n_epochs", "1", "--batch_size", "2",
        "--samples_per_complex", "2", "--inference_steps", "2",
        "--log_dir", str(tmp_path / "run"),
        "--pose_cache", str(tmp_path / "poses"),
        "--ns", "8", "--nv", "2", "--num_conv_layers", "2",
        "--num_prot_emb_layers", "0",
    ] + extra)
    assert rc == 0
    assert (tmp_path / "run" / "last_model.msgpack").exists()


def test_pose_cache_accumulation(tmp_path):
    """Partial generation runs tagged with cache ids merge into one cache
    (reference cache_creation_id / cache_ids_to_combine,
    confidence/dataset.py:82-155)."""
    from diffdock_tpu.train.confidence import load_pose_cache, pose_cache_file

    rng = np.random.RandomState(0)
    # run id=1 generated poses for A and B; run id=2 for B and C
    banks = {
        ("A", 1): (rng.randn(4, 10, 3), rng.rand(4) * 5),
        ("B", 1): (rng.randn(4, 10, 3), rng.rand(4) * 5),
        ("B", 2): (rng.randn(3, 10, 3), rng.rand(3) * 5),
        ("C", 2): (rng.randn(3, 10, 3), rng.rand(3) * 5),
    }
    for (name, cid), (poses, rmsds) in banks.items():
        np.savez_compressed(
            pose_cache_file(tmp_path, name, cid), poses=poses, rmsds=rmsds
        )

    pa, ra = load_pose_cache(tmp_path, "A", [1, 2])
    assert pa.shape == (4, 10, 3)
    np.testing.assert_allclose(ra, banks[("A", 1)][1])

    pb, rb = load_pose_cache(tmp_path, "B", [1, 2])
    assert pb.shape == (7, 10, 3)
    np.testing.assert_allclose(
        rb, np.concatenate([banks[("B", 1)][1], banks[("B", 2)][1]])
    )
    np.testing.assert_allclose(
        pb, np.concatenate([banks[("B", 1)][0], banks[("B", 2)][0]])
    )

    assert load_pose_cache(tmp_path, "D", [1, 2]) is None
    # plain (id-less) load ignores the tagged files
    assert load_pose_cache(tmp_path, "B") is None


@pytest.mark.slow
def test_confidence_train_cli_cache_combine(tmp_path):
    """Two partial generation runs (--cache_id) combine into one usable
    training cache (--cache_ids_to_combine)."""
    from diffdock_tpu.cli.confidence_train import main

    common = [
        "--synthetic", "2", "--batch_size", "2",
        "--samples_per_complex", "2", "--inference_steps", "2",
        "--pose_cache", str(tmp_path / "poses"),
        "--ns", "8", "--nv", "2", "--num_conv_layers", "2",
        "--num_prot_emb_layers", "0",
    ]
    # generation-only runs: 0 epochs of confidence training
    assert main(common + ["--n_epochs", "0", "--cache_id", "1",
                          "--log_dir", str(tmp_path / "g1")]) == 0
    assert main(common + ["--n_epochs", "0", "--cache_id", "2",
                          "--log_dir", str(tmp_path / "g2")]) == 0
    import glob

    files = sorted(glob.glob(str(tmp_path / "poses" / "*.npz")))
    assert len(files) == 4 and all(".id" in f for f in files)

    rc = main(common + ["--n_epochs", "1", "--cache_ids_to_combine", "1", "2",
                        "--log_dir", str(tmp_path / "run")])
    assert rc == 0
    assert (tmp_path / "run" / "last_model.msgpack").exists()

    from diffdock_tpu.train.confidence import load_pose_cache

    got = load_pose_cache(tmp_path / "poses", "0", [1, 2])
    assert got is not None and got[0].shape[0] == 4  # 2 poses x 2 runs
