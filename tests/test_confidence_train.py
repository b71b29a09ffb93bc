"""Confidence training: label modes and the synthetic CLI end-to-end."""

import numpy as np
import pytest

from diffdock_tpu.train.confidence import ConfidenceTrainConfig


pytestmark = pytest.mark.slow  # compile-heavy e2e

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
