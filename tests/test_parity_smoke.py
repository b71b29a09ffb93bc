"""Released-checkpoint parity harness stays armed (VERDICT r4 ask #8).

Real reference weights are environmentally unavailable (no network, no
released ``.pt`` in the image), so the parity chain is exercised against a
SYNTHETIC state dict in the reference's exact naming/layout: torch ``.pt``
-> ``cli.import_weights`` -> ``scripts/parity_eval.py`` docking a bundled
reference example end to end (chem parsing, pipeline, symmetry RMSD,
aggregate report). The day real weights appear, the same command line
produces parity numbers with zero new code.
"""

import importlib.util
import os

import numpy as np
import pytest

from tests.test_torch_import import CFG, build_ref_sd, expected_params

EXAMPLES = "/root/reference/examples"
PAIR = ("6moa_protein_processed.pdb", "6moa_ligand.sdf")  # smallest (109 res)


def _load_parity_eval():
    spec = importlib.util.spec_from_file_location(
        "parity_eval",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "parity_eval.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(
    not os.path.exists(os.path.join(EXAMPLES, PAIR[0])),
    reason="reference examples not present",
)
def test_import_weights_feeds_parity_eval(tmp_path, capsys):
    import shutil

    import jax
    import torch

    # 1. synthetic checkpoint in the reference's on-disk format
    shapes, stat_shapes = expected_params(CFG)
    rng = np.random.RandomState(7)
    params = jax.tree.map(
        lambda s: rng.randn(*s.shape).astype(np.float32) * 0.1, shapes
    )
    stats = jax.tree.map(
        lambda s: np.abs(rng.randn(*s.shape).astype(np.float32)) * 0.1 + 0.5,
        stat_shapes,
    )
    sd = build_ref_sd(params, stats, CFG)
    pt = tmp_path / "ref.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               pt)

    # 2. convert via the CLI (the command real weights would go through)
    from diffdock_tpu.cli.import_weights import main as import_main

    ckpt = tmp_path / "score_model"
    rc = import_main([
        "--torch_checkpoint", str(pt), "--out_dir", str(ckpt),
        "--preset", "diffdock_s", "--ns", "8", "--nv", "2",
        "--num_conv_layers", "2", "--num_prot_emb_layers", "1",
    ])
    assert rc == 0

    # 3. dock one bundled reference example through the parity harness
    ex = tmp_path / "examples"
    ex.mkdir()
    for f in PAIR:
        shutil.copy(os.path.join(EXAMPLES, f), ex / f)

    parity_eval = _load_parity_eval()
    rc = parity_eval.main([
        "--score_model_dir", str(ckpt),
        "--examples_dir", str(ex),
        "--samples", "2", "--inference_steps", "2", "--actual_steps", "2",
        "--out_dir", str(tmp_path / "out"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "aggregate over 1 complexes" in out
    assert "6moa" in out
    # the harness printed finite ranked RMSDs (values are meaningless with
    # synthetic weights; finiteness proves the full chain executed)
    assert "rmsd(ranked):" in out
    assert "nan" not in out.lower().split("aggregate")[0]
