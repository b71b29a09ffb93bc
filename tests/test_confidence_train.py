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
    # pose GENERATION sharded over the virtual 8-CPU-device mesh (the
    # longest preprocessing job, reference confidence/dataset.py:212-273)
    ["--pose_devices", "0"],
    # phase-2 TRAINING data-parallel over the virtual mesh
    ["--data_parallel", "0"],
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


def test_confidence_step_learns():
    """Regression: train-mode confidence logits must be alive. With the
    pose batch on a vmap axis, the head's BatchNorm must aggregate over
    that named axis — un-aggregated it normalizes its single pooled row
    to exactly zero (and relu'(0)=0 kills every gradient), which froze
    confidence training at chance (BCE=ln 2) until round 3."""
    import jax
    import jax.numpy as jnp

    from diffdock_tpu.data.complexes import synthetic_complex
    from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
    from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
    from diffdock_tpu.models.config import ScoreModelConfig
    from diffdock_tpu.models.factory import build_model
    from diffdock_tpu.train.confidence import make_confidence_train_step
    from diffdock_tpu.train.trainer import training_model_config

    so3 = get_so3_tables(SO3Config(n_eps=64, x_n=256, l_max=512))
    torus = get_torus_tables(TorusConfig(x_n=256, sigma_n=128,
                                         mc_samples=2000))
    rng = np.random.RandomState(0)
    data = synthetic_complex(rng, n_lig=10, n_rec=24, n_bonds=2)
    tcfg = ConfidenceTrainConfig(rmsd_classification_cutoff=(2.0,), lr=1e-3)
    cfg = training_model_config(
        ScoreModelConfig(ns=8, nv=2, num_conv_layers=2,
                         num_prot_emb_layers=0, confidence_mode=True,
                         num_confidence_outputs=1),
        data_parallel=False,
    )
    model = build_model(cfg)
    B = 4
    poses = np.stack([
        np.asarray(data.lig_pos) + (0 if i % 2 == 0
                                    else rng.randn(3) * 8 + 20)
        for i in range(B)
    ]).astype(np.float32)
    labels = jnp.asarray([1.0, 0.0] * (B // 2))
    datas = jax.tree.map(lambda x: jnp.stack([jnp.asarray(x)] * B), data)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(7), data, jnp.asarray(poses[0]),
        jnp.asarray(0.0), so3, torus,
    )
    params, stats = variables["params"], variables.get("batch_stats", {})
    step, tx = make_confidence_train_step(model, tcfg, so3, torus)
    step = jax.jit(step)
    opt = jax.jit(tx.init)(params)
    batch = (datas, jnp.asarray(poses), labels)
    losses = []
    for i in range(40):
        params, stats, opt, m = step(params, stats, opt, batch,
                                     jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert not np.allclose(losses[0], np.log(2.0), atol=1e-4) or \
        losses[-1] < losses[0] - 0.05, f"loss frozen at chance: {losses[:3]}"
    assert losses[-1] < 0.55, f"no learning: {losses[0]:.3f}->{losses[-1]:.3f}"


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_confidence_data_parallel_matches_single_device():
    """The dp=8-sharded confidence step must produce the same update as
    the single-device step on the same global batch: dropout is 0, so the
    only dp-dependent pieces are the grad pmean and the cross-device BN
    aggregation — both exact up to float reassociation."""
    import jax
    import jax.numpy as jnp

    from diffdock_tpu.data.complexes import synthetic_complex
    from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
    from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
    from diffdock_tpu.models.config import ScoreModelConfig
    from diffdock_tpu.models.factory import build_model
    from diffdock_tpu.parallel.mesh import (
        make_mesh, shard_confidence_train_step,
    )
    from diffdock_tpu.train.confidence import make_confidence_train_step
    from diffdock_tpu.train.trainer import DP_AXIS, training_model_config

    so3 = get_so3_tables(SO3Config(n_eps=64, x_n=256, l_max=512))
    torus = get_torus_tables(TorusConfig(x_n=256, sigma_n=128,
                                         mc_samples=2000))
    rng = np.random.RandomState(1)
    data = synthetic_complex(rng, n_lig=10, n_rec=24, n_bonds=2)
    tcfg = ConfidenceTrainConfig(rmsd_classification_cutoff=(2.0,), lr=1e-3)
    base = ScoreModelConfig(ns=8, nv=2, num_conv_layers=2,
                            num_prot_emb_layers=0, confidence_mode=True,
                            num_confidence_outputs=1)
    B = 8
    poses = np.stack([
        np.asarray(data.lig_pos) + (0 if i % 2 == 0
                                    else rng.randn(3) * 8 + 20)
        for i in range(B)
    ]).astype(np.float32)
    labels = jnp.asarray([1.0, 0.0] * (B // 2))
    datas = jax.tree.map(lambda x: jnp.stack([jnp.asarray(x)] * B), data)
    batch = (datas, jnp.asarray(poses), labels)

    out = {}
    for mode in ("single", "dp"):
        cfg = training_model_config(base, data_parallel=(mode == "dp"))
        model = build_model(cfg)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(7), data, jnp.asarray(poses[0]),
            jnp.asarray(0.0), so3, torus,
        )
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        if mode == "dp":
            step, tx = make_confidence_train_step(
                model, tcfg, so3, torus, dp_axis=DP_AXIS
            )
            step = shard_confidence_train_step(step, make_mesh(8))
        else:
            step, tx = make_confidence_train_step(model, tcfg, so3, torus)
            step = jax.jit(step)
        opt = jax.jit(tx.init)(params)
        for i in range(2):
            params, stats, opt, m = step(params, stats, opt, batch,
                                         jax.random.PRNGKey(i))
        out[mode] = (params, stats, float(m["loss"]), float(m["accuracy"]))

    # Tolerance rationale: adam normalizes each update to ~lr*sign(g), so
    # on leaves whose grads are near zero, float reassociation of the
    # pmean can flip the sign and the two layouts diverge by ~lr per step
    # — a property of (adam, tiny grads), not a sync bug. Step-2
    # quantities run on those perturbed params and inherit ~lr-scale
    # differences. A missing grad pmean or BN dp-axis aggregation is a
    # O(1) divergence and still fails every bound below.
    np.testing.assert_allclose(out["single"][2], out["dp"][2], rtol=3e-3)
    np.testing.assert_allclose(out["single"][3], out["dp"][3], rtol=1e-6)
    for a, b in zip(jax.tree.leaves(out["single"][1]),
                    jax.tree.leaves(out["dp"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-3, atol=5e-4)
    for a, b in zip(jax.tree.leaves(out["single"][0]),
                    jax.tree.leaves(out["dp"][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=4e-3)
