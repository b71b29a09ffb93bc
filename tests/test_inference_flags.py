"""Reference inference/evaluate recipe flags: YAML config fidelity,
checkpoint-name mapping, pose batching, choose_residue, pocket-knowledge
eval, and t_max-capped schedules.

Reference surfaces covered: inference.py:57-105 (flag set +
default_inference_args.yaml), evaluate.py:137-140,317-321,364-366
(pocket knowledge), utils/sampling.py:49-51 (choose_residue).
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffdock_tpu.cli.dock import (
    apply_config_overrides, get_parser, sampler_config_from_args,
)
from diffdock_tpu.data.complexes import synthetic_complex
from diffdock_tpu.inference.sampler import SamplerConfig, randomize_position

# the reference default_inference_args.yaml, verbatim (checkpoint-contract
# constants; reference root)
REFERENCE_YAML = {
    "actual_steps": 19,
    "ckpt": "best_ema_inference_epoch_model.pt",
    "confidence_ckpt": "best_model_epoch75.pt",
    "confidence_model_dir": "./workdir/v1.1/confidence_model",
    "different_schedules": False,
    "inf_sched_alpha": 1,
    "inf_sched_beta": 1,
    "inference_steps": 20,
    "initial_noise_std_proportion": 1.4601642460337794,
    "limit_failures": 5,
    "model_dir": "./workdir/v1.1/score_model",
    "no_final_step_noise": True,
    "no_model": False,
    "no_random": False,
    "no_random_pocket": False,
    "ode": False,
    "old_filtering_model": True,
    "old_score_model": False,
    "resample_rdkit": False,
    "samples_per_complex": 10,
    "sigma_schedule": "expbeta",
    "temp_psi_rot": 0.9022615585677628,
    "temp_psi_tor": 0.5946212391366862,
    "temp_psi_tr": 0.727287304570729,
    "temp_sampling_rot": 2.06391612594481,
    "temp_sampling_tor": 7.044261621607846,
    "temp_sampling_tr": 1.170050527854316,
    "temp_sigma_data_rot": 0.7464326999906034,
    "temp_sigma_data_tor": 0.6943254174849822,
    "temp_sigma_data_tr": 0.9299802531572672,
}


def test_reference_yaml_loads_without_warnings(capsys):
    args = get_parser().parse_args([])
    apply_config_overrides(args, REFERENCE_YAML)
    assert "unknown config key" not in capsys.readouterr().err

    cfg = sampler_config_from_args(args)
    assert cfg.temp_sampling == (
        1.170050527854316, 2.06391612594481, 7.044261621607846
    )
    assert cfg.temp_psi[1] == 0.9022615585677628
    assert cfg.temp_sigma_data[2] == 0.6943254174849822
    assert cfg.inference_steps == 20 and cfg.actual_steps == 19
    assert args.ckpt == "best_ema_inference_epoch_model.pt"
    assert args.model_dir == "./workdir/v1.1/score_model"


def test_unknown_yaml_key_warns(capsys):
    args = get_parser().parse_args([])
    apply_config_overrides(args, {"not_a_real_flag": 1})
    assert "not_a_real_flag" in capsys.readouterr().err


def test_partial_temp_override_merges_with_tuned_defaults():
    args = get_parser().parse_args(["--temp_sampling_tr", "2.5"])
    cfg = sampler_config_from_args(args)
    base = SamplerConfig()
    assert cfg.temp_sampling == (2.5,) + base.temp_sampling[1:]
    assert cfg.temp_psi == base.temp_psi


def test_ligand_description_alias():
    args = get_parser().parse_args(["--ligand_description", "CCO"])
    assert args.ligand == "CCO"


def test_resolve_weights_name(tmp_path):
    from diffdock_tpu.train.checkpoints import resolve_weights_name

    d = str(tmp_path)
    for f in ("best_ema_model.msgpack", "best_model.msgpack",
              "last_model.msgpack"):
        open(os.path.join(d, f), "w").close()
    assert resolve_weights_name(
        d, "best_ema_inference_epoch_model.pt") == "best_ema_model.msgpack"
    assert resolve_weights_name(
        d, "best_model_epoch75.pt") == "best_model.msgpack"
    assert resolve_weights_name(d, "last_model.pt") == "last_model.msgpack"
    # literal file wins
    open(os.path.join(d, "custom.pt"), "w").close()
    assert resolve_weights_name(d, "custom.pt") == "custom.pt"


def test_t_max_caps_schedule():
    full = SamplerConfig(t_max=1.0).schedule()
    capped = SamplerConfig(t_max=0.25).schedule()
    assert np.isclose(full[0], 1.0)
    # expbeta with alpha=beta=1 is uniform: the capped grid starts at t_max
    assert np.isclose(capped[0], 0.25)
    assert capped.shape == full.shape
    assert (np.diff(capped) < 0).all()


def _small_data(seed=0, n_lig=6, n_rec=12):
    rng = np.random.RandomState(seed)
    return synthetic_complex(rng, n_lig=n_lig, n_rec=n_rec, n_bonds=2)


def test_choose_residue_lands_on_residues():
    data = jax.tree.map(jnp.asarray, _small_data())
    poses = randomize_position(
        jax.random.PRNGKey(0), data, 64, tr_sigma_max=19.0,
        initial_noise_std_proportion=-1.0, choose_residue=True,
    )
    rec = np.asarray(data.rec_pos)
    rw = np.asarray(data.rec_mask).astype(float)[:, None]
    rec_mean = (rec * rw).sum(0) / rw.sum()
    centers = np.asarray(poses.mean(axis=1))  # (P, 3) ligand centers
    # reference quirk: placement = receptor mean + residue position + eps
    targets = rec_mean[None] + rec[np.asarray(data.rec_mask, bool)]
    d = np.linalg.norm(centers[:, None] - targets[None], axis=-1)
    nearest = d.min(axis=1)
    assert (nearest < 0.5).all(), nearest.max()
    # many distinct residues get chosen across 64 poses
    assert len(np.unique(d.argmin(axis=1))) > 3


def test_true_pocket_center():
    from diffdock_tpu.cli.evaluate import true_pocket_center

    data = _small_data()
    c = true_pocket_center(data, pocket_cutoff=5.0)
    rec = np.asarray(data.rec_pos)[np.asarray(data.rec_mask, bool)]
    lig = np.asarray(data.lig_pos)[np.asarray(data.lig_mask, bool)]
    d = np.linalg.norm(rec[:, None] - lig[None], axis=-1)
    label = (d < 5.0).any(axis=1)
    expect = rec[label].mean(0) if label.any() else rec[d.min(1).argmin()]
    np.testing.assert_allclose(c, expect)
    # huge cutoff: every residue labeled -> receptor mean
    np.testing.assert_allclose(
        true_pocket_center(data, 1e9), rec.mean(0), rtol=1e-6
    )


@pytest.fixture(scope="module")
def tiny_pipeline():
    from diffdock_tpu.inference.pipeline import DockingPipeline
    from diffdock_tpu.models.config import ScoreModelConfig
    from diffdock_tpu.models.score_model import CGScoreModel

    cfg = ScoreModelConfig(ns=8, nv=2, num_conv_layers=2,
                           num_prot_emb_layers=1)
    model = CGScoreModel(cfg)
    data = jax.tree.map(jnp.asarray, _small_data())
    from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
    from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables

    so3 = get_so3_tables(SO3Config(n_eps=64, x_n=128, l_max=256))
    torus = get_torus_tables(TorusConfig(x_n=128, sigma_n=64,
                                         mc_samples=500))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), data, data.lig_pos, jnp.asarray(0.5),
        so3, torus,
    )
    from diffdock_tpu.inference.sampler import SamplerConfig

    return DockingPipeline(
        cfg, params,
        SamplerConfig(inference_steps=2, actual_steps=2),
        so3_tables=so3, torus_tables=torus,
    )


@pytest.mark.slow
def test_pocket_center_shares_compiled_program(tiny_pipeline):
    data = _small_data()
    r1 = tiny_pipeline.dock_complex(data, num_poses=2, seed=0)
    n_programs = len(tiny_pipeline._compiled)
    r2 = tiny_pipeline.dock_complex(
        data, num_poses=2, seed=0,
        pocket_center=np.asarray([5.0, 5.0, 5.0]),
    )
    # the pocket center is a traced argument: no recompile
    assert len(tiny_pipeline._compiled) == n_programs
    assert not np.allclose(r1.poses, r2.poses)


@pytest.mark.slow
def test_batch_size_chunks_through_one_program(tiny_pipeline):
    data = _small_data()
    res = tiny_pipeline.dock_complex(data, num_poses=5, seed=0,
                                     batch_size=2)
    assert res.poses.shape[0] == 5
    # chunks all ran through the SINGLE 2-pose program
    keys = [k for k in tiny_pipeline._compiled if k[4] == 2]
    assert keys, list(tiny_pipeline._compiled)
    assert np.isfinite(res.poses).all()
    # chunk seeds differ -> poses differ across chunks
    assert not np.allclose(res.poses[0], res.poses[2])


def _bucket_capture_pipeline(bucket_ladder):
    """A pipeline whose compile step is stubbed to record the chosen
    bucket — tests the ladder routing without paying a real compile."""
    from diffdock_tpu.inference.pipeline import DockingPipeline
    from diffdock_tpu.inference.sampler import SamplerConfig
    from diffdock_tpu.models.config import ScoreModelConfig

    cfg = ScoreModelConfig(ns=8, nv=2, num_conv_layers=2,
                           num_prot_emb_layers=1)
    pipe = DockingPipeline.__new__(DockingPipeline)
    pipe.pre_crop_radius = None
    pipe.pocket_capacity = None
    pipe.mesh = None
    pipe.so3 = None
    pipe.torus = None
    pipe.bucket_ladder = bucket_ladder
    pipe.score_cfg = cfg
    pipe.confidence_cfg = None
    pipe.confidence_model = None
    pipe.sampler_cfg = SamplerConfig(inference_steps=2, actual_steps=2)
    pipe._compiled = {}
    pipe._executables = {}
    pipe._quarantined = set()
    pipe.anomaly_guard = 0.0
    pipe.captured = []

    def fake_get_compiled(bucket, num_poses, with_aa, with_traj):
        pipe.captured.append(bucket + (num_poses,))

        def fn(tables, params, key, padded, aa, pocket):
            nl = padded.lig_pos.shape[0]
            return (jnp.zeros((num_poses, nl, 3)),
                    jnp.zeros((num_poses,)), jnp.zeros(()), None)

        return fn

    pipe._get_compiled = fake_get_compiled
    pipe.score_params = None
    pipe.confidence_params = None
    return pipe


def test_cover_ladder_routes_to_cover_bucket():
    from diffdock_tpu.inference.ladder import cover_bucket

    data = _small_data(n_lig=6, n_rec=12)
    pipe = _bucket_capture_pipeline("cover")
    res = pipe.dock_complex(data, num_poses=2, seed=0)
    expect = cover_bucket(data.n_lig, data.n_rec, data.n_bonds)[:3]
    assert pipe.captured[0][:3] == expect
    assert res.poses.shape == (2, data.n_lig, 3)


def test_fine_ladder_keeps_minimal_bucket():
    from diffdock_tpu.data.complexes import bucket_sizes

    data = _small_data(n_lig=6, n_rec=12)
    pipe = _bucket_capture_pipeline("fine")
    pipe.dock_complex(data, num_poses=2, seed=0)
    assert pipe.captured[0][:3] == bucket_sizes(
        data.n_lig, data.n_rec, data.n_bonds
    )


def test_cover_ladder_oversize_falls_back_to_fine():
    from diffdock_tpu.data.complexes import bucket_sizes

    # 300 ligand atoms exceeds every cover entry (max nl=96)
    data = _small_data(n_lig=300, n_rec=64)
    pipe = _bucket_capture_pipeline("cover")
    pipe.dock_complex(data, num_poses=2, seed=0)
    assert pipe.captured[0][:3] == bucket_sizes(
        data.n_lig, data.n_rec, data.n_bonds
    )


def test_cover_ladder_chunks_at_ladder_poses_in_flight():
    """In cover mode the default chunk is the ladder entry's P, so sweeps
    execute exactly the (bucket, P) programs that prewarm compiles; an
    explicit batch_size is capped at that HBM-safe P."""
    from diffdock_tpu.inference.ladder import cover_bucket

    data = _small_data(n_lig=6, n_rec=12)
    cov = cover_bucket(data.n_lig, data.n_rec, data.n_bonds)
    ladder_p = cov[3]

    pipe = _bucket_capture_pipeline("cover")
    res = pipe.dock_complex(data, num_poses=2 * ladder_p + 1, seed=0)
    # three chunks, every program at the ladder's P
    assert [c[4] for c in pipe.captured] == [ladder_p] * 3
    assert res.poses.shape == (2 * ladder_p + 1, data.n_lig, 3)

    pipe = _bucket_capture_pipeline("cover")
    pipe.dock_complex(data, num_poses=ladder_p + 1, seed=0,
                      batch_size=10 * ladder_p)
    assert [c[4] for c in pipe.captured] == [ladder_p] * 2


# ---------------------------------------------------------------------------
# Final-step semantics (reference utils/sampling.py:100-102,140 with
# inference.py:261 passing actual_steps as sampling()'s inference_steps):
# the LAST EXECUTED step integrates all the way to t=0 and is where
# no_final_step_noise applies — even when actual_steps < inference_steps.


class _FakeScore:
    def __init__(self, tr, rot, tor):
        self.tr, self.rot, self.tor = tr, rot, tor


def test_no_final_step_noise_fires_on_last_executed_step():
    """With actual_steps=1 < inference_steps and a zero score, the single
    executed step is the last one: its noise must be zeroed, leaving the
    poses exactly unchanged."""
    from diffdock_tpu.diffusion.schedules import SigmaConfig
    from diffdock_tpu.inference.sampler import reverse_diffusion

    data = jax.tree.map(jnp.asarray, _small_data())
    cfg = SamplerConfig(inference_steps=4, actual_steps=1,
                        no_final_step_noise=True)
    init = jnp.broadcast_to(data.lig_pos, (2,) + data.lig_pos.shape)

    def score_fn(poses, t):
        p = poses.shape[0]
        return _FakeScore(jnp.zeros((p, 3)), jnp.zeros((p, 3)),
                          jnp.zeros((p, data.rot_u.shape[0])))

    final = reverse_diffusion(
        jax.random.PRNGKey(0), score_fn, data, init, cfg, SigmaConfig(),
        None, None,
    )
    np.testing.assert_allclose(np.asarray(final), np.asarray(init),
                               atol=1e-4)


def test_last_executed_step_integrates_to_zero():
    """dt at the last executed step is sched[last] itself (the jump to
    t=0), not sched[last] - sched[last+1]: verified against the closed
    form of the accumulated translation for a constant tr score."""
    from diffdock_tpu.diffusion.schedules import (
        SigmaConfig, get_t_schedule, t_to_sigma,
    )
    from diffdock_tpu.inference.sampler import reverse_diffusion

    data = jax.tree.map(jnp.asarray, _small_data())
    sig = SigmaConfig()
    n_steps, n_actual = 5, 3
    cfg = SamplerConfig(
        inference_steps=n_steps, actual_steps=n_actual, no_random=True,
        temp_sampling=(1.0, 1.0, 1.0),
    )
    c = np.array([0.011, -0.007, 0.005], np.float32)

    def score_fn(poses, t):
        p = poses.shape[0]
        return _FakeScore(
            jnp.broadcast_to(jnp.asarray(c), (p, 3)),
            jnp.zeros((p, 3)),
            jnp.zeros((p, data.rot_u.shape[0])),
        )

    init = jnp.broadcast_to(data.lig_pos, (2,) + data.lig_pos.shape)
    final = reverse_diffusion(
        jax.random.PRNGKey(0), score_fn, data, init, cfg, sig, None, None,
    )

    sched = get_t_schedule(cfg.sigma_schedule, n_steps)
    g2 = np.sqrt(2 * np.log(sig.tr_sigma_max / sig.tr_sigma_min)) ** 2
    expect = np.zeros(3)
    for i in range(n_actual):
        dt = sched[i] - sched[i + 1] if i < n_actual - 1 else sched[i]
        tr_sigma = float(t_to_sigma(sched[i], sched[i], sched[i], sig)[0])
        expect += tr_sigma**2 * g2 * dt * c
    amask = np.asarray(data.lig_mask, bool)
    moved = (np.asarray(final) - np.asarray(init))[:, amask].mean(1)
    np.testing.assert_allclose(
        moved, np.broadcast_to(expect, moved.shape), rtol=1e-3, atol=1e-5
    )
