"""Docking pipeline wiring: CG score + (CG|AA) confidence, bucket reuse."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdock_tpu.data.complexes import synthetic_aa_complex
from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
from diffdock_tpu.inference.pipeline import DockingPipeline
from diffdock_tpu.inference.sampler import SamplerConfig
from diffdock_tpu.models.config import ScoreModelConfig
from diffdock_tpu.models.factory import build_model

SO3_SMALL = SO3Config(n_eps=64, x_n=256, l_max=512)
TORUS_SMALL = TorusConfig(x_n=256, sigma_n=128, mc_samples=2000)


pytestmark = pytest.mark.slow  # compile-heavy e2e

@pytest.fixture(scope="module")
def setup():
    so3 = get_so3_tables(SO3_SMALL)
    torus = get_torus_tables(TORUS_SMALL)
    rng = np.random.RandomState(0)
    aa = synthetic_aa_complex(rng, n_lig=8, n_rec=12, n_bonds=2, atoms_per_res=3)

    score_cfg = ScoreModelConfig(ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=0)
    score_model = build_model(score_cfg)
    sp = jax.jit(score_model.init)(
        jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, aa.base),
        jnp.asarray(aa.base.lig_pos), jnp.asarray(0.5), so3, torus,
    )
    return so3, torus, aa, score_cfg, sp


def test_pipeline_no_confidence(setup):
    so3, torus, aa, score_cfg, sp = setup
    pipe = DockingPipeline(
        score_cfg, sp, SamplerConfig(inference_steps=2, actual_steps=2),
        so3_tables=so3, torus_tables=torus,
    )
    res = pipe.dock_complex(aa.base, num_poses=2, seed=0)
    assert res.poses.shape == (2, aa.base.n_lig, 3)
    assert np.isfinite(res.poses).all()
    assert res.confidence is None


def test_pipeline_aa_confidence(setup):
    so3, torus, aa, score_cfg, sp = setup
    conf_cfg = ScoreModelConfig(
        ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=1,
        confidence_mode=True, all_atoms=True,
    )
    conf_model = build_model(conf_cfg)
    cp = jax.jit(conf_model.init)(
        jax.random.PRNGKey(1), jax.tree.map(jnp.asarray, aa),
        jnp.asarray(aa.base.lig_pos), jnp.asarray(0.0), so3, torus,
    )
    pipe = DockingPipeline(
        score_cfg, sp, SamplerConfig(inference_steps=2, actual_steps=2),
        confidence_cfg=conf_cfg, confidence_params=cp,
        so3_tables=so3, torus_tables=torus,
    )
    res = pipe.dock_complex(aa.base, num_poses=3, seed=0, aa_data=aa)
    assert res.poses.shape == (3, aa.base.n_lig, 3)
    assert res.confidence.shape == (3,)
    assert np.isfinite(res.confidence).all()
    # order sorts confidence descending
    assert (np.diff(res.confidence[res.order]) <= 1e-6).all()

    # chunked confidence (lax.map over pose chunks — the HBM-bounded path
    # large all-atom buckets take) must reproduce the full-vmap scores
    # exactly: same poses (identical sampler), same confidences
    chunked = DockingPipeline(
        score_cfg, sp, SamplerConfig(inference_steps=2, actual_steps=2),
        confidence_cfg=conf_cfg, confidence_params=cp,
        so3_tables=so3, torus_tables=torus, confidence_chunk=2,
    )
    res_c = chunked.dock_complex(aa.base, num_poses=3, seed=0, aa_data=aa)
    np.testing.assert_allclose(res_c.poses, res.poses, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        res_c.confidence, res.confidence, rtol=1e-5, atol=1e-5
    )
    assert (res_c.order == res.order).all()


def test_pipeline_affinity_prediction(setup):
    so3, torus, aa, score_cfg, sp = setup
    conf_cfg = ScoreModelConfig(
        ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=1,
        confidence_mode=True, all_atoms=True, affinity_prediction=True,
    )
    conf_model = build_model(conf_cfg)
    cp = jax.jit(conf_model.init)(
        jax.random.PRNGKey(1), jax.tree.map(jnp.asarray, aa),
        jnp.asarray(aa.base.lig_pos), jnp.asarray(0.0), so3, torus,
    )
    pipe = DockingPipeline(
        score_cfg, sp, SamplerConfig(inference_steps=2, actual_steps=2),
        confidence_cfg=conf_cfg, confidence_params=cp,
        so3_tables=so3, torus_tables=torus,
    )
    res = pipe.dock_complex(aa.base, num_poses=3, seed=0, aa_data=aa)
    assert res.confidence.shape == (3,)
    assert res.affinity is not None and np.isfinite(res.affinity)


def test_pipeline_trajectory(setup, tmp_path):
    so3, torus, aa, score_cfg, sp = setup
    pipe = DockingPipeline(
        score_cfg, sp, SamplerConfig(inference_steps=3, actual_steps=3),
        so3_tables=so3, torus_tables=torus,
    )
    res = pipe.dock_complex(
        aa.base, num_poses=2, seed=0, return_trajectory=True
    )
    assert res.trajectory is not None
    assert res.trajectory.shape == (4, 2, aa.base.n_lig, 3)  # init + 3 steps
    # trajectory ends at the final poses
    np.testing.assert_allclose(res.trajectory[-1], res.poses, atol=1e-4)
    # writer produces a multi-MODEL PDB
    from diffdock_tpu.utils.visualise import LigandTrajectoryWriter

    w = LigandTrajectoryWriter(["C"] * aa.base.n_lig)
    for frame in res.trajectory[:, 0]:
        w.add(frame)
    text = w.to_pdb()
    assert text.count("MODEL") == 4 and text.count("ENDMDL") == 4


def test_inference_normalization_unifies_program_identity(setup):
    """Round-5 e2e finding: real featurized complexes carry rec_scv (a
    training-only sidechain target) and a molecule-specific bond-neighbor
    width, which retraced/recompiled every bucket program relative to the
    synthetic ones prewarm/bench measure. rec_scv is dropped at the dock
    boundary; bond width is normalized by pad_to — same traced pytree,
    same results, no second compiled program."""
    so3, torus, aa, score_cfg, sp = setup
    pipe = DockingPipeline(
        score_cfg, sp, SamplerConfig(inference_steps=2, actual_steps=2),
        so3_tables=so3, torus_tables=torus,
    )
    clean = aa.base

    # a "featurized-style" variant: rec_scv present, bond width 3
    messy = clean._replace(
        rec_scv=np.zeros((clean.rec_pos.shape[0], 10), np.float32),
        lig_bond_nbr=np.asarray(clean.lig_bond_nbr)[:, :3],
        lig_bond_mask=np.asarray(clean.lig_bond_mask)[:, :3],
        lig_bond_attr=np.asarray(clean.lig_bond_attr)[:, :3],
    )
    assert pipe._normalize_inference_data(messy).rec_scv is None

    # end to end: identical results and no second compiled program
    r_clean = pipe.dock_complex(clean, num_poses=2, seed=0)
    n_programs = len(pipe._compiled) + len(pipe._executables)
    r_messy = pipe.dock_complex(messy, num_poses=2, seed=0)
    assert len(pipe._compiled) + len(pipe._executables) == n_programs
    np.testing.assert_allclose(r_messy.poses, r_clean.poses,
                               rtol=1e-6, atol=1e-6)


def test_confidence_chunk_validated_at_construction(setup):
    """confidence_chunk=0 used to reach `(-P) % 0` at trace time deep in
    _make_run; reject it up front (None = HBM-auto is the off switch)."""
    so3, torus, aa, score_cfg, sp = setup
    with pytest.raises(ValueError, match="confidence_chunk"):
        DockingPipeline(
            score_cfg, sp, SamplerConfig(inference_steps=2, actual_steps=2),
            so3_tables=so3, torus_tables=torus, confidence_chunk=0,
        )
