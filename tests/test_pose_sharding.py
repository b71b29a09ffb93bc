"""Pose-parallel inference over a device mesh (virtual 8-CPU-device).

The reference's only parallelism is single-node PyG DataParallel
(``utils/utils.py:278-279``); the TPU-native inference scale-out shards
the pose axis over a 1-axis mesh: complex + params replicated, per-device
RNG folding, no collectives in the hot loop (``parallel/mesh.py``,
``DockingPipeline(mesh=...)``).
"""

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
from diffdock_tpu.parallel.mesh import make_mesh, shard_pose_sampler

SO3_SMALL = SO3Config(n_eps=64, x_n=256, l_max=512)
TORUS_SMALL = TorusConfig(x_n=256, sigma_n=128, mc_samples=2000)


def test_shard_pose_sampler_folds_rng():
    """The generic pose-sharding wrapper: pose axis sharded, data
    replicated, each shard draws independent noise (per-device RNG fold)."""
    mesh = make_mesh(4)

    def sample_fn(key, data, init_poses):
        noise = jax.random.normal(key, init_poses.shape)
        return init_poses + data["scale"] * noise

    fn = shard_pose_sampler(sample_fn, mesh)
    init = jnp.zeros((8, 5, 3))
    data = {"scale": jnp.asarray(1.0)}
    out = np.asarray(fn(jax.random.PRNGKey(0), data, init))
    assert out.shape == (8, 5, 3)
    # shards fold their mesh index into the key -> distinct noise per shard
    shards = out.reshape(4, 2, 5, 3)
    for i in range(4):
        for j in range(i + 1, 4):
            assert not np.allclose(shards[i], shards[j])
    # deterministic for a fixed key
    out2 = np.asarray(fn(jax.random.PRNGKey(0), data, init))
    np.testing.assert_allclose(out, out2)


@pytest.fixture(scope="module")
def setup():
    so3 = get_so3_tables(SO3_SMALL)
    torus = get_torus_tables(TORUS_SMALL)
    rng = np.random.RandomState(0)
    aa = synthetic_aa_complex(rng, n_lig=8, n_rec=12, n_bonds=2,
                              atoms_per_res=3)
    score_cfg = ScoreModelConfig(
        ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=0
    )
    score_model = build_model(score_cfg)
    sp = jax.jit(score_model.init)(
        jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, aa.base),
        jnp.asarray(aa.base.lig_pos), jnp.asarray(0.5), so3, torus,
    )
    return so3, torus, aa, score_cfg, sp


@pytest.mark.slow  # compile-heavy e2e
def test_sharded_pipeline_pose_axis(setup):
    """num_poses that doesn't divide the mesh rounds up internally and is
    sliced back; every pose is distinct (per-shard RNG folding)."""
    so3, torus, aa, score_cfg, sp = setup
    pipe = DockingPipeline(
        score_cfg, sp, SamplerConfig(inference_steps=2, actual_steps=2),
        so3_tables=so3, torus_tables=torus, mesh=make_mesh(4),
    )
    res = pipe.dock_complex(aa.base, num_poses=6, seed=0)
    assert res.poses.shape == (6, aa.base.n_lig, 3)
    assert np.isfinite(res.poses).all()
    assert res.confidence is None
    for i in range(6):
        for j in range(i + 1, 6):
            assert not np.allclose(res.poses[i], res.poses[j])


@pytest.mark.slow
def test_sharded_pipeline_confidence_affinity(setup):
    """Confidence scoring + the affinity pmean collective under the mesh."""
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
        so3_tables=so3, torus_tables=torus, mesh=make_mesh(2),
    )
    res = pipe.dock_complex(aa.base, num_poses=4, seed=0, aa_data=aa)
    assert res.poses.shape == (4, aa.base.n_lig, 3)
    assert res.confidence.shape == (4,)
    assert np.isfinite(res.confidence).all()
    assert (np.diff(res.confidence[res.order]) <= 1e-6).all()
    assert res.affinity is not None and np.isfinite(res.affinity)


@pytest.mark.slow
def test_sharded_pipeline_trajectory(setup):
    """Step-major trajectory shards on the pose axis (axis 1)."""
    so3, torus, aa, score_cfg, sp = setup
    pipe = DockingPipeline(
        score_cfg, sp, SamplerConfig(inference_steps=3, actual_steps=3),
        so3_tables=so3, torus_tables=torus, mesh=make_mesh(2),
    )
    res = pipe.dock_complex(
        aa.base, num_poses=4, seed=0, return_trajectory=True
    )
    assert res.trajectory.shape == (4, 4, aa.base.n_lig, 3)
    np.testing.assert_allclose(res.trajectory[-1], res.poses, atol=1e-4)
