"""Complex-parallel inference over a device mesh (virtual 8-CPU-device).

``DockingPipeline.dock_batch`` shards the COMPLEX axis: one complex per
device, no collectives at all. This is the evaluation-sweep scale-out the
reference lacks entirely (it processes complexes strictly sequentially,
``evaluate.py:355-527``); combined with pose-chunking each device still
bounds its poses-in-flight by the cover ladder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdock_tpu.data.complexes import synthetic_complex
from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
from diffdock_tpu.inference.pipeline import DockingPipeline
from diffdock_tpu.inference.sampler import SamplerConfig
from diffdock_tpu.models.config import ScoreModelConfig
from diffdock_tpu.models.factory import build_model
from diffdock_tpu.parallel.mesh import make_mesh

SO3_SMALL = SO3Config(n_eps=64, x_n=256, l_max=512)
TORUS_SMALL = TorusConfig(x_n=256, sigma_n=128, mc_samples=2000)


@pytest.fixture(scope="module")
def setup():
    so3 = get_so3_tables(SO3_SMALL)
    torus = get_torus_tables(TORUS_SMALL)
    rng = np.random.RandomState(0)
    # deliberately mixed sizes: the batch groups by bucket and pads each
    # chunk to its largest member
    datas = [
        synthetic_complex(rng, n_lig=6 + 2 * (i % 3), n_rec=10 + 3 * i,
                          n_bonds=2)
        for i in range(5)
    ]
    score_cfg = ScoreModelConfig(
        ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=0
    )
    model = build_model(score_cfg)
    sp = jax.jit(model.init)(
        jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, datas[0]),
        jnp.asarray(datas[0].lig_pos), jnp.asarray(0.5), so3, torus,
    )
    return so3, torus, datas, score_cfg, sp


@pytest.mark.slow  # compile-heavy e2e
def test_dock_batch_sharded(setup):
    """5 mixed-size complexes over a 4-device mesh: chunks of 4 (last chunk
    padded by repetition), results in input order, per-complex shapes."""
    so3, torus, datas, score_cfg, sp = setup
    pipe = DockingPipeline(
        score_cfg, sp, SamplerConfig(inference_steps=2, actual_steps=2),
        so3_tables=so3, torus_tables=torus, mesh=make_mesh(4),
    )
    res = pipe.dock_batch(datas, num_poses=3, seed=0)
    assert len(res) == len(datas)
    for d, r in zip(datas, res):
        assert r.poses.shape == (3, d.n_lig, 3)
        assert np.isfinite(r.poses).all()
        assert r.confidence is None
    # distinct complexes draw distinct RNG -> different poses even for
    # same-size ligands
    assert not np.allclose(res[0].poses[:, :6], res[3].poses[:, :6])


@pytest.mark.slow
def test_dock_batch_no_mesh_falls_back(setup):
    """Without a mesh dock_batch is a sequential dock_complex loop."""
    so3, torus, datas, score_cfg, sp = setup
    pipe = DockingPipeline(
        score_cfg, sp, SamplerConfig(inference_steps=2, actual_steps=2),
        so3_tables=so3, torus_tables=torus,
    )
    res = pipe.dock_batch(datas[:2], num_poses=2, seed=5)
    ref = [
        pipe.dock_complex(d, num_poses=2, seed=5 + i)
        for i, d in enumerate(datas[:2])
    ]
    for a, b in zip(res, ref):
        np.testing.assert_allclose(a.poses, b.poses, atol=1e-5)
