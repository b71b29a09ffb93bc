"""Dense warmed-service bucket grid (DENSE_*_BUCKETS, fine_plan(dense=True),
DockingPipeline(bucket_ladder="fine_dense")).

The per-pose cost is linear in the padded NL*NR area (PERF.md), so the
~1.2x-spaced grid converts padding into throughput at the cost of program
count — the max-throughput plan for services with a warm persistent cache.
Reference contrast: torch eager pads nothing and pays per-complex dynamic
dispatch instead (evaluate.py:355-408)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdock_tpu.data.complexes import (
    DENSE_LIG_BUCKETS,
    DENSE_REC_BUCKETS,
    LIG_BUCKETS,
    REC_BUCKETS,
    bucket_sizes,
    synthetic_complex,
)
from diffdock_tpu.inference.ladder import (
    HBM_AREA_BOUND,
    HBM_POSE_NR_BOUND,
    fine_plan,
    pdbbind_like_sizes,
)


def test_dense_rungs_superset_and_sorted():
    # every default rung is a dense rung: a complex sitting exactly on a
    # default rung compiles the IDENTICAL program under both grids, so
    # banked measurements transfer between plans
    assert set(LIG_BUCKETS) <= set(DENSE_LIG_BUCKETS)
    assert set(REC_BUCKETS) <= set(DENSE_REC_BUCKETS)
    assert list(DENSE_LIG_BUCKETS) == sorted(DENSE_LIG_BUCKETS)
    assert list(DENSE_REC_BUCKETS) == sorted(DENSE_REC_BUCKETS)


def test_dense_bucket_sizes_round_to_dense_rungs():
    nl, nr, nb = bucket_sizes(18, 460, 4, dense=True)
    assert (nl, nr) == (20, 512)
    # default grid rounds the same complex coarser
    nl_d, nr_d, nb_d = bucket_sizes(18, 460, 4)
    assert (nl_d, nr_d) == (24, 704)
    assert nb == nb_d  # bond ladder is shared
    # overflow past the last rung still quantizes
    assert bucket_sizes(300, 4000, 4, dense=True)[0] == 304
    assert bucket_sizes(300, 4000, 4, dense=True)[1] == 4032


def test_dense_fine_plan_pads_less_and_stays_hbm_safe():
    sizes = pdbbind_like_sizes()

    def mean_pad(plan):
        pads = [
            (e[0] * e[1]) / (c[0] * c[1])
            for e, members in plan.items()
            for c in members
        ]
        return float(np.mean(pads))

    default = fine_plan(sizes)
    dense = fine_plan(sizes, dense=True)
    assert sum(len(m) for m in dense.values()) == len(sizes)
    assert mean_pad(dense) < mean_pad(default) - 0.15
    assert len(dense) > len(default)
    for nl, nr, nb, p in dense:
        assert 40 % p == 0  # whole batches of the 40-pose recipe
        assert p * nl * nr <= HBM_AREA_BOUND or p == 1
        assert p * nr <= HBM_POSE_NR_BOUND or p == 1


@pytest.mark.slow
def test_fine_dense_pipeline_matches_fine_poses():
    """Same complex, same seed, fine vs fine_dense ladder: only the
    padding extent differs (18x460 -> 24x704 vs 20x512), so the docked
    poses must agree to float tolerance — the e2e padding-invariance
    statement for the dense grid."""
    from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
    from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
    from diffdock_tpu.inference.pipeline import DockingPipeline
    from diffdock_tpu.inference.sampler import SamplerConfig
    from diffdock_tpu.models.config import ScoreModelConfig
    from diffdock_tpu.models.factory import build_model

    so3 = get_so3_tables(SO3Config(n_eps=64, x_n=256, l_max=512))
    torus = get_torus_tables(TorusConfig(x_n=256, sigma_n=128,
                                         mc_samples=2000))
    rng = np.random.RandomState(0)
    data = synthetic_complex(rng, n_lig=18, n_rec=100, n_bonds=4)
    assert (bucket_sizes(data.n_lig, data.n_rec, data.n_bonds)
            != bucket_sizes(data.n_lig, data.n_rec, data.n_bonds,
                            dense=True))

    cfg = ScoreModelConfig(ns=8, nv=2, num_conv_layers=2,
                           num_prot_emb_layers=0,
                           lm_embedding_dim=data.rec_lm.shape[1])
    model = build_model(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, data),
        jnp.asarray(data.lig_pos), jnp.asarray(0.5), so3, torus,
    )
    results = {}
    for ladder in ("fine", "fine_dense"):
        pipe = DockingPipeline(
            cfg, params, SamplerConfig(inference_steps=2, actual_steps=2),
            so3_tables=so3, torus_tables=torus, bucket_ladder=ladder,
        )
        results[ladder] = pipe.dock_complex(data, num_poses=2, seed=0).poses
    np.testing.assert_allclose(
        results["fine_dense"], results["fine"], atol=5e-3
    )
