"""Runtime anomaly guard: quarantine + re-route of pathological cover
buckets (VERDICT r3 weak #2 — a cover bucket once ran 94x its cost model
under the driver while every neighbor was healthy).

The guard lives in ``DockingPipeline._execute``: in cover-ladder mode
each executed batch is timed (AOT lowering splits compile off, so the
FIRST batch is judged too); a batch slower than ``anomaly_guard`` x
``ladder.modeled_batch_seconds`` quarantines its cover entry and later
complexes re-route to the next covering entry (``cover_bucket(...,
exclude=...)``). These tests force-trip the guard with an absurdly small
threshold (any real execution exceeds it) and force-pass it with an
absurdly large one — no cost-model calibration needed on CPU.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import diffdock_tpu.inference.ladder as ladder
from diffdock_tpu.data.complexes import synthetic_complex
from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
from diffdock_tpu.inference.pipeline import DockingPipeline
from diffdock_tpu.inference.sampler import SamplerConfig
from diffdock_tpu.models.config import ScoreModelConfig
from diffdock_tpu.models.factory import build_model

SO3_SMALL = SO3Config(n_eps=64, x_n=256, l_max=512)
TORUS_SMALL = TorusConfig(x_n=256, sigma_n=128, mc_samples=2000)

# tiny two-entry ladder: entry 0 covers the test complex; entry 1 is the
# healthy fallback after entry 0 is quarantined
TINY_LADDER = ((8, 16, 4, 2), (16, 32, 4, 2))


@pytest.fixture(scope="module")
def setup():
    so3 = get_so3_tables(SO3_SMALL)
    torus = get_torus_tables(TORUS_SMALL)
    rng = np.random.RandomState(0)
    data = synthetic_complex(rng, n_lig=6, n_rec=10, n_bonds=2)
    cfg = ScoreModelConfig(
        ns=8, nv=2, num_conv_layers=1, num_prot_emb_layers=0
    )
    model = build_model(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, data),
        jnp.asarray(data.lig_pos), jnp.asarray(0.5), so3, torus,
    )
    return so3, torus, data, cfg, params


def _pipeline(setup, guard):
    so3, torus, data, cfg, params = setup
    return DockingPipeline(
        cfg, params, SamplerConfig(inference_steps=2, actual_steps=2),
        so3_tables=so3, torus_tables=torus,
        bucket_ladder="cover", anomaly_guard=guard,
    )


def test_guard_quarantines_and_reroutes(setup, monkeypatch):
    monkeypatch.setattr(ladder, "COVER_LADDER", TINY_LADDER)
    _, _, data, _, _ = setup
    pipe = _pipeline(setup, guard=1e-9)  # any real batch trips it
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = pipe.dock_complex(data, num_poses=2, seed=0)
    # the tripping batch's results are kept (slow, not wrong)
    assert res.poses.shape == (2, data.n_lig, 3)
    assert np.isfinite(res.poses).all()
    assert TINY_LADDER[0] in pipe._quarantined
    assert any("quarantined" in str(x.message) for x in w)
    # the next dock re-routes to entry 1 (padded shapes 16x32)
    assert pipe.effective_pose_chunk(data, 2) == 2
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        res2 = pipe.dock_complex(data, num_poses=2, seed=1)
    assert res2.poses.shape == (2, data.n_lig, 3)
    assert any(k[0] == 16 and k[1] == 32 for k in pipe._compiled)
    # entry 1 also trips -> both quarantined -> fine-ladder fallback
    assert TINY_LADDER[1] in pipe._quarantined
    res3 = pipe.dock_complex(data, num_poses=2, seed=2)
    assert res3.poses.shape == (2, data.n_lig, 3)


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_guard_disabled_and_not_tripped(setup, monkeypatch):
    monkeypatch.setattr(ladder, "COVER_LADDER", TINY_LADDER)
    _, _, data, _, _ = setup
    # guard=0 disables: no quarantine no matter how slow
    pipe = _pipeline(setup, guard=0.0)
    pipe.dock_complex(data, num_poses=2, seed=0)
    assert not pipe._quarantined
    # huge threshold: guard active (AOT path) but never trips
    pipe2 = _pipeline(setup, guard=1e12)
    r1 = pipe2.dock_complex(data, num_poses=2, seed=0)
    r2 = pipe2.dock_complex(data, num_poses=2, seed=0)
    assert not pipe2._quarantined
    # AOT-compiled path is deterministic and reused across calls
    assert pipe2._executables
    np.testing.assert_allclose(r1.poses, r2.poses, rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # compile-heavy (shard_map program on a 2-device mesh)
def test_guard_covers_dock_batch(setup, monkeypatch):
    """The complex-sharded sweep path is guarded too: a pathological
    chunk quarantines its cover entry, and the NEXT group of the sweep
    re-routes (remaining chunks of the tripping group keep the compiled
    program — correct results, just slow)."""
    from diffdock_tpu.parallel.mesh import make_mesh

    # dock_batch covers the GROUP's fine bucket (16x64x8 for this
    # complex), not the raw sizes — the tiny ladder must fit that
    batch_ladder = ((16, 64, 8, 2), (32, 128, 8, 2))
    monkeypatch.setattr(ladder, "COVER_LADDER", batch_ladder)
    so3, torus, data, cfg, params = setup
    pipe = DockingPipeline(
        cfg, params, SamplerConfig(inference_steps=2, actual_steps=2),
        so3_tables=so3, torus_tables=torus, mesh=make_mesh(2),
        bucket_ladder="cover", anomaly_guard=1e-9,
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res = pipe.dock_batch([data, data], num_poses=2, seed=0)
    assert len(res) == 2
    assert all(np.isfinite(r.poses).all() for r in res)
    assert batch_ladder[0] in pipe._quarantined
    assert any("quarantined" in str(x.message) for x in w)


def test_guard_default_off_on_cpu(setup):
    # auto mode: the cost model is chip-specific, so the guard must stay
    # off on non-TPU backends (CPU tests would spuriously quarantine)
    pipe = _pipeline(setup, guard=None)
    assert pipe.anomaly_guard == 0.0
