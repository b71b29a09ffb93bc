"""crop_beyond (sigma-dependent receptor crop): the in-jit mask realization
must equal physically cropping the arrays, and a beyond-everything cutoff
must be a no-op. Reference: utils/utils.py:388-413, utils/sampling.py:104-109.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdock_tpu.data.complexes import (
    apply_rec_keep,
    apply_rec_keep_aa,
    crop_aa_complex,
    crop_complex,
    pad_aa_to,
    pad_to,
    rec_keep_mask,
    synthetic_aa_complex,
    synthetic_complex,
)
from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
from diffdock_tpu.models.aa_model import AAScoreModel
from diffdock_tpu.models.config import ScoreModelConfig
from diffdock_tpu.models.score_model import CGScoreModel

SO3_SMALL = SO3Config(n_eps=64, x_n=256, l_max=512)
TORUS_SMALL = TorusConfig(x_n=256, sigma_n=128, mc_samples=2000)
CFG = ScoreModelConfig(ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=1)


@pytest.fixture(scope="module")
def tables():
    return get_so3_tables(SO3_SMALL), get_torus_tables(TORUS_SMALL)


def test_mask_crop_equals_physical_crop(tables):
    so3, torus = tables
    model = CGScoreModel(CFG)
    rng = np.random.RandomState(0)
    raw = synthetic_complex(rng, n_lig=8, n_rec=24, n_bonds=2)
    data = jax.tree.map(jnp.asarray, raw)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), data, data.lig_pos, jnp.asarray(0.5), so3, torus
    )
    cutoff = 12.0
    keep = rec_keep_mask(
        np.asarray(raw.rec_pos), np.asarray(raw.rec_mask),
        np.asarray(raw.lig_pos)[None], np.asarray(raw.lig_mask), cutoff,
    )
    assert 0 < keep.sum() < raw.n_rec, "cutoff should crop some residues"

    out_masked = model.apply(
        params, data, data.lig_pos, jnp.asarray(0.5), so3, torus,
        rec_keep=jnp.asarray(keep),
    )
    cropped = crop_complex(raw, keep)
    # re-pad to the original receptor rows so shapes (and so weights'
    # semantics) are comparable
    cropped = jax.tree.map(
        jnp.asarray, pad_to(cropped, raw.n_lig, raw.n_rec, raw.n_bonds)
    )
    out_cropped = model.apply(
        params, cropped, cropped.lig_pos, jnp.asarray(0.5), so3, torus
    )
    np.testing.assert_allclose(
        np.asarray(out_masked.tr), np.asarray(out_cropped.tr), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_masked.rot), np.asarray(out_cropped.rot), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_masked.tor), np.asarray(out_cropped.tor), atol=2e-4
    )


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_huge_cutoff_is_noop(tables):
    so3, torus = tables
    model = CGScoreModel(CFG)
    rng = np.random.RandomState(1)
    raw = synthetic_complex(rng, n_lig=8, n_rec=16, n_bonds=2)
    data = jax.tree.map(jnp.asarray, raw)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(1), data, data.lig_pos, jnp.asarray(0.5), so3, torus
    )
    keep = rec_keep_mask(
        data.rec_pos, data.rec_mask, data.lig_pos[None], data.lig_mask, 1e6
    )
    assert bool(np.asarray(keep).sum() == raw.n_rec)
    a = model.apply(
        params, data, data.lig_pos, jnp.asarray(0.5), so3, torus,
        rec_keep=keep,
    )
    b = model.apply(params, data, data.lig_pos, jnp.asarray(0.5), so3, torus)
    np.testing.assert_allclose(np.asarray(a.tr), np.asarray(b.tr), atol=1e-5)


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_aa_mask_crop_equals_physical_crop(tables):
    so3, torus = tables
    cfg = dataclasses.replace(CFG, all_atoms=True, confidence_mode=True)
    model = AAScoreModel(cfg)
    rng = np.random.RandomState(2)
    raw = synthetic_aa_complex(rng, n_lig=8, n_rec=20, n_bonds=2,
                               atoms_per_res=3)
    data = jax.tree.map(jnp.asarray, raw)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(2), data, data.base.lig_pos, jnp.asarray(0.0),
        so3, torus,
    )
    cutoff = 12.0
    keep = rec_keep_mask(
        np.asarray(raw.base.rec_pos), np.asarray(raw.base.rec_mask),
        np.asarray(raw.base.lig_pos)[None], np.asarray(raw.base.lig_mask),
        cutoff,
    )
    assert 0 < keep.sum() < raw.base.n_rec

    out_masked = model.apply(
        params, data, data.base.lig_pos, jnp.asarray(0.0), so3, torus,
        rec_keep=jnp.asarray(keep),
    )
    cropped = crop_aa_complex(raw, keep)
    cropped = jax.tree.map(
        jnp.asarray,
        pad_aa_to(cropped, raw.base.n_lig, raw.base.n_rec, raw.base.n_bonds,
                  raw.n_atoms),
    )
    out_cropped = model.apply(
        params, cropped, cropped.base.lig_pos, jnp.asarray(0.0), so3, torus
    )
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_cropped), atol=2e-4
    )


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_pipeline_crop_beyond_runs(tables):
    """Pipeline with crop_beyond: pre-crop + per-step masking end-to-end."""
    so3, torus = tables
    from diffdock_tpu.inference.pipeline import DockingPipeline
    from diffdock_tpu.inference.sampler import SamplerConfig

    cfg = dataclasses.replace(CFG, crop_beyond=20.0)
    model = CGScoreModel(cfg)
    rng = np.random.RandomState(3)
    raw = synthetic_complex(rng, n_lig=8, n_rec=16, n_bonds=2)
    data = jax.tree.map(jnp.asarray, raw)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(3), data, data.lig_pos, jnp.asarray(0.5), so3, torus
    )
    pipe = DockingPipeline(
        cfg, params, SamplerConfig(inference_steps=2, actual_steps=2),
        so3_tables=so3, torus_tables=torus,
    )
    assert pipe.pre_crop_radius is not None
    res = pipe.dock_complex(raw, num_poses=2)
    assert np.isfinite(res.poses).all()


def test_compact_receptor_equals_mask_crop(tables):
    """In-jit pocket compaction (gather to fixed capacity) must match the
    masking crop on the same keep set — receptor row order is irrelevant
    to the model (all reductions are mask-aware and order-agnostic)."""
    from diffdock_tpu.data.complexes import compact_receptor, pocket_indices

    so3, torus = tables
    model = CGScoreModel(CFG)
    rng = np.random.RandomState(3)
    raw = synthetic_complex(rng, n_lig=8, n_rec=24, n_bonds=2)
    data = jax.tree.map(jnp.asarray, raw)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), data, data.lig_pos, jnp.asarray(0.5), so3, torus
    )
    cutoff = 12.0
    capacity = 16
    idx, valid = pocket_indices(
        data.rec_pos, data.rec_mask, data.lig_pos[None], data.lig_mask,
        cutoff, capacity,
    )
    keep = rec_keep_mask(
        data.rec_pos, data.rec_mask, data.lig_pos[None], data.lig_mask,
        cutoff,
    )
    n_keep = int(np.asarray(keep).sum())
    assert 0 < n_keep <= capacity, "capacity must cover the keep set here"
    assert int(np.asarray(valid).sum()) == n_keep
    # same residue set
    kept_global = set(np.asarray(idx)[np.asarray(valid)].tolist())
    assert kept_global == set(np.flatnonzero(np.asarray(keep)).tolist())

    out_mask = model.apply(
        params, data, data.lig_pos, jnp.asarray(0.5), so3, torus,
        rec_keep=keep,
    )
    pocket = compact_receptor(data, idx, valid)
    assert pocket.rec_mask.shape[0] == capacity
    out_pocket = model.apply(
        params, pocket, data.lig_pos, jnp.asarray(0.5), so3, torus
    )
    np.testing.assert_allclose(
        np.asarray(out_mask.tr), np.asarray(out_pocket.tr), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_mask.rot), np.asarray(out_pocket.rot), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_mask.tor), np.asarray(out_pocket.tor), atol=2e-4
    )


def test_compact_receptor_capacity_overflow(tables):
    """When more residues lie within the cutoff than capacity, the nearest
    ones win (graceful degradation, like the reference's edge caps)."""
    from diffdock_tpu.data.complexes import compact_receptor, pocket_indices

    rng = np.random.RandomState(4)
    raw = synthetic_complex(rng, n_lig=8, n_rec=24, n_bonds=2)
    data = jax.tree.map(jnp.asarray, raw)
    capacity = 4
    idx, valid = pocket_indices(
        data.rec_pos, data.rec_mask, data.lig_pos[None], data.lig_mask,
        1e9, capacity,
    )
    assert bool(valid.all())
    d2 = ((np.asarray(data.lig_pos)[:, None] -
           np.asarray(data.rec_pos)[None]) ** 2).sum(-1).min(0)
    d2[~np.asarray(data.rec_mask)] = np.inf
    expect = set(np.argsort(d2)[:capacity].tolist())
    assert set(np.asarray(idx).tolist()) == expect
    pocket = compact_receptor(data, idx, valid)
    assert int(np.asarray(pocket.rec_mask).sum()) == capacity


def test_pipeline_pocket_capacity_runs(tables):
    """Pipeline with crop_beyond + pocket compaction end-to-end."""
    so3, torus = tables
    from diffdock_tpu.inference.pipeline import DockingPipeline
    from diffdock_tpu.inference.sampler import SamplerConfig

    cfg = dataclasses.replace(CFG, crop_beyond=20.0)
    model = CGScoreModel(cfg)
    rng = np.random.RandomState(5)
    raw = synthetic_complex(rng, n_lig=8, n_rec=16, n_bonds=2)
    data = jax.tree.map(jnp.asarray, raw)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(5), data, data.lig_pos, jnp.asarray(0.5), so3, torus
    )
    pipe = DockingPipeline(
        cfg, params, SamplerConfig(inference_steps=2, actual_steps=2),
        so3_tables=so3, torus_tables=torus, pocket_capacity=12,
    )
    res = pipe.dock_complex(raw, num_poses=2)
    assert np.isfinite(res.poses).all()
