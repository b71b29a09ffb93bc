"""v1.0 (old) architecture family: shapes, SE(3) equivariance, padding
invariance, confidence mode, factory dispatch.

Reference: models/old_cg_model.py, models/old_aa_model.py,
models/tensor_layers.py:338-380 (OldTensorProductConvLayer),
models/layers.py:70-116 (OldAtomEncoder).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from diffdock_tpu.data.complexes import (
    pad_aa_to,
    pad_to,
    synthetic_aa_complex,
    synthetic_complex,
)
from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
from diffdock_tpu.models.config import ScoreModelConfig
from diffdock_tpu.models.factory import build_model
from diffdock_tpu.models.old_models import OldAAScoreModel, OldCGScoreModel

SO3_SMALL = SO3Config(n_eps=64, x_n=256, l_max=512)
TORUS_SMALL = TorusConfig(x_n=256, sigma_n=128, mc_samples=2000)

OLD_CFG = ScoreModelConfig(
    ns=8, nv=2, num_conv_layers=3, old_architecture=True,
    # released old checkpoints: dynamic cutoff off, fixed_center_conv False
    fixed_center_conv=False,
)


@pytest.fixture(scope="module")
def tables():
    return get_so3_tables(SO3_SMALL), get_torus_tables(TORUS_SMALL)


@pytest.fixture(scope="module")
def cg_setup(tables):
    so3, torus = tables
    model = OldCGScoreModel(OLD_CFG)
    rng = np.random.RandomState(0)
    data = jax.tree.map(
        jnp.asarray, synthetic_complex(rng, n_lig=8, n_rec=12, n_bonds=2)
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), data, data.lig_pos, jnp.asarray(0.5), so3, torus
    )
    return model, data, params


@pytest.fixture(scope="module")
def aa_setup(tables):
    so3, torus = tables
    cfg = dataclasses.replace(OLD_CFG, all_atoms=True, confidence_mode=True)
    model = OldAAScoreModel(cfg)
    rng = np.random.RandomState(1)
    data = jax.tree.map(
        jnp.asarray,
        synthetic_aa_complex(rng, n_lig=8, n_rec=12, n_bonds=2, atoms_per_res=3),
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(1), data, data.base.lig_pos, jnp.asarray(0.0),
        so3, torus,
    )
    return model, data, params


def test_old_cg_forward_shapes(cg_setup, tables):
    so3, torus = tables
    model, data, params = cg_setup
    out = model.apply(params, data, data.lig_pos, jnp.asarray(0.5), so3, torus)
    assert out.tr.shape == (3,)
    assert out.rot.shape == (3,)
    assert out.tor.shape == (data.rot_u.shape[0],)
    for arr in (out.tr, out.rot, out.tor):
        assert np.isfinite(np.asarray(arr)).all()


def test_old_cg_equivariance(cg_setup, tables):
    so3, torus = tables
    model, data, params = cg_setup
    rot = R.from_rotvec([0.4, -0.2, 0.7]).as_matrix().astype(np.float32)
    out = model.apply(params, data, data.lig_pos, jnp.asarray(0.5), so3, torus)
    data_r = data._replace(
        rec_pos=jnp.asarray(np.asarray(data.rec_pos) @ rot.T),
        lig_pos=jnp.asarray(np.asarray(data.lig_pos) @ rot.T),
    )
    out_r = model.apply(
        params, data_r, data_r.lig_pos, jnp.asarray(0.5), so3, torus
    )
    np.testing.assert_allclose(
        np.asarray(out_r.tr), np.asarray(out.tr) @ rot.T, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_r.rot), np.asarray(out.rot) @ rot.T, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_r.tor), np.asarray(out.tor), atol=5e-3
    )


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_old_cg_padding_invariance(tables):
    so3, torus = tables
    model = OldCGScoreModel(OLD_CFG)
    rng = np.random.RandomState(3)
    raw = synthetic_complex(rng, n_lig=8, n_rec=12, n_bonds=2)
    data = jax.tree.map(jnp.asarray, raw)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(2), data, data.lig_pos, jnp.asarray(0.5), so3, torus
    )
    out = model.apply(params, data, data.lig_pos, jnp.asarray(0.5), so3, torus)
    padded = jax.tree.map(jnp.asarray, pad_to(raw, 12, 20, 4))
    out_p = model.apply(
        params, padded, padded.lig_pos, jnp.asarray(0.5), so3, torus
    )
    np.testing.assert_allclose(np.asarray(out_p.tr), np.asarray(out.tr), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_p.rot), np.asarray(out.rot), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out_p.tor[:2]), np.asarray(out.tor), atol=2e-4
    )


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_old_cg_lm_embedding_overlap_slicing(tables):
    """With ESM, the old encoder's scalar block overlaps the LM block —
    verify the forward runs and perturbing only lm[:32] changes the output
    (they feed the 'scalar' linear)."""
    so3, torus = tables
    cfg = dataclasses.replace(OLD_CFG, lm_embedding_dim=64)
    model = OldCGScoreModel(cfg)
    rng = np.random.RandomState(4)
    data = synthetic_complex(rng, n_lig=8, n_rec=12, n_bonds=2, lm_dim=64)
    data = jax.tree.map(jnp.asarray, data)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(3), data, data.lig_pos, jnp.asarray(0.5), so3, torus
    )
    out = model.apply(params, data, data.lig_pos, jnp.asarray(0.5), so3, torus)
    assert np.isfinite(np.asarray(out.tr)).all()
    bumped = data._replace(rec_lm=data.rec_lm.at[:, :8].add(1.0))
    out_b = model.apply(
        params, bumped, bumped.lig_pos, jnp.asarray(0.5), so3, torus
    )
    assert not np.allclose(np.asarray(out_b.tr), np.asarray(out.tr))


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_old_aa_confidence_shapes_and_padding(aa_setup, tables):
    so3, torus = tables
    model, data, params = aa_setup
    out = model.apply(
        params, data, data.base.lig_pos, jnp.asarray(0.0), so3, torus
    )
    assert out.shape == (1,)
    assert np.isfinite(np.asarray(out)).all()

    padded = pad_aa_to(jax.tree.map(np.asarray, data), 12, 16, 4, 48)
    padded = jax.tree.map(jnp.asarray, padded)
    out_p = model.apply(
        params, padded, padded.base.lig_pos, jnp.asarray(0.0), so3, torus
    )
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out), atol=2e-4)


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_old_aa_confidence_invariance(aa_setup, tables):
    so3, torus = tables
    model, data, params = aa_setup
    rot = R.from_rotvec([0.3, 0.1, -0.5]).as_matrix().astype(np.float32)
    out = model.apply(
        params, data, data.base.lig_pos, jnp.asarray(0.0), so3, torus
    )
    data_r = data._replace(
        base=data.base._replace(
            rec_pos=jnp.asarray(np.asarray(data.base.rec_pos) @ rot.T),
            lig_pos=jnp.asarray(np.asarray(data.base.lig_pos) @ rot.T),
        ),
        atom_pos=jnp.asarray(np.asarray(data.atom_pos) @ rot.T),
    )
    out_r = model.apply(
        params, data_r, data_r.base.lig_pos, jnp.asarray(0.0), so3, torus
    )
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out), atol=5e-3)


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_old_aa_score_mode(tables):
    so3, torus = tables
    cfg = dataclasses.replace(OLD_CFG, all_atoms=True, num_conv_layers=2)
    model = OldAAScoreModel(cfg)
    rng = np.random.RandomState(5)
    data = jax.tree.map(
        jnp.asarray,
        synthetic_aa_complex(rng, n_lig=8, n_rec=10, n_bonds=2, atoms_per_res=3),
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(4), data, data.base.lig_pos, jnp.asarray(0.5),
        so3, torus,
    )
    out = model.apply(
        params, data, data.base.lig_pos, jnp.asarray(0.5), so3, torus
    )
    assert out.tr.shape == (3,) and out.rot.shape == (3,)
    assert np.isfinite(np.asarray(out.tr)).all()


def test_factory_old_dispatch():
    assert isinstance(build_model(OLD_CFG), OldCGScoreModel)
    assert isinstance(
        build_model(dataclasses.replace(OLD_CFG, all_atoms=True)),
        OldAAScoreModel,
    )
