"""All-atom model: shapes, finiteness, equivariance, cache consistency."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from diffdock_tpu.data.complexes import synthetic_aa_complex
from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
from diffdock_tpu.models.aa_model import AAScoreModel
from diffdock_tpu.models.config import ScoreModelConfig

SO3_SMALL = SO3Config(n_eps=64, x_n=256, l_max=512)
TORUS_SMALL = TorusConfig(x_n=256, sigma_n=128, mc_samples=2000)


pytestmark = pytest.mark.slow  # compile-heavy e2e

@pytest.fixture(scope="module")
def setup():
    cfg = ScoreModelConfig(ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=1)
    model = AAScoreModel(cfg)
    rng = np.random.RandomState(2)
    data = jax.tree.map(
        jnp.asarray,
        synthetic_aa_complex(rng, n_lig=8, n_rec=12, n_bonds=2, atoms_per_res=3),
    )
    so3 = get_so3_tables(SO3_SMALL)
    torus = get_torus_tables(TORUS_SMALL)
    t = jnp.asarray(0.5)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), data, data.base.lig_pos, t, so3, torus
    )
    return cfg, model, data, so3, torus, params


def test_aa_forward_shapes(setup):
    cfg, model, data, so3, torus, params = setup
    out = model.apply(
        params, data, data.base.lig_pos, jnp.asarray(0.5), so3, torus
    )
    assert out.tr.shape == (3,)
    assert out.rot.shape == (3,)
    assert out.tor.shape == (data.base.rot_u.shape[0],)
    for arr in (out.tr, out.rot, out.tor):
        assert np.isfinite(np.asarray(arr)).all()


def test_aa_equivariance(setup):
    cfg, model, data, so3, torus, params = setup
    rot = R.from_rotvec([0.2, 0.5, -0.3]).as_matrix().astype(np.float32)
    out = model.apply(
        params, data, data.base.lig_pos, jnp.asarray(0.5), so3, torus
    )
    data_r = data._replace(
        base=data.base._replace(
            rec_pos=jnp.asarray(np.asarray(data.base.rec_pos) @ rot.T),
            lig_pos=jnp.asarray(np.asarray(data.base.lig_pos) @ rot.T),
        ),
        atom_pos=jnp.asarray(np.asarray(data.atom_pos) @ rot.T),
    )
    out_r = model.apply(
        params, data_r, data_r.base.lig_pos, jnp.asarray(0.5), so3, torus
    )
    np.testing.assert_allclose(
        np.asarray(out_r.tr), np.asarray(out.tr) @ rot.T, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_r.rot), np.asarray(out.rot) @ rot.T, atol=5e-3
    )
    np.testing.assert_allclose(np.asarray(out_r.tor), np.asarray(out.tor), atol=5e-3)


def test_aa_rec_cache(setup):
    cfg, model, data, so3, torus, params = setup
    cache = model.apply(params, data, method="embed_receptor")
    a = model.apply(
        params, data, data.base.lig_pos, jnp.asarray(0.3), so3, torus,
        rec_cache=cache,
    )
    b = model.apply(
        params, data, data.base.lig_pos, jnp.asarray(0.3), so3, torus
    )
    np.testing.assert_allclose(np.asarray(a.tr), np.asarray(b.tr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.tor), np.asarray(b.tor), atol=1e-5)


def test_aa_confidence_mode(setup):
    _, _, data, so3, torus, _ = setup
    cfg = ScoreModelConfig(
        ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=1,
        confidence_mode=True,
    )
    model = AAScoreModel(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(3), data, data.base.lig_pos, jnp.asarray(0.0),
        so3, torus,
    )
    out = model.apply(
        params, data, data.base.lig_pos, jnp.asarray(0.0), so3, torus
    )
    assert out.shape == (1,)
    assert np.isfinite(np.asarray(out)).all()
