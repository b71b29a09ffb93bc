"""Score model: shapes, padding invariance, equivariance, receptor caching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from diffdock_tpu.data.complexes import (
    ComplexData,
    bucket_sizes,
    pad_to,
    synthetic_complex,
)
from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
from diffdock_tpu.models.config import ScoreModelConfig
from diffdock_tpu.models.score_model import CGScoreModel

SO3_SMALL = SO3Config(n_eps=64, x_n=256, l_max=512)
TORUS_SMALL = TorusConfig(x_n=256, sigma_n=128, mc_samples=2000)


@pytest.fixture(scope="module")
def setup():
    cfg = ScoreModelConfig(ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=1)
    model = CGScoreModel(cfg)
    rng = np.random.RandomState(0)
    data = synthetic_complex(rng, n_lig=10, n_rec=24, n_bonds=2)
    so3 = get_so3_tables(SO3_SMALL)
    torus = get_torus_tables(TORUS_SMALL)
    t = jnp.asarray(0.5)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), data, data.lig_pos, t, so3, torus
    )
    return cfg, model, data, so3, torus, params


def test_forward_shapes(setup):
    cfg, model, data, so3, torus, params = setup
    out = model.apply(params, data, data.lig_pos, jnp.asarray(0.5), so3, torus)
    assert out.tr.shape == (3,)
    assert out.rot.shape == (3,)
    assert out.tor.shape == (data.rot_u.shape[0],)
    assert np.isfinite(np.asarray(out.tr)).all()
    assert np.isfinite(np.asarray(out.rot)).all()
    assert np.isfinite(np.asarray(out.tor)).all()


def test_padding_invariance(setup):
    cfg, model, data, so3, torus, params = setup
    out = model.apply(params, data, data.lig_pos, jnp.asarray(0.5), so3, torus)
    nl, nr, nb = bucket_sizes(data.n_lig, data.n_rec, data.n_bonds)
    padded = pad_to(data, nl, nr, nb)
    out_p = model.apply(
        params, padded, jnp.asarray(padded.lig_pos), jnp.asarray(0.5), so3, torus
    )
    np.testing.assert_allclose(np.asarray(out_p.tr), np.asarray(out.tr), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_p.rot), np.asarray(out.rot), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out_p.tor[: data.n_bonds]), np.asarray(out.tor), atol=2e-4
    )
    # padded bond slots emit exactly zero
    np.testing.assert_allclose(np.asarray(out_p.tor[data.n_bonds :]), 0.0)


def test_se3_equivariance(setup):
    """Rotating the whole complex rotates tr/rot vectors, keeps torsions."""
    cfg, model, data, so3, torus, params = setup
    rot = R.from_rotvec([0.3, -0.4, 0.7]).as_matrix().astype(np.float32)

    out = model.apply(params, data, data.lig_pos, jnp.asarray(0.5), so3, torus)

    data_rot = data._replace(
        rec_pos=jnp.asarray(np.asarray(data.rec_pos) @ rot.T),
        lig_pos=jnp.asarray(np.asarray(data.lig_pos) @ rot.T),
    )
    out_r = model.apply(
        params, data_rot, data_rot.lig_pos, jnp.asarray(0.5), so3, torus
    )

    np.testing.assert_allclose(
        np.asarray(out_r.tr), np.asarray(out.tr) @ rot.T, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_r.rot), np.asarray(out.rot) @ rot.T, atol=5e-3
    )
    np.testing.assert_allclose(np.asarray(out_r.tor), np.asarray(out.tor), atol=5e-3)


def test_receptor_cache_consistency(setup):
    cfg, model, data, so3, torus, params = setup
    cache = model.apply(params, data, method="embed_receptor")
    out_cached = model.apply(
        params, data, data.lig_pos, jnp.asarray(0.3), so3, torus, rec_cache=cache
    )
    out_direct = model.apply(
        params, data, data.lig_pos, jnp.asarray(0.3), so3, torus
    )
    np.testing.assert_allclose(
        np.asarray(out_cached.tr), np.asarray(out_direct.tr), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_cached.tor), np.asarray(out_direct.tor), atol=1e-5
    )


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_vmap_over_poses(setup):
    cfg, model, data, so3, torus, params = setup
    cache = model.apply(params, data, method="embed_receptor")
    P = 3
    rng = np.random.RandomState(3)
    poses = np.asarray(data.lig_pos)[None] + rng.randn(P, data.n_lig, 3).astype(
        np.float32
    )

    f = jax.vmap(
        lambda p: model.apply(
            params, data, p, jnp.asarray(0.5), so3, torus, rec_cache=cache
        )
    )
    batched = f(jnp.asarray(poses))
    for i in range(P):
        single = model.apply(
            params, data, jnp.asarray(poses[i]), jnp.asarray(0.5), so3, torus,
            rec_cache=cache,
        )
        np.testing.assert_allclose(
            np.asarray(batched.tr[i]), np.asarray(single.tr), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(batched.tor[i]), np.asarray(single.tor), atol=1e-4
        )


def test_confidence_mode(setup):
    _, _, data, so3, torus, _ = setup
    cfg = ScoreModelConfig(
        ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=1,
        confidence_mode=True, confidence_no_batchnorm=False,
    )
    model = CGScoreModel(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(1), data, data.lig_pos, jnp.asarray(0.0), so3, torus
    )
    out = model.apply(params, data, data.lig_pos, jnp.asarray(0.0), so3, torus)
    assert out.shape == (1,)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_smooth_edges_changes_outputs(setup):
    """smooth_edges applies the cosine ramp (reference cg_model.py:459-465):
    outputs differ from hard edges but remain finite; the ramp itself decays
    from 1 at distance 0 to 0 at max_norm."""
    import dataclasses

    cfg, model, data, so3, torus, params = setup
    model_s = CGScoreModel(dataclasses.replace(cfg, smooth_edges=True))
    w = model_s._edge_weight(jnp.asarray([0.0, 10.0, 20.0, 30.0]), 20.0)
    np.testing.assert_allclose(np.asarray(w), [1.0, 0.5, 0.0, 0.0], atol=1e-6)

    p = jax.jit(model_s.init)(
        jax.random.PRNGKey(0), data, data.lig_pos, jnp.asarray(0.5), so3, torus
    )
    out_s = jax.jit(
        lambda v, d: model_s.apply(v, d, d.lig_pos, jnp.asarray(0.5), so3, torus)
    )(p, data)
    assert np.isfinite(np.asarray(out_s.tr)).all()

    out_h = jax.jit(
        lambda v, d: model.apply(v, d, d.lig_pos, jnp.asarray(0.5), so3, torus)
    )(p, data)
    assert np.abs(np.asarray(out_s.tr) - np.asarray(out_h.tr)).max() > 1e-6


def test_atom_confidence_head(setup):
    """atom_confidence yields per-ligand-atom outputs alongside the pose
    confidence (reference aa_model.py:188-199,438-446)."""
    import dataclasses

    cfg, model, data, so3, torus, params = setup
    ccfg = dataclasses.replace(
        cfg, confidence_mode=True, atom_confidence=True,
        atom_num_confidence_outputs=1,
    )
    cmodel = CGScoreModel(ccfg)
    v = jax.jit(cmodel.init)(
        jax.random.PRNGKey(0), data, data.lig_pos, jnp.asarray(0.0), so3, torus
    )
    out, atom_conf = jax.jit(
        lambda vv, d: cmodel.apply(vv, d, d.lig_pos, jnp.asarray(0.0),
                                   so3, torus)
    )(v, data)
    assert out.shape == (1,)
    assert atom_conf.shape == (data.lig_pos.shape[0], 1)
    assert np.isfinite(np.asarray(atom_conf)).all()


def test_step_cache_equivalence(setup):
    """Forward with the pose-shared layer-0 rec<-rec precompute must equal
    the plain forward (it is an exact hoist, not an approximation)."""
    cfg, model, data, so3, torus, params = setup
    t = jnp.asarray(0.5)
    cache = model.apply(params, data, method="embed_receptor")
    sc = model.apply(params, data, t, cache, method="step_cache")
    assert sc is not None
    out_plain = model.apply(
        params, data, data.lig_pos, t, so3, torus, rec_cache=cache
    )
    out_sc = model.apply(
        params, data, data.lig_pos, t, so3, torus, rec_cache=cache,
        step_cache=sc,
    )
    np.testing.assert_allclose(
        np.asarray(out_sc.tr), np.asarray(out_plain.tr), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_sc.rot), np.asarray(out_plain.rot), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_sc.tor), np.asarray(out_plain.tor), rtol=1e-5, atol=1e-5
    )


def test_odd_parity_equivariance():
    """odd_parity=True restricts the heads to parity-consistent irreps
    (reference cg_model.py:223,244,251,377-378): under point inversion of
    the whole complex, tr (an odd vector) negates, rot (a pseudovector) is
    unchanged, and torsion scores (pseudoscalars) negate. The default
    two-of-each-parity heads intentionally break this symmetry."""
    cfg = ScoreModelConfig(
        ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=1, odd_parity=True
    )
    model = CGScoreModel(cfg)
    rng = np.random.RandomState(3)
    data = synthetic_complex(rng, n_lig=10, n_rec=24, n_bonds=2)
    so3 = get_so3_tables(SO3_SMALL)
    torus = get_torus_tables(TORUS_SMALL)
    t = jnp.asarray(0.5)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), data, data.lig_pos, t, so3, torus
    )
    out = model.apply(params, data, data.lig_pos, t, so3, torus)
    assert np.isfinite(np.asarray(out.tr)).all()

    data_inv = data._replace(
        rec_pos=-jnp.asarray(data.rec_pos),
        lig_pos=-jnp.asarray(data.lig_pos),
    )
    out_i = model.apply(
        params, data_inv, -jnp.asarray(data.lig_pos), t, so3, torus
    )
    np.testing.assert_allclose(
        np.asarray(out_i.tr), -np.asarray(out.tr), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_i.rot), np.asarray(out.rot), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_i.tor), -np.asarray(out.tor), atol=2e-4
    )


def test_odd_parity_old_architecture_raises():
    """The v1.0 architectures reject odd_parity with a typed ConfigError
    instead of a bare assert (VERDICT r2 ask #8)."""
    from diffdock_tpu.models.config import ConfigError
    from diffdock_tpu.models.old_models import OldCGScoreModel

    cfg = ScoreModelConfig(
        ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=1,
        odd_parity=True, old_architecture=True,
    )
    model = OldCGScoreModel(cfg)
    rng = np.random.RandomState(3)
    data = synthetic_complex(rng, n_lig=10, n_rec=24, n_bonds=2)
    so3 = get_so3_tables(SO3_SMALL)
    torus = get_torus_tables(TORUS_SMALL)
    with pytest.raises(ConfigError, match="odd_parity"):
        model.init(
            jax.random.PRNGKey(0), data, data.lig_pos, jnp.asarray(0.5),
            so3, torus,
        )
