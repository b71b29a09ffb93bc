"""Sidechain/backbone auxiliary losses (reference utils/training.py:61-124)
and the sidechain prediction head (cg_model.py:173-179,397-402).

Covers: golden-formula agreement with a direct NumPy transcription of the
reference loss, gradient flow gated by the weights, NaN-chi masking, the
rec_scv data plumbing, and equivariance of the head's vector outputs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from diffdock_tpu.data.complexes import pad_to, synthetic_complex
from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
from diffdock_tpu.models.config import ScoreModelConfig
from diffdock_tpu.models.score_model import CGScoreModel
from diffdock_tpu.train.losses import aux_sidechain_parts
from diffdock_tpu.train.trainer import (
    TrainConfig,
    create_train_state,
    make_train_step,
    training_model_config,
)

SO3_SMALL = SO3Config(n_eps=64, x_n=256, l_max=512)
TORUS_SMALL = TorusConfig(x_n=256, sigma_n=128, mc_samples=2000)


def reference_aux_losses(sidechain_pred, scv, mask):
    """Direct NumPy transcription of utils/training.py:61-124
    (apply_mean=True, one-graph batch == masked residue means)."""
    m = mask.astype(bool)
    pred = np.asarray(sidechain_pred)[m]
    scv = np.asarray(scv)[m]

    vecs = scv[:, 4:]
    bb_base = (vecs**2).mean(axis=1) + 1e-4
    bb_loss = ((pred[:, 4:] - vecs) ** 2).mean(axis=1) / bb_base.mean()
    bb_loss = bb_loss.mean()

    chi = scv[:, :4]
    cp = np.where(np.isnan(chi), 0.0, pred[:, :4])
    chi = np.where(np.isnan(chi), 0.0, chi)
    diff = np.abs(cp - chi)
    diff = np.minimum(diff, 1 - diff)
    sc_base = (chi**2).mean(axis=1) + 1e-4
    sc_loss = (diff**2).mean(axis=1) / sc_base.mean()
    return bb_loss, sc_loss.mean()


def test_aux_parts_match_reference_formula():
    rng = np.random.RandomState(0)
    nr = 24
    scv = rng.randn(nr, 10).astype(np.float32)
    scv[:, :4] = rng.rand(nr, 4)  # chi in [0, 1)
    scv[3, 1] = np.nan  # undefined chi
    scv[7, :4] = np.nan  # GLY/ALA row
    pred = rng.randn(nr, 10).astype(np.float32)
    mask = np.ones(nr, bool)
    mask[-4:] = False  # padded residues

    parts = aux_sidechain_parts(
        jnp.asarray(pred), jnp.asarray(scv), jnp.asarray(mask)
    )
    got_bb = float(parts["bb_sq_sum"] / parts["bb_base_sum"])
    got_sc = float(parts["sc_sq_sum"] / parts["sc_base_sum"])
    exp_bb, exp_sc = reference_aux_losses(pred, scv, mask)
    np.testing.assert_allclose(got_bb, exp_bb, rtol=1e-5)
    np.testing.assert_allclose(got_sc, exp_sc, rtol=1e-5)


@pytest.fixture(scope="module")
def train_setup():
    so3 = get_so3_tables(SO3_SMALL)
    torus = get_torus_tables(TORUS_SMALL)
    cfg = training_model_config(
        ScoreModelConfig(ns=8, nv=2, num_conv_layers=2, sidechain_pred=True),
        data_parallel=False,
    )
    model = CGScoreModel(cfg)
    rng = np.random.RandomState(1)
    raw = synthetic_complex(rng, n_lig=8, n_rec=16, n_bonds=2)
    scv = rng.randn(16, 10).astype(np.float32)
    scv[:, :4] = rng.rand(16, 4)
    scv[0, 2] = np.nan
    raw = raw._replace(rec_scv=scv)
    data = jax.tree.map(jnp.asarray, pad_to(raw, 8, 24, 2))
    batch = jax.tree.map(lambda x: jnp.stack([x, x]), data)
    return model, data, batch, so3, torus


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_sidechain_head_output_and_equivariance(train_setup):
    model, data, _, so3, torus = train_setup
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), data, data.lig_pos, jnp.asarray(0.5), so3, torus
    )
    out = model.apply(params, data, data.lig_pos, jnp.asarray(0.5), so3, torus)
    assert out.sidechain is not None
    assert out.sidechain.shape == (data.rec_pos.shape[0], 10)

    rot = R.from_rotvec([0.3, -0.4, 0.2]).as_matrix().astype(np.float32)
    data_r = data._replace(
        rec_pos=jnp.asarray(np.asarray(data.rec_pos) @ rot.T),
        lig_pos=jnp.asarray(np.asarray(data.lig_pos) @ rot.T),
    )
    out_r = model.apply(
        params, data_r, data_r.lig_pos, jnp.asarray(0.5), so3, torus
    )
    # chi components are scalars; the vector slots live in the irrep
    # (y, z, x) basis (like the reference's raw o3.Linear output, which is
    # compared against xyz targets without a basis change — reproduced
    # verbatim), so they rotate after permuting to ambient axes
    np.testing.assert_allclose(
        np.asarray(out_r.sidechain[:, :4]),
        np.asarray(out.sidechain[:, :4]), atol=5e-3,
    )
    to_ambient = [2, 0, 1]  # (y, z, x) -> (x, y, z)
    for sl in (slice(4, 7), slice(7, 10)):
        amb = np.asarray(out.sidechain[:, sl])[:, to_ambient]
        amb_r = np.asarray(out_r.sidechain[:, sl])[:, to_ambient]
        np.testing.assert_allclose(amb_r, amb @ rot.T, atol=5e-3)


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_nonzero_weight_changes_gradients(train_setup):
    model, data, batch, so3, torus = train_setup

    def step_metrics(bw, sw):
        tc = TrainConfig(backbone_weight=bw, sidechain_weight=sw)
        state = create_train_state(
            model, data, so3, torus, tc, jax.random.PRNGKey(0)
        )
        step = jax.jit(make_train_step(model, tc, so3, torus))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        delta = jax.tree_util.tree_reduce(
            lambda a, x: a + float(jnp.abs(x).sum()),
            jax.tree.map(
                lambda a, b: a - b,
                new_state.params["sidechain_predictor"],
                state.params["sidechain_predictor"],
            ),
            0.0,
        )
        return metrics, delta

    m0, d0 = step_metrics(0.0, 0.0)
    m1, d1 = step_metrics(0.5, 0.5)
    assert "backbone_loss" in m1 and "sidechain_loss" in m1
    assert np.isfinite(float(m1["loss"]))
    # without aux weights the head receives no gradient; with them it moves
    assert d0 < 1e-12
    assert d1 > 1e-8
    assert "backbone_loss" not in m0


def test_featurize_produces_rec_scv():
    from diffdock_tpu.data.chem import read_pdb_file
    from diffdock_tpu.data.chem import read_molecule_file
    from diffdock_tpu.data.featurize import build_complex_data

    mol = read_molecule_file("/root/reference/examples/6moa_ligand.sdf")
    protein = read_pdb_file("/root/reference/examples/6moa_protein_processed.pdb")
    data, _ = build_complex_data(mol, protein)
    assert data.rec_scv is not None
    assert data.rec_scv.shape == (data.n_rec, 10)
    chi = data.rec_scv[:, :4]
    # some chis defined, some NaN (GLY/ALA and chi3/4 of most residues)
    assert np.isnan(chi).any() and np.isfinite(chi).any()
    finite = chi[np.isfinite(chi)]
    assert (finite >= 0).all() and (finite <= 1).all()
    # padding keeps the field
    padded = pad_to(data, data.n_lig + 8, data.n_rec + 64, data.n_bonds + 2)
    assert padded.rec_scv.shape[0] == data.n_rec + 64
