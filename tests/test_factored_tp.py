"""Factored (reduce-before-weights) TP conv must equal the naive path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdock_tpu.data.complexes import synthetic_complex
from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
from diffdock_tpu.models.config import ScoreModelConfig
from diffdock_tpu.models.score_model import CGScoreModel
from diffdock_tpu.models.tpconv import NeighborBlock, TPConvLayer

SO3_SMALL = SO3Config(n_eps=64, x_n=256, l_max=512)
TORUS_SMALL = TorusConfig(x_n=256, sigma_n=128, mc_samples=2000)
RNG = np.random.RandomState(11)


def _random_block(n_send, n_recv, k, f_in, e_dim, sh_dim, with_weight=False):
    return NeighborBlock(
        sender_attr=jnp.asarray(RNG.randn(n_send, f_in).astype(np.float32)),
        nbr_idx=jnp.asarray(RNG.randint(0, n_send, (n_recv, k)).astype(np.int32)),
        nbr_mask=jnp.asarray(RNG.rand(n_recv, k) > 0.3),
        edge_attr=jnp.asarray(RNG.randn(n_recv, k, e_dim).astype(np.float32)),
        edge_sh=jnp.asarray(RNG.randn(n_recv, k, sh_dim).astype(np.float32)),
        edge_weight=(
            jnp.asarray(RNG.rand(n_recv, k).astype(np.float32))
            if with_weight else None
        ),
    )


@pytest.mark.parametrize("with_weight", [False, True])
def test_layer_factored_equals_naive(with_weight):
    in_irreps = "6x0e + 3x1o + 3x1e + 6x0o"
    from diffdock_tpu.ops.irreps import Irreps

    f_in = Irreps(in_irreps).dim
    kwargs = dict(
        in_irreps=in_irreps,
        sh_irreps="0e + 1o + 2e",
        out_irreps=in_irreps,
        n_edge_features=18,
        residual=True,
        batch_norm=True,
        shared_fc=False,
    )
    blocks = [
        _random_block(12, 10, 5, f_in, 18, 9, with_weight),
        _random_block(12, 10, 7, f_in, 18, 9, with_weight),
    ]
    recv = jnp.asarray(RNG.randn(10, f_in).astype(np.float32))
    mask = jnp.ones(10, bool)

    naive = TPConvLayer(factored=False, **kwargs)
    fact = TPConvLayer(factored=True, **kwargs)
    # identical param trees (factored shares the same FCBlock params)
    v = jax.jit(naive.init)(jax.random.PRNGKey(0), recv, blocks, mask)
    out_naive = naive.apply(v, recv, blocks, mask)
    out_fact = fact.apply(v, recv, blocks, mask)
    np.testing.assert_allclose(
        np.asarray(out_fact), np.asarray(out_naive), atol=2e-4
    )


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_full_model_factored_equals_naive():
    base = ScoreModelConfig(ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=1)
    rng = np.random.RandomState(5)
    data = jax.tree.map(
        jnp.asarray, synthetic_complex(rng, n_lig=10, n_rec=20, n_bonds=2)
    )
    so3 = get_so3_tables(SO3_SMALL)
    torus = get_torus_tables(TORUS_SMALL)
    t = jnp.asarray(0.5)

    model = CGScoreModel(base)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), data, data.lig_pos, t, so3, torus)
    out_f = model.apply(params, data, data.lig_pos, t, so3, torus)

    naive_model = CGScoreModel(dataclasses.replace(base, factored_tp=False))
    out_n = naive_model.apply(params, data, data.lig_pos, t, so3, torus)

    np.testing.assert_allclose(np.asarray(out_f.tr), np.asarray(out_n.tr), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_f.rot), np.asarray(out_n.rot), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_f.tor), np.asarray(out_n.tor), atol=2e-4)


def test_merged_equals_per_class():
    """The merged-class reduction layout must match the per-class loop."""
    from diffdock_tpu.models.encoders import FCBlock
    from diffdock_tpu.models.tpconv import _tp_message_reduced
    from diffdock_tpu.ops.irreps import Irreps
    from diffdock_tpu.ops.tensor_product import FullyConnectedTensorProduct

    in_irreps = "6x0e + 3x1o + 3x1e + 6x0o"
    sh = str(Irreps.spherical_harmonics(2))
    tp = FullyConnectedTensorProduct(in_irreps, sh, in_irreps)
    blk = _random_block(20, 14, 6, Irreps(in_irreps).dim, 8, Irreps(sh).dim,
                        with_weight=True)

    class Wrap:
        """FCBlock-compatible shim with fixed hidden/out params."""

        def __init__(self, rng, e_dim, hidden, out_dim):
            self.w1 = jnp.asarray(rng.randn(e_dim, hidden) * 0.3, jnp.float32)
            self.out_kernel = jnp.asarray(
                rng.randn(hidden, out_dim) * 0.1, jnp.float32
            )
            self.out_bias = jnp.asarray(rng.randn(out_dim) * 0.1, jnp.float32)

        def hidden(self, x, train=False):
            return jax.nn.relu(x @ self.w1)

    fc = Wrap(RNG, 8, 12, tp.weight_numel)
    out_m, cnt_m = _tp_message_reduced(tp, fc, blk, False, merged=True)
    out_c, cnt_c = _tp_message_reduced(tp, fc, blk, False, merged=False)
    np.testing.assert_allclose(np.asarray(cnt_m), np.asarray(cnt_c))
    np.testing.assert_allclose(
        np.asarray(out_m), np.asarray(out_c), rtol=2e-5, atol=2e-5
    )
