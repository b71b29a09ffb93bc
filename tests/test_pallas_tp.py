"""Pallas fused factored-TP kernel vs the einsum reference path."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdock_tpu.ops.pallas_tpconv import factored_tp_messages_pallas
from diffdock_tpu.ops.tensor_product import FullyConnectedTensorProduct

IN_IR = "8x0e + 4x1o + 4x1e + 4x0o"
SH_IR = "1x0e + 1x1o + 1x2e"
OUT_IR = "8x0e + 4x1o + 4x1e + 4x0o"


def einsum_reference(tp, x_nbr, edge_sh, h, mw, out_kernel, out_bias):
    """The merged-layout einsum reduction (models/tpconv.py semantics)."""
    outs = []
    H = h.shape[-1]
    for k, ((offset, fan, mul), ek) in enumerate(
        zip(tp.weight_slices(), tp.irreps_out)
    ):
        d3 = ek.ir.dim
        C = tp.coupled_class_merged(k, x_nbr, edge_sh)
        p_h = jnp.einsum("rkh,rkF->rhF", h, C)
        p_b = jnp.einsum("rk,rkF->rF", mw, C)
        t_k = out_kernel[:, offset : offset + fan * mul].reshape(H, fan, mul)
        b_k = out_bias[offset : offset + fan * mul].reshape(fan, mul)
        tt = tp.expand_weight_identity(t_k, d3)
        bb = tp.expand_bias_identity(b_k, d3)
        out_k = (
            p_h.reshape(p_h.shape[0], H * fan * d3) @ tt + p_b @ bb
        ) / math.sqrt(fan)
        outs.append(out_k)
    return jnp.concatenate(outs, axis=-1)


@pytest.mark.parametrize("n,k", [(16, 8), (37, 8)])
def test_pallas_matches_einsum(n, k):
    tp = FullyConnectedTensorProduct(IN_IR, SH_IR, OUT_IR)
    rng = np.random.RandomState(0)
    H = 24
    x = jnp.asarray(rng.randn(n, k, tp.irreps_in1.dim), jnp.float32)
    sh = jnp.asarray(rng.randn(n, k, tp.irreps_in2.dim), jnp.float32)
    h = jnp.asarray(rng.randn(n, k, H), jnp.float32)
    mw = jnp.asarray((rng.rand(n, k) > 0.3), jnp.float32)
    h = h * mw[..., None]
    wk = jnp.asarray(rng.randn(H, tp.weight_numel) * 0.1, jnp.float32)
    wb = jnp.asarray(rng.randn(tp.weight_numel) * 0.1, jnp.float32)

    ref = einsum_reference(tp, x, sh, h, mw, wk, wb)
    out = factored_tp_messages_pallas(
        tp, x, sh, h, mw, wk, wb, block_rows=16, interpret=True
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_padding_rows_ignored():
    """N not divisible by block_rows: padded rows must not affect output."""
    tp = FullyConnectedTensorProduct(IN_IR, SH_IR, OUT_IR)
    rng = np.random.RandomState(1)
    H, n, k = 16, 10, 4
    x = jnp.asarray(rng.randn(n, k, tp.irreps_in1.dim), jnp.float32)
    sh = jnp.asarray(rng.randn(n, k, tp.irreps_in2.dim), jnp.float32)
    h = jnp.asarray(rng.randn(n, k, H), jnp.float32)
    mw = jnp.ones((n, k), jnp.float32)
    wk = jnp.asarray(rng.randn(H, tp.weight_numel) * 0.1, jnp.float32)
    wb = jnp.asarray(rng.randn(tp.weight_numel) * 0.1, jnp.float32)
    out_a = factored_tp_messages_pallas(
        tp, x, sh, h, mw, wk, wb, block_rows=8, interpret=True
    )
    out_b = factored_tp_messages_pallas(
        tp, x, sh, h, mw, wk, wb, block_rows=16, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_a), np.asarray(out_b), rtol=1e-5, atol=1e-5
    )
