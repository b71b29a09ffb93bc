"""Gen-3 Pallas fused factored-TP kernel vs the einsum reference path.

The gen-3 kernel (`ops/pallas_tpconv3.py`) is the measured-on-chip
experiment that beats the per-class XLA path on receptor blocks (PERF.md);
it is not the default call path, so this parity test (values + grads vs
its own `_forward_xla`, which equals the tpconv factored contraction) is
what keeps it from silently rotting (ADVICE r2 #5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdock_tpu.ops.pallas_tpconv3 import _forward_xla, make_fused_tp_messages
from diffdock_tpu.ops.tensor_product import FullyConnectedTensorProduct

IN_IR = "8x0e + 4x1o + 4x1e + 4x0o"
SH_IR = "1x0e + 1x1o + 1x2e"
OUT_IR = "8x0e + 4x1o + 4x1e + 4x0o"


def _inputs(tp, n, k, h_dim, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, k, tp.irreps_in1.dim), jnp.float32)
    sh = jnp.asarray(rng.randn(n, k, tp.irreps_in2.dim), jnp.float32)
    mw = jnp.asarray((rng.rand(n, k) > 0.3), jnp.float32)
    h = jnp.asarray(rng.randn(n, k, h_dim), jnp.float32) * mw[..., None]
    wk = jnp.asarray(rng.randn(h_dim, tp.weight_numel) * 0.1, jnp.float32)
    wb = jnp.asarray(rng.randn(tp.weight_numel) * 0.1, jnp.float32)
    return x, sh, h, mw, wk, wb


@pytest.mark.parametrize("n,k", [(16, 8), (37, 8)])
def test_gen3_matches_xla_reference(n, k):
    tp = FullyConnectedTensorProduct(IN_IR, SH_IR, OUT_IR)
    args = _inputs(tp, n, k, h_dim=24)
    ref = _forward_xla(tp, *args)
    f = make_fused_tp_messages(tp, interpret=True, block_rows=16)
    out = f(*args)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_gen3_block_rows_invariance():
    tp = FullyConnectedTensorProduct(IN_IR, SH_IR, OUT_IR)
    args = _inputs(tp, 10, 4, h_dim=16, seed=1)
    f8 = make_fused_tp_messages(tp, interpret=True, block_rows=8)
    f16 = make_fused_tp_messages(tp, interpret=True, block_rows=16)
    np.testing.assert_allclose(np.asarray(f8(*args)), np.asarray(f16(*args)),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_gen3_gradients_flow():
    """custom_vjp backward (XLA-path gradients) matches direct XLA grads."""
    tp = FullyConnectedTensorProduct(IN_IR, SH_IR, OUT_IR)
    args = _inputs(tp, 8, 4, h_dim=16, seed=2)
    f = make_fused_tp_messages(tp, interpret=True, block_rows=8)

    g_kernel = jax.grad(lambda *a: jnp.sum(f(*a) ** 2), argnums=(2, 4))(*args)
    g_ref = jax.grad(
        lambda *a: jnp.sum(_forward_xla(tp, *a) ** 2), argnums=(2, 4)
    )(*args)
    for a, b in zip(g_kernel, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
