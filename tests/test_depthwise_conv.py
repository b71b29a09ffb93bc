"""Depthwise ('uvu') conv-layer wiring (reference TensorProductConvLayer
depthwise=True, tensor_layers.py:248-292): TP -> scatter-mean ->
IrrepsLinear -> BatchNorm, behind the model-level depthwise_convolution
flag. Primitive-level equivariance is covered in test_ops; here we test the
layer wiring and the full model."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from diffdock_tpu.data.complexes import synthetic_complex
from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
from diffdock_tpu.models.config import ScoreModelConfig
from diffdock_tpu.models.score_model import CGScoreModel
from diffdock_tpu.models.tpconv import NeighborBlock, TPConvLayer
from diffdock_tpu.ops.spherical import spherical_harmonics

SO3_SMALL = SO3Config(n_eps=64, x_n=256, l_max=512)
TORUS_SMALL = TorusConfig(x_n=256, sigma_n=128, mc_samples=2000)

IN_IRREPS = "8x0e + 2x1o + 2x1e"
OUT_IRREPS = "8x0e + 2x1o + 2x1e + 8x0o"
SH = "1x0e + 1x1o + 1x2e"


def _layer_case(depthwise):
    rng = np.random.RandomState(0)
    n, k = 10, 4
    from diffdock_tpu.ops.irreps import Irreps

    attr = rng.randn(n, Irreps(IN_IRREPS).dim).astype(np.float32)
    nbr = rng.randint(0, n, (n, k)).astype(np.int32)
    mask = rng.rand(n, k) > 0.3
    vec = rng.randn(n, k, 3).astype(np.float32)
    edge_attr = rng.randn(n, k, 12).astype(np.float32)
    layer = TPConvLayer(
        in_irreps=IN_IRREPS, sh_irreps=SH, out_irreps=OUT_IRREPS,
        n_edge_features=12, residual=True, batch_norm=True,
        depthwise=depthwise,
    )

    def build(v, a):
        return NeighborBlock(
            sender_attr=jnp.asarray(a), nbr_idx=jnp.asarray(nbr),
            nbr_mask=jnp.asarray(mask), edge_attr=jnp.asarray(edge_attr),
            edge_sh=spherical_harmonics(jnp.asarray(v), 2),
        )

    return layer, attr, vec, build


@pytest.mark.parametrize("depthwise", [False, True])
def test_layer_shapes_and_param_structure(depthwise):
    layer, attr, vec, build = _layer_case(depthwise)
    variables = jax.jit(layer.init)(
        jax.random.PRNGKey(0), jnp.asarray(attr), [build(vec, attr)],
        jnp.ones(attr.shape[0], bool),
    )
    out = layer.apply(
        variables, jnp.asarray(attr), [build(vec, attr)],
        jnp.ones(attr.shape[0], bool),
    )
    from diffdock_tpu.ops.irreps import Irreps

    assert out.shape == (attr.shape[0], Irreps(OUT_IRREPS).dim)
    assert np.isfinite(np.asarray(out)).all()
    assert ("linear_2" in variables["params"]) == depthwise


def test_depthwise_layer_equivariance():
    """Rotating edge vectors rotates the l=1 outputs (irrep basis) and
    leaves scalars unchanged — the full layer path incl. IrrepsLinear+BN."""
    from diffdock_tpu.ops.irreps import Irreps
    from diffdock_tpu.ops.wigner import real_wigner_3j  # noqa: F401 (cache)

    layer, attr, vec, build = _layer_case(True)
    n = attr.shape[0]
    # rotate node features too: build a block-diagonal Wigner-D for IN irreps
    rot = R.from_rotvec([0.3, -0.5, 0.2]).as_matrix().astype(np.float32)

    def sh_rot(v):
        # l=1 irrep components are (y, z, x): conjugate the rotation
        perm = np.array([1, 2, 0])  # ambient -> irrep slot order
        P = np.eye(3)[perm]
        return P @ rot @ P.T

    D1 = sh_rot(None).astype(np.float32)
    dims = []
    for e in Irreps(IN_IRREPS):
        for _ in range(e.mul):
            dims.append(e.ir.l)

    def rotate_features(x):
        out = np.array(x)
        off = 0
        for l in dims:
            d = 2 * l + 1
            if l == 1:
                out[..., off : off + 3] = x[..., off : off + 3] @ D1.T
            elif l == 2:
                # skip l=2 in IN irreps (none present)
                raise AssertionError
            off += d
        return out

    variables = jax.jit(layer.init)(
        jax.random.PRNGKey(1), jnp.asarray(attr), [build(vec, attr)],
        jnp.ones(n, bool),
    )
    out = np.asarray(
        layer.apply(variables, jnp.asarray(attr), [build(vec, attr)],
                    jnp.ones(n, bool))
    )
    attr_r = rotate_features(attr).astype(np.float32)
    vec_r = (vec.reshape(-1, 3) @ rot.T).reshape(vec.shape).astype(np.float32)
    out_r = np.asarray(
        layer.apply(variables, jnp.asarray(attr_r), [build(vec_r, attr_r)],
                    jnp.ones(n, bool))
    )
    # compare: rotate the original outputs
    off = 0
    for e in Irreps(OUT_IRREPS):
        for _ in range(e.mul):
            d = e.ir.dim
            a = out_r[:, off : off + d]
            b = out[:, off : off + d]
            if e.ir.l == 0:
                np.testing.assert_allclose(a, b, atol=2e-4)
            elif e.ir.l == 1:
                np.testing.assert_allclose(a, b @ D1.T, atol=2e-4)
            off += d


@pytest.mark.slow  # compile-heavy; a cheaper sibling covers this subsystem in the fast set
def test_cg_model_depthwise_end_to_end():
    so3 = get_so3_tables(SO3_SMALL)
    torus = get_torus_tables(TORUS_SMALL)
    cfg = ScoreModelConfig(
        ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=1,
        depthwise_convolution=True,
    )
    model = CGScoreModel(cfg)
    rng = np.random.RandomState(4)
    data = jax.tree.map(
        jnp.asarray, synthetic_complex(rng, n_lig=8, n_rec=16, n_bonds=2)
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), data, data.lig_pos, jnp.asarray(0.5), so3, torus
    )
    out = model.apply(params, data, data.lig_pos, jnp.asarray(0.5), so3, torus)
    assert out.tr.shape == (3,) and np.isfinite(np.asarray(out.tr)).all()

    rot = R.from_rotvec([0.2, 0.4, -0.3]).as_matrix().astype(np.float32)
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
        np.asarray(out_r.tor), np.asarray(out.tor), atol=5e-3
    )
