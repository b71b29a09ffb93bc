"""Native C++ data-plane kernels vs the pure-python fallbacks."""

import numpy as np
import pytest

from diffdock_tpu import native

pytestmark = pytest.mark.skipif(
    not native.have_native(), reason="native library not built"
)


def test_knn_parity_with_numpy():
    from diffdock_tpu.data.complexes import build_knn_neighbors

    rng = np.random.RandomState(1)
    pos = rng.randn(300, 3).astype(np.float32) * 15
    idx_n, mask_n = native.knn_graph_native(pos, 7)

    # reference numpy implementation (bypass the native fast path)
    n = pos.shape[0]
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    idx_p = np.argsort(d, axis=1)[:, :7]
    for i in range(n):
        assert set(idx_n[i][mask_n[i]]) == set(idx_p[i])


def test_knn_radius_cap():
    rng = np.random.RandomState(2)
    pos = rng.randn(100, 3).astype(np.float32) * 30
    idx, mask = native.knn_graph_native(pos, 10, max_radius=10.0)
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    for i in range(100):
        for s in range(10):
            if mask[i, s] and s > 0:
                assert d[i, idx[i, s]] <= 10.0 + 1e-4
    # keep-nearest fallback: no node is isolated, column 0 is the nearest
    # neighbor even beyond the cutoff (reference process_mols.py:184-188)
    assert mask[:, 0].all()
    np.fill_diagonal(d, np.inf)
    np.testing.assert_array_equal(idx[:, 0], np.argmin(d, axis=1))


def test_knn_cross():
    rng = np.random.RandomState(3)
    q = rng.randn(40, 3).astype(np.float32) * 10
    r = rng.randn(200, 3).astype(np.float32) * 10
    idx, mask = native.knn_cross_native(q, r, 5)
    d = np.linalg.norm(q[:, None] - r[None, :], axis=-1)
    gold = np.argsort(d, axis=1)[:, :5]
    for i in range(40):
        assert set(idx[i][mask[i]]) == set(gold[i])


def test_sdf_parse_parity():
    from diffdock_tpu.data.chem import Molecule, parse_sdf, write_sdf

    mol = Molecule(
        elements=["C", "N", "O"],
        coords=np.array([[0, 0, 0], [1.4, 0, 0], [2.1, 1.1, 0]], np.float32),
        bonds=[(0, 1, 1), (1, 2, 2)],
        charges=[0, 1, -1],
        name="t",
    )
    text = write_sdf(mol)
    out = native.sdf_parse_first_native(text)
    assert out is not None
    coords, els, bonds, charges = out
    assert els == mol.elements
    np.testing.assert_allclose(coords, mol.coords, atol=1e-4)
    assert [(a, b, o) for a, b, o in bonds.tolist()] == mol.bonds
    assert charges.tolist() == mol.charges
