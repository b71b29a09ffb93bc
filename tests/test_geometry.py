"""Geometry/manifold core: golden tests vs scipy and reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from diffdock_tpu.geometry import (
    apply_torsion_updates,
    axis_angle_to_matrix,
    kabsch_align,
    kabsch_rotation,
    matrix_to_axis_angle,
    modify_conformer,
    random_rotation_matrix,
    rotatable_bond_mask,
)

RNG = np.random.RandomState(0)


def test_axis_angle_to_matrix_matches_scipy():
    vecs = RNG.randn(32, 3).astype(np.float32)
    ours = np.asarray(axis_angle_to_matrix(jnp.asarray(vecs)))
    ref = R.from_rotvec(vecs).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_axis_angle_small_angle_stable():
    vecs = np.array([[0.0, 0.0, 0.0], [1e-8, 0, 0], [0, 1e-7, 0]], np.float32)
    ours = np.asarray(axis_angle_to_matrix(jnp.asarray(vecs)))
    for m in ours:
        np.testing.assert_allclose(m, np.eye(3), atol=1e-5)


def test_matrix_to_axis_angle_roundtrip():
    vecs = RNG.randn(64, 3).astype(np.float32)
    # keep angles < pi so the representation is unique
    norms = np.linalg.norm(vecs, axis=-1, keepdims=True)
    vecs = vecs / norms * (norms % 3.0)
    mats = axis_angle_to_matrix(jnp.asarray(vecs))
    back = np.asarray(matrix_to_axis_angle(mats))
    ref = R.from_matrix(np.asarray(mats)).as_rotvec()
    np.testing.assert_allclose(back, ref, atol=1e-4)


def test_random_rotation_is_orthogonal():
    mats = np.asarray(random_rotation_matrix(jax.random.PRNGKey(0), (16,)))
    for m in mats:
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(m) > 0.99


def test_kabsch_recovers_known_transform():
    a = RNG.randn(20, 3).astype(np.float32)
    true_rot = R.from_rotvec([0.3, -0.5, 0.9]).as_matrix().astype(np.float32)
    true_t = np.array([1.0, -2.0, 0.5], np.float32)
    b = a @ true_rot.T + true_t
    rot, t = kabsch_rotation(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(rot), true_rot, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), true_t, atol=1e-4)


def test_kabsch_masked_ignores_padding():
    a = RNG.randn(24, 3).astype(np.float32)
    true_rot = R.from_rotvec([0.1, 0.2, -0.4]).as_matrix().astype(np.float32)
    b = a @ true_rot.T + np.array([0.5, 0.5, 0.5], np.float32)
    # corrupt the padded rows of b — they must not affect the fit
    mask = np.ones(24, bool)
    mask[20:] = False
    b_corrupt = b.copy()
    b_corrupt[20:] += 100.0
    aligned = np.asarray(
        kabsch_align(jnp.asarray(a), jnp.asarray(b_corrupt), mask=jnp.asarray(mask))
    )
    np.testing.assert_allclose(aligned[:20], b[:20], atol=1e-3)


def test_kabsch_never_reflects():
    # near-planar degenerate clouds tempt SVD solutions into reflections
    a = RNG.randn(10, 3).astype(np.float32)
    a[:, 2] *= 1e-4
    b = -a  # target is a reflection; best proper rotation must still be det +1
    rot, _ = kabsch_rotation(jnp.asarray(a), jnp.asarray(b))
    assert abs(float(jnp.linalg.det(rot)) - 1.0) < 1e-3


def _reference_torsion_apply(pos, edges, mask_rotate, updates):
    """Literal re-execution of the reference loop semantics in numpy
    (utils/torsion.py:48-72) used as golden."""
    pos = pos.copy()
    for idx, (u, v) in enumerate(edges):
        if updates[idx] == 0:
            continue
        rot_vec = pos[u] - pos[v]
        rot_vec = rot_vec * updates[idx] / np.linalg.norm(rot_vec)
        rot_mat = R.from_rotvec(rot_vec).as_matrix()
        pos[mask_rotate[idx]] = (pos[mask_rotate[idx]] - pos[v]) @ rot_mat.T + pos[v]
    return pos


def _butane_like():
    """A small chain molecule: 0-1-2-3-4 with a branch 2-5."""
    num_atoms = 6
    bonds = [(0, 1), (1, 2), (2, 3), (3, 4), (2, 5)]
    pos = np.array(
        [
            [0.0, 0.0, 0.0],
            [1.5, 0.0, 0.0],
            [2.2, 1.3, 0.0],
            [3.7, 1.3, 0.2],
            [4.4, 2.6, 0.1],
            [1.8, 2.0, 1.2],
        ],
        np.float32,
    )
    return num_atoms, bonds, pos


def test_rotatable_bond_mask_chain():
    num_atoms, bonds, _ = _butane_like()
    edge_mask, mask_rotate = rotatable_bond_mask(num_atoms, bonds)
    # directed edges: (0,1),(1,0),(1,2),(2,1),(2,3),(3,2),(3,4),(4,3),(2,5),(5,2)
    # rotatable: 1-2 (splits {0,1} | rest) and 2-3 (splits {3,4})
    assert edge_mask.sum() == 2
    directed = []
    for i, j in bonds:
        directed += [(i, j), (j, i)]
    marked = [directed[k] for k in np.flatnonzero(edge_mask)]
    for idx, (u, v) in enumerate(marked):
        assert not mask_rotate[idx, u]
        assert mask_rotate[idx, v]
    # smaller side moves
    assert mask_rotate.sum(1).tolist() == [2, 2]


def test_apply_torsion_matches_reference_semantics():
    num_atoms, bonds, pos = _butane_like()
    edge_mask, mask_rotate = rotatable_bond_mask(num_atoms, bonds)
    directed = []
    for i, j in bonds:
        directed += [(i, j), (j, i)]
    edges = np.array([directed[k] for k in np.flatnonzero(edge_mask)])
    updates = np.array([0.7, -1.3], np.float32)

    golden = _reference_torsion_apply(pos, edges, mask_rotate, updates)

    # padded device version: capacity 4 bonds
    cap = 4
    bu = np.zeros(cap, np.int32)
    bv = np.zeros(cap, np.int32)
    mr = np.zeros((cap, num_atoms), bool)
    upd = np.zeros(cap, np.float32)
    bm = np.zeros(cap, bool)
    bu[:2], bv[:2] = edges[:, 0], edges[:, 1]
    mr[:2] = mask_rotate
    upd[:2] = updates
    bm[:2] = True

    ours = np.asarray(
        apply_torsion_updates(
            jnp.asarray(pos), jnp.asarray(bu), jnp.asarray(bv), jnp.asarray(mr),
            jnp.asarray(upd), jnp.asarray(bm),
        )
    )
    np.testing.assert_allclose(ours, golden, atol=1e-4)


def test_modify_conformer_rigid_only_matches_reference_formula():
    _, _, pos = _butane_like()
    tr = np.array([1.0, 2.0, -0.5], np.float32)
    rotv = np.array([0.4, -0.2, 0.8], np.float32)
    ours = np.asarray(
        modify_conformer(jnp.asarray(pos), jnp.asarray(tr), jnp.asarray(rotv))
    )
    center = pos.mean(0, keepdims=True)
    rot = R.from_rotvec(rotv).as_matrix()
    golden = (pos - center) @ rot.T + tr + center
    np.testing.assert_allclose(ours, golden, atol=1e-4)


def test_modify_conformer_full_matches_reference_pipeline():
    num_atoms, bonds, pos = _butane_like()
    edge_mask, mask_rotate = rotatable_bond_mask(num_atoms, bonds)
    directed = []
    for i, j in bonds:
        directed += [(i, j), (j, i)]
    edges = np.array([directed[k] for k in np.flatnonzero(edge_mask)])
    updates = np.array([0.9, 0.3], np.float32)
    tr = np.array([0.5, -1.0, 2.0], np.float32)
    rotv = np.array([-0.3, 0.6, 0.1], np.float32)

    # golden: rigid move, torsion, then Kabsch align (diffusion_utils.py:35-57)
    center = pos.mean(0, keepdims=True)
    rot = R.from_rotvec(rotv).as_matrix()
    rigid = (pos - center) @ rot.T + tr + center
    flexible = _reference_torsion_apply(rigid, edges, mask_rotate, updates)
    # align flexible onto rigid with best proper rotation
    ca, cb = flexible.mean(0), rigid.mean(0)
    h = (flexible - ca).T @ (rigid - cb)
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    rr = vt.T @ np.diag([1, 1, d]) @ u.T
    golden = (flexible - ca) @ rr.T + cb

    ours = np.asarray(
        modify_conformer(
            jnp.asarray(pos), jnp.asarray(tr), jnp.asarray(rotv),
            jnp.asarray(updates), jnp.asarray(edges[:, 0]), jnp.asarray(edges[:, 1]),
            jnp.asarray(mask_rotate), jnp.asarray(np.ones(2, bool)),
        )
    )
    np.testing.assert_allclose(ours, golden, atol=2e-3)


def test_modify_conformer_vmaps_over_poses():
    num_atoms, bonds, pos = _butane_like()
    edge_mask, mask_rotate = rotatable_bond_mask(num_atoms, bonds)
    directed = []
    for i, j in bonds:
        directed += [(i, j), (j, i)]
    edges = np.array([directed[k] for k in np.flatnonzero(edge_mask)])

    P = 5
    poses = np.repeat(pos[None], P, 0) + RNG.randn(P, num_atoms, 3).astype(np.float32) * 0.01
    trs = RNG.randn(P, 3).astype(np.float32)
    rots = RNG.randn(P, 3).astype(np.float32) * 0.3
    tors = RNG.randn(P, 2).astype(np.float32)

    f = jax.vmap(
        lambda p, t, r, q: modify_conformer(
            p, t, r, q, jnp.asarray(edges[:, 0]), jnp.asarray(edges[:, 1]),
            jnp.asarray(mask_rotate), jnp.asarray(np.ones(2, bool)),
        )
    )
    out = np.asarray(f(jnp.asarray(poses), jnp.asarray(trs), jnp.asarray(rots), jnp.asarray(tors)))
    for i in range(P):
        single = np.asarray(
            modify_conformer(
                jnp.asarray(poses[i]), jnp.asarray(trs[i]), jnp.asarray(rots[i]),
                jnp.asarray(tors[i]), jnp.asarray(edges[:, 0]), jnp.asarray(edges[:, 1]),
                jnp.asarray(mask_rotate), jnp.asarray(np.ones(2, bool)),
            )
        )
        np.testing.assert_allclose(out[i], single, atol=1e-5)
