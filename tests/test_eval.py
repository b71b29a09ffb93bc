"""Evaluation plane: symmetry RMSD and metric table."""

import numpy as np

from diffdock_tpu.eval.metrics import compute_metric_table, min_self_distances
from diffdock_tpu.eval.rmsd import molecular_automorphisms, simple_rmsd, symmetry_rmsd


def test_benzene_symmetry_rmsd():
    """A rotated benzene ring must have ~0 symmetry-corrected RMSD even
    though plain RMSD is large."""
    n = 6
    ang = np.arange(n) * np.pi / 3
    ring = np.stack([np.cos(ang), np.sin(ang), np.zeros(n)], axis=1)
    elements = ["C"] * n
    bonds = [(i, (i + 1) % n) for i in range(n)]

    # rotate by one ring position (60 degrees) — a graph automorphism
    rot = np.array(
        [[np.cos(np.pi / 3), -np.sin(np.pi / 3), 0],
         [np.sin(np.pi / 3), np.cos(np.pi / 3), 0],
         [0, 0, 1]]
    )
    pose = ring @ rot.T

    plain = simple_rmsd(ring, pose)
    sym = symmetry_rmsd(ring, pose, elements, bonds)
    assert plain > 0.5
    assert sym < 1e-6

    perms = molecular_automorphisms(elements, bonds)
    assert len(perms) == 12  # dihedral group of the hexagon


def test_heteroatoms_restrict_automorphisms():
    # pyridine-like: one N breaks most symmetries
    n = 6
    ang = np.arange(n) * np.pi / 3
    ring = np.stack([np.cos(ang), np.sin(ang), np.zeros(n)], axis=1)
    elements = ["N"] + ["C"] * 5
    bonds = [(i, (i + 1) % n) for i in range(n)]
    perms = molecular_automorphisms(elements, bonds)
    assert len(perms) == 2  # identity + mirror through the N


def test_symmetry_rmsd_batched():
    n = 6
    ang = np.arange(n) * np.pi / 3
    ring = np.stack([np.cos(ang), np.sin(ang), np.zeros(n)], axis=1)
    poses = np.stack([ring, ring + 1.0])
    out = symmetry_rmsd(ring, poses, ["C"] * n, [(i, (i + 1) % n) for i in range(n)])
    assert out.shape == (2,)
    assert out[0] < 1e-6
    np.testing.assert_allclose(out[1], np.sqrt(3.0), atol=1e-5)


def test_metric_table():
    rmsds = np.array(
        [
            [1.0, 3.0, 8.0],  # top1 hit
            [4.0, 1.5, 9.0],  # top1 miss, min hit
            [6.0, 7.0, 8.0],  # all miss
        ]
    )
    t = compute_metric_table(rmsds)
    np.testing.assert_allclose(t["rmsds_below_2"], 100 / 3)
    np.testing.assert_allclose(t["rmsds_below_5"], 200 / 3)
    np.testing.assert_allclose(t["min_rmsds_below_2"], 200 / 3)
    assert "top5_rmsds_below_2" not in t  # only 3 poses


def test_min_self_distance():
    pose = np.array([[0, 0, 0], [1.5, 0, 0], [0.2, 0, 0]], float)
    bonds = [(0, 1, 1)]
    # atoms 0 and 2 are non-bonded and 0.2 apart
    np.testing.assert_allclose(min_self_distances(pose, bonds), 0.2, atol=1e-9)


def test_qcp_rmsd_matches_kabsch():
    import numpy as np

    from diffdock_tpu.eval.rmsd import qcp_rmsd

    rng = np.random.RandomState(0)
    a = rng.randn(20, 3)
    # random rotation + translation of a, plus small noise
    q = rng.randn(4); q /= np.linalg.norm(q)
    w, x, y, z = q
    R = np.array([
        [1-2*(y*y+z*z), 2*(x*y-z*w), 2*(x*z+y*w)],
        [2*(x*y+z*w), 1-2*(x*x+z*z), 2*(y*z-x*w)],
        [2*(x*z-y*w), 2*(y*z+x*w), 1-2*(x*x+y*y)],
    ])
    noise = rng.randn(20, 3) * 0.01
    b = (a + noise) @ R.T + np.array([5.0, -3.0, 2.0])
    # QCP min RMSD ~ noise scale, far below the raw displacement
    r = qcp_rmsd(a, b)
    assert r < 0.05
    # exact-superposition case: rmsd ~ 0
    assert qcp_rmsd(a, a @ R.T + 1.0) < 1e-6


def test_hungarian_rmsd_fixes_permutations():
    import numpy as np

    from diffdock_tpu.eval.rmsd import hungarian_rmsd, simple_rmsd

    rng = np.random.RandomState(1)
    a = rng.randn(12, 3) * 3
    elements = ["C"] * 6 + ["O"] * 6
    perm = np.concatenate([rng.permutation(6), 6 + rng.permutation(6)])
    b = a[perm]
    assert simple_rmsd(a, b) > 1.0
    assert hungarian_rmsd(a, b, elements) < 1e-9


def test_emit_metric_tables_no_rec_overlap(tmp_path):
    """Receptor-unseen split (reference evaluate.py:555-640): every metric
    is emitted twice, and the no_overlap_ arrays/columns cover only the
    names listed in the split file."""
    import pytest

    from diffdock_tpu.cli.evaluate import emit_metric_tables

    names = ["aaaa", "bbbb", "cccc"]
    rmsds = [[1.0, 3.0], [4.0, 6.0], [1.5, 2.5]]
    cents = [[0.5, 1.0], [2.0, 3.0], [0.7, 1.2]]
    # bbbb failed -> NaN runtime sentinel stays index-aligned (advisor r2)
    rts = [2.0, float("nan"), 4.0]
    confs = [[0.9, 0.1], [0.8, 0.2], [0.7, 0.3]]
    clash = [[1.0, 1.0], [0.2, 1.0], [1.0, 1.0]]
    split = tmp_path / "no_rec_overlap.txt"
    split.write_text("bbbb\ncccc\nzzzz\n")

    out = tmp_path / "eval"
    table = emit_metric_tables(
        str(out), names, rmsds, cents, rts, confs, clash, failures=1,
        no_rec_overlap_names=str(split),
    )
    # both columns present
    assert "rmsds_below_2" in table
    assert "no_overlap_rmsds_below_2" in table
    assert table["failures"] == 1
    # runtime stats exclude the NaN sentinel but arrays stay aligned
    assert table["run_times_mean"] == pytest.approx(3.0)
    rt_arr = np.load(out / "run_times.npy")
    nm_arr = np.load(out / "names.npy")
    assert len(rt_arr) == len(nm_arr) == 3
    # the split arrays cover exactly the overlap-free evaluated names
    sub_names = np.load(out / "no_overlap_names.npy")
    assert list(sub_names) == ["bbbb", "cccc"]
    sub_rmsds = np.load(out / "no_overlap_rmsds.npy")
    assert sub_rmsds.shape == (2, 2)
    # top-1 rmsd < 2 fraction: all = 2/3, no_overlap = 1/2
    assert table["rmsds_below_2"] == pytest.approx(100 * 2 / 3)
    assert table["no_overlap_rmsds_below_2"] == pytest.approx(50.0)
    # empty intersection -> split skipped, single column set
    split2 = tmp_path / "none.txt"
    split2.write_text("zzzz\n")
    t2 = emit_metric_tables(
        str(tmp_path / "eval2"), names, rmsds, cents, rts, confs, clash,
        failures=0, no_rec_overlap_names=str(split2),
    )
    assert not any(k.startswith("no_overlap_") for k in t2)
