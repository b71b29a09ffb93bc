"""Chi angles and side-chain vectors vs the reference's inline self-check."""

import numpy as np

from diffdock_tpu.data.chem import read_pdb_file
from diffdock_tpu.data.chi import (
    MAX_CHI,
    dihedral,
    residue_chi_angles,
    side_chain_vecs,
)

EXAMPLE_PDB = "/root/reference/examples/6w70.pdb"


def test_dihedral_right_angles():
    # planar cis: 0 degrees; trans: 180
    p = [(0, 1, 0), (0, 0, 0), (1, 0, 0), (1, 1, 0)]
    assert abs(dihedral(*p) - 0.0) < 1e-6 or abs(dihedral(*p) - 360) < 1e-6
    p180 = [(0, 1, 0), (0, 0, 0), (1, 0, 0), (1, -1, 0)]
    assert abs(dihedral(*p180) - 180.0) < 1e-6
    p90 = [(0, 1, 0), (0, 0, 0), (1, 0, 0), (1, 0, 1)]
    assert abs(dihedral(*p90) % 360 - 90.0) < 1e-6 or \
        abs(dihedral(*p90) % 360 - 270.0) < 1e-6


def test_first_residue_chi1_matches_reference_selfcheck():
    """The reference asserts 55 < chi1(residue 0, chain A) < 56 for 6w70
    (``datasets/parse_chi.py:126-133``)."""
    protein = read_pdb_file(EXAMPLE_PDB)
    res0 = protein.residues_with_ca()[0]
    angles, mask = residue_chi_angles(res0)
    assert mask[0]
    assert 55.0 < angles[0] < 56.0, angles


def test_side_chain_vecs_shape_and_backbone():
    protein = read_pdb_file(EXAMPLE_PDB)
    scv = side_chain_vecs(protein)
    n = len(protein.residues_with_ca())
    assert scv.shape == (n, 10)
    # defined chi components normalized to [0, 1); undefined ones are NaN
    # (reference utils/training.py:95-97 masks them by isnan in the aux loss)
    chi = scv[:, :MAX_CHI]
    defined = np.isfinite(chi)
    assert defined[:, 0].any() and not defined.all()
    assert (chi[defined] >= 0).all() and (chi[defined] < 1).all()
    # N-CA distances are ~1.46 A
    n_rel = np.linalg.norm(scv[:, 4:7], axis=1)
    valid = n_rel > 0
    assert np.abs(n_rel[valid].mean() - 1.46) < 0.1
