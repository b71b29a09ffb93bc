"""Stacking mixed molecules: data-dependent widths must normalize.

Ligand bonded-neighbor width (max bond degree), receptor kNN width
(k = min(cap, n-1)), and atom kNN width are all data-dependent, so
batching complexes from different molecules requires normalizing those
column counts before jnp.stack (the bug fixed in loaders._stack /
dock_batch / confidence_train phase-2; commit 26a1a37 and round-3
review follow-ups).
"""

import numpy as np

from diffdock_tpu.data.complexes import (
    bucket_sizes,
    pad_aa_to,
    pad_to,
    synthetic_aa_complex,
    synthetic_complex,
)


def _stacked_shapes_equal(trees):
    """Every array field must have identical shape across tree members."""
    import jax

    leaves = [jax.tree_util.tree_leaves(t) for t in trees]
    for field_vals in zip(*leaves):
        shapes = {np.asarray(v).shape for v in field_vals}
        assert len(shapes) == 1, f"ragged field shapes: {shapes}"


def test_pad_to_normalizes_widths_across_complexes():
    rng = np.random.RandomState(0)
    # different receptor sizes below the kNN cap + 1 give different
    # rec_nbr widths; k = min(10, n-1)
    small = synthetic_complex(rng, n_lig=6, n_rec=5, n_bonds=2)
    big = synthetic_complex(rng, n_lig=20, n_rec=40, n_bonds=5)
    assert small.rec_nbr.shape[1] != big.rec_nbr.shape[1]

    members = [small, big]
    nl, nr, nb = (
        max(bucket_sizes(d.n_lig, d.n_rec, d.n_bonds)[k] for d in members)
        for k in range(3)
    )
    kb = max(4, *(d.lig_bond_nbr.shape[1] for d in members))
    kr = max(d.rec_nbr.shape[1] for d in members)
    padded = [pad_to(d, nl, nr, nb, kb=kb, kr=kr) for d in members]
    _stacked_shapes_equal(padded)


def test_pad_aa_to_normalizes_widths_across_complexes():
    rng = np.random.RandomState(1)
    # k_atom differences mimic tiny structures where k = n_atoms - 1
    a = synthetic_aa_complex(rng, n_lig=6, n_rec=5, n_bonds=2,
                             atoms_per_res=3, k_atom=4)
    b = synthetic_aa_complex(rng, n_lig=16, n_rec=24, n_bonds=4,
                             atoms_per_res=4, k_atom=6)
    assert a.atom_nbr.shape[1] != b.atom_nbr.shape[1]
    assert a.base.rec_nbr.shape[1] != b.base.rec_nbr.shape[1]

    members = [a, b]
    bases = [m.base for m in members]
    nl, nr, nb = (
        max(bucket_sizes(d.n_lig, d.n_rec, d.n_bonds)[k] for d in bases)
        for k in range(3)
    )
    na = max(((m.n_atoms + 255) // 256) * 256 for m in members)
    kb = max(4, *(d.lig_bond_nbr.shape[1] for d in bases))
    kr = max(d.rec_nbr.shape[1] for d in bases)
    ka = max(np.asarray(m.atom_nbr).shape[1] for m in members)
    ar = max(np.asarray(m.res_atom_idx).shape[1] for m in members)
    padded = [
        pad_aa_to(m, nl, nr, nb, na, kb=kb, kr=kr, ka=ka, ar=ar)
        for m in members
    ]
    _stacked_shapes_equal(padded)
    # padded columns are masked off
    pa = padded[0]
    assert not np.asarray(pa.atom_nbr_mask)[:, a.atom_nbr.shape[1]:].any()
    assert not np.asarray(pa.base.lig_bond_mask)[
        :, a.base.lig_bond_nbr.shape[1]:
    ].any()
