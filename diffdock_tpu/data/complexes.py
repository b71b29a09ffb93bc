"""The static padded complex schema — the TPU replacement for PyG HeteroData.

One ``ComplexData`` holds a single protein-ligand complex as fixed-shape
arrays with validity masks. The design rules:

* all shapes are static per (ligand, receptor, bond) bucket, so one jit
  compilation serves every complex in a bucket;
* the ONLY pose-dependent array is the ligand position — pose replicas are a
  ``vmap`` axis, not a flattened mega-graph (reference batching flattens N
  replicas into one PyG Batch, ``utils/sampling.py:80-93``);
* edges live as dense receiver-major neighbor structures: bonded neighbor
  lists (static), kNN receptor lists (static, precomputed like reference
  ``datasets/process_mols.py:172``), and all-pairs masks for the
  distance-dependent graphs rebuilt each diffusion step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ComplexData(NamedTuple):
    """All arrays are jnp/np; a valid pytree for jit/vmap/shard_map."""

    # --- ligand (static across poses/steps) ---
    lig_cat: jnp.ndarray  # (NL, 16) int32 categorical features
    lig_mask: jnp.ndarray  # (NL,) bool
    lig_pos: jnp.ndarray  # (NL, 3) f32 reference pose (receptor-centered)
    lig_bond_nbr: jnp.ndarray  # (NL, KB) int32 bonded neighbor indices
    lig_bond_mask: jnp.ndarray  # (NL, KB) bool
    lig_bond_attr: jnp.ndarray  # (NL, KB, 4) f32 bond-type one-hot

    # --- rotatable bonds ---
    rot_u: jnp.ndarray  # (B,) int32 fixed-side atom
    rot_v: jnp.ndarray  # (B,) int32 rotated-side atom
    rot_mask: jnp.ndarray  # (B,) bool
    mask_rotate: jnp.ndarray  # (B, NL) bool

    # --- receptor (fully static) ---
    rec_cat: jnp.ndarray  # (NR, 1) int32 residue identity
    rec_lm: jnp.ndarray  # (NR, LM) f32 language-model embedding (LM may be 0)
    rec_mask: jnp.ndarray  # (NR,) bool
    rec_pos: jnp.ndarray  # (NR, 3) f32 C-alpha coords (receptor-centered)
    rec_nbr: jnp.ndarray  # (NR, KR) int32 precomputed kNN neighbors
    rec_nbr_mask: jnp.ndarray  # (NR, KR) bool

    # --- bookkeeping ---
    original_center: jnp.ndarray  # (3,) f32 receptor centroid in input frame

    # --- optional training targets ---
    # (NR, 10) [chi/360 (NaN where undefined), N-CA, C-CA] per residue for
    # the sidechain/backbone auxiliary losses (reference side_chain_vecs,
    # process_mols.py:163-165 + utils/training.py:61-124); None when the
    # data source does not provide it
    rec_scv: Optional[jnp.ndarray] = None

    @property
    def n_lig(self) -> int:
        return self.lig_cat.shape[0]

    @property
    def n_rec(self) -> int:
        return self.rec_cat.shape[0]

    @property
    def n_bonds(self) -> int:
        return self.rot_u.shape[0]


class AAComplexData(NamedTuple):
    """All-atom complex: the coarse-grained schema plus receptor heavy atoms
    (the reference's third node type 'atom', ``models/aa_model.py``)."""

    base: ComplexData
    atom_cat: jnp.ndarray  # (NA, 4) int32 (aa, atomic_num, type2, type3)
    atom_mask: jnp.ndarray  # (NA,) bool
    atom_pos: jnp.ndarray  # (NA, 3) f32 (receptor-centered)
    atom_nbr: jnp.ndarray  # (NA, KA) int32 atom-atom kNN
    atom_nbr_mask: jnp.ndarray  # (NA, KA) bool
    atom_res: jnp.ndarray  # (NA,) int32 parent residue index
    res_atom_idx: jnp.ndarray  # (NR, KRA) int32 atoms of each residue
    res_atom_mask: jnp.ndarray  # (NR, KRA) bool

    @property
    def n_atoms(self) -> int:
        return self.atom_cat.shape[0]


def pad_aa_to(
    data: AAComplexData, nl: int, nr: int, nb: int, na: int,
    kb: int = 4, kr: int = 0, ka: Optional[int] = None,
    ar: Optional[int] = None,
) -> AAComplexData:
    """Pad an AAComplexData to bucket sizes.

    ``kb``/``kr`` normalize the base tree's data-dependent widths (see
    :func:`pad_to`); ``ka`` normalizes the atom-kNN column count (tiny
    structures get k = n-1 < atom_max_neighbors) and ``ar`` the
    atoms-per-residue column count, so AA trees from different complexes
    stack into one batch.
    """

    def pad(a, rows, fill=0, cols=None):
        a = np.asarray(a)
        width = [(0, rows - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        if cols is not None:
            width[1] = (0, max(cols, a.shape[1]) - a.shape[1])
        return np.pad(a, width, constant_values=fill)

    base = pad_to(data.base, nl, nr, nb, kb=kb, kr=kr)
    return AAComplexData(
        base=base,
        atom_cat=pad(data.atom_cat, na),
        atom_mask=pad(data.atom_mask, na, False),
        atom_pos=pad(data.atom_pos, na),
        atom_nbr=pad(data.atom_nbr, na, cols=ka),
        atom_nbr_mask=pad(data.atom_nbr_mask, na, False, cols=ka),
        atom_res=pad(data.atom_res, na),
        res_atom_idx=pad(data.res_atom_idx, nr, cols=ar),
        res_atom_mask=pad(data.res_atom_mask, nr, False, cols=ar),
    )


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


# Geometric bucket ladders (ratio ~1.4-1.5). Linear quanta produced one
# compiled program per complex on realistic size mixes (bench.py --churn
# measured 23 buckets for 24 complexes at lig/16 rec/64); with minutes-long
# TPU compiles that dominates an eval sweep. A geometric ladder caps padding
# waste at ~2x FLOPs worst-case on the cross blocks while collapsing a
# PDBBind-like mix into ~a dozen programs (each a one-time cost under the
# persistent compilation cache). Receptor rungs stop at 3072: the reference
# rejects receptors >3000 residues (datasets/process_mols.py:169-170).
LIG_BUCKETS = (16, 24, 32, 48, 64, 96, 128, 192, 256)
REC_BUCKETS = (64, 128, 192, 320, 448, 704, 1024, 1536, 2304, 3072)
BOND_BUCKETS = (8, 16, 32, 64, 128)

# Dense (~1.2x-spaced) rungs for warmed services: per-pose cost is linear
# in the padded NL*NR cross-block area (PERF.md "Scaling in receptor
# size"), so a finer grid converts padding directly into throughput
# (x1.56 -> x1.29 mean padding on the PDBBind-like mix, modeled +21%).
# The trade is program count (~85 vs ~38 programs for a 150-complex
# sweep) — one-time prewarm + persistent-cache disk, irrelevant once
# warm. Used by DockingPipeline(bucket_ladder="fine_dense") and
# ladder.fine_plan(dense=True); training and the cover ladder keep the
# default grid (compile count matters there).
DENSE_LIG_BUCKETS = (16, 20, 24, 28, 32, 40, 48, 56, 64, 80, 96,
                     128, 192, 256)
DENSE_REC_BUCKETS = (64, 128, 192, 256, 320, 384, 448, 512, 576, 640,
                     704, 832, 1024, 1152, 1280, 1536, 1792, 2048, 2304,
                     2688, 3072)


def _ladder(n: int, rungs: Tuple[int, ...], quantum: int) -> int:
    for r in rungs:
        if n <= r:
            return r
    return max(_round_up(n, quantum), rungs[-1] + quantum)


def bucket_sizes(
    n_lig: int, n_rec: int, n_bonds: int,
    lig_quantum: int = 16, rec_quantum: int = 64, bond_quantum: int = 8,
    dense: bool = False,
) -> Tuple[int, int, int]:
    """Round sizes up the geometric bucket ladders to bound jit
    recompilation; the quanta only govern overflow past the last rung.
    ``dense`` selects the ~1.2x-spaced warmed-service rungs (less
    padding, more programs — see DENSE_*_BUCKETS)."""
    return (
        _ladder(n_lig, DENSE_LIG_BUCKETS if dense else LIG_BUCKETS,
                lig_quantum),
        _ladder(n_rec, DENSE_REC_BUCKETS if dense else REC_BUCKETS,
                rec_quantum),
        _ladder(max(n_bonds, 1), BOND_BUCKETS, bond_quantum),
    )


def pad_to(data: ComplexData, nl: int, nr: int, nb: int,
           kb: int = 4, kr: int = 0) -> ComplexData:
    """Pad a ComplexData to bucket sizes (host-side, numpy).

    ``kb`` additionally normalizes the bonded-neighbor width (max bond
    degree of the molecule, data-dependent) to ``max(kb, current)`` so
    complexes featurized from different molecules stack into one batch;
    4 covers standard organics, hypervalent atoms grow it per molecule.
    ``kr`` does the same for the receptor kNN width (data-dependent for
    receptors smaller than the kNN cap + 1 residues).
    """

    def pad(a, target_rows, fill=0, cols=None):
        a = np.asarray(a)
        pad_width = [(0, target_rows - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        if cols is not None:
            pad_width[1] = (0, cols - a.shape[1])
        return np.pad(a, pad_width, constant_values=fill)

    cur_nl, cur_nr, cur_nb = data.lig_cat.shape[0], data.rec_cat.shape[0], data.rot_u.shape[0]
    assert nl >= cur_nl and nr >= cur_nr and nb >= cur_nb
    kb = max(kb, data.lig_bond_nbr.shape[1])
    kr = max(kr, data.rec_nbr.shape[1])
    mask_rotate = np.asarray(data.mask_rotate)
    mask_rotate = np.pad(
        mask_rotate, [(0, nb - cur_nb), (0, nl - cur_nl)], constant_values=False
    )
    return ComplexData(
        lig_cat=pad(data.lig_cat, nl),
        lig_mask=pad(data.lig_mask, nl, False),
        lig_pos=pad(data.lig_pos, nl),
        lig_bond_nbr=pad(data.lig_bond_nbr, nl, cols=kb),
        lig_bond_mask=pad(data.lig_bond_mask, nl, False, cols=kb),
        lig_bond_attr=pad(data.lig_bond_attr, nl, cols=kb),
        rot_u=pad(data.rot_u, nb),
        rot_v=pad(data.rot_v, nb),
        rot_mask=pad(data.rot_mask, nb, False),
        mask_rotate=mask_rotate,
        rec_cat=pad(data.rec_cat, nr),
        rec_lm=pad(data.rec_lm, nr),
        rec_mask=pad(data.rec_mask, nr, False),
        rec_pos=pad(data.rec_pos, nr),
        rec_nbr=pad(data.rec_nbr, nr, cols=kr),
        rec_nbr_mask=pad(data.rec_nbr_mask, nr, False, cols=kr),
        original_center=np.asarray(data.original_center),
        rec_scv=(
            None if data.rec_scv is None else pad(data.rec_scv, nr)
        ),
    )


def apply_rec_keep(data: ComplexData, keep) -> ComplexData:
    """Mask-based receptor crop (the TPU realization of the reference's
    ``crop_beyond``, ``utils/utils.py:388-413``): the reference FILTERS the
    precomputed receptor edges (PyG ``subgraph``) rather than rebuilding
    them, so dropping residues == zeroing their validity masks. jit-safe
    (works on jnp or numpy arrays); ``keep`` is a (NR,) bool mask."""
    xp = jnp if isinstance(data.rec_mask, jnp.ndarray) else np
    keep = xp.asarray(keep)
    return data._replace(
        rec_mask=data.rec_mask & keep,
        rec_nbr_mask=data.rec_nbr_mask & keep[:, None] & keep[data.rec_nbr],
    )


def apply_rec_keep_aa(aa: AAComplexData, keep) -> AAComplexData:
    """All-atom crop: atoms follow their parent residue
    (reference ``crop_beyond`` all_atoms branch, ``utils/utils.py:394-400``)."""
    base = apply_rec_keep(aa.base, keep)
    xp = jnp if isinstance(aa.atom_mask, jnp.ndarray) else np
    keep = xp.asarray(keep)
    atom_keep = aa.atom_mask & keep[aa.atom_res]
    return aa._replace(
        base=base,
        atom_mask=atom_keep,
        atom_nbr_mask=aa.atom_nbr_mask
        & atom_keep[:, None]
        & atom_keep[aa.atom_nbr],
        res_atom_mask=aa.res_atom_mask & keep[:, None],
    )


def rec_keep_mask(rec_pos, rec_mask, poses, lig_mask, cutoff):
    """keep[r] = any ligand atom of any pose within ``cutoff`` of residue r
    (reference crop predicate, utils/utils.py:391). ``poses``: (..., NL, 3)."""
    xp = jnp if isinstance(rec_pos, jnp.ndarray) else np
    poses = xp.asarray(poses)
    flat = poses.reshape(-1, poses.shape[-1])  # (P*NL, 3)
    lmask = xp.broadcast_to(lig_mask, poses.shape[:-1]).reshape(-1)
    d2 = ((flat[:, None, :] - rec_pos[None, :, :]) ** 2).sum(-1)
    within = (d2 < cutoff**2) & lmask[:, None]
    return within.any(axis=0) & rec_mask


def pocket_indices(rec_pos, rec_mask, poses, lig_mask, cutoff, capacity):
    """Indices of the ``capacity`` receptor residues nearest any ligand
    atom of any pose, plus a validity mask (residue real AND within
    ``cutoff``). jit-friendly (static ``capacity``); the compaction
    counterpart of :func:`rec_keep_mask` for :func:`compact_receptor`."""
    poses = jnp.asarray(poses)
    flat = poses.reshape(-1, poses.shape[-1])
    lmask = jnp.broadcast_to(lig_mask, poses.shape[:-1]).reshape(-1)
    d2 = ((flat[:, None, :] - rec_pos[None, :, :]) ** 2).sum(-1)
    d2 = jnp.where(lmask[:, None], d2, jnp.inf)
    mind2 = jnp.where(rec_mask, d2.min(axis=0), jnp.inf)  # (NR,)
    neg, idx = jax.lax.top_k(-mind2, capacity)
    valid = (-neg) < cutoff**2
    return idx.astype(jnp.int32), valid


def compact_receptor(data: ComplexData, idx: jnp.ndarray,
                     valid: jnp.ndarray) -> ComplexData:
    """In-jit receptor compaction to a fixed pocket capacity: the gather
    realization of the reference's ``crop_beyond`` (utils/utils.py:388-413)
    that actually SHRINKS the dense blocks (masking via
    :func:`apply_rec_keep` keeps their padded extent). Receptor neighbor
    lists are remapped into pocket-local indexing; edges to dropped
    residues are masked off — identical semantics to the reference's PyG
    ``subgraph`` filter. ``idx``/``valid`` from :func:`pocket_indices`."""
    nr = data.rec_mask.shape[0]
    cap = idx.shape[0]
    inv = jnp.full((nr,), -1, jnp.int32).at[idx].set(
        jnp.arange(cap, dtype=jnp.int32)
    )
    nbr_g = data.rec_nbr[idx]  # (cap, KR) global indices
    nbr_local = inv[nbr_g]
    nbr_mask = (
        data.rec_nbr_mask[idx]
        & (nbr_local >= 0)
        & valid[:, None]
    )
    # dropped neighbors may map to -1; point them at 0 (masked anyway)
    nbr_local = jnp.maximum(nbr_local, 0)
    nbr_mask = nbr_mask & valid[nbr_local]
    return data._replace(
        rec_cat=data.rec_cat[idx],
        rec_lm=data.rec_lm[idx],
        rec_mask=data.rec_mask[idx] & valid,
        rec_pos=data.rec_pos[idx],
        rec_nbr=nbr_local,
        rec_nbr_mask=nbr_mask,
        rec_scv=None if data.rec_scv is None else data.rec_scv[idx],
    )


def crop_complex(data: ComplexData, keep: np.ndarray) -> ComplexData:
    """HOST-side shrink: physically drop receptor rows (pre-padding), so a
    3000-residue receptor occupies a small bucket. Neighbor lists are
    FILTERED and remapped, matching the reference's subgraph semantics.
    Complements :func:`apply_rec_keep` (which handles the per-step
    sigma-dependent crop inside jit)."""
    keep = np.asarray(keep, bool)
    remap = np.cumsum(keep) - 1  # old idx -> new idx (valid where keep)
    nbr = np.asarray(data.rec_nbr)
    nbr_mask = np.asarray(data.rec_nbr_mask) & keep[nbr]
    new_nbr = remap[nbr]
    new_nbr[~nbr_mask] = 0
    return data._replace(
        rec_cat=np.asarray(data.rec_cat)[keep],
        rec_lm=np.asarray(data.rec_lm)[keep],
        rec_mask=np.asarray(data.rec_mask)[keep],
        rec_pos=np.asarray(data.rec_pos)[keep],
        rec_nbr=new_nbr[keep].astype(np.int32),
        rec_nbr_mask=nbr_mask[keep],
        rec_scv=(
            None if data.rec_scv is None else np.asarray(data.rec_scv)[keep]
        ),
    )


def crop_aa_complex(aa: AAComplexData, keep: np.ndarray) -> AAComplexData:
    keep = np.asarray(keep, bool)
    base = crop_complex(aa.base, keep)
    remap = np.cumsum(keep) - 1
    atom_keep = np.asarray(aa.atom_mask) & keep[np.asarray(aa.atom_res)]
    atom_remap = np.cumsum(atom_keep) - 1
    anbr = np.asarray(aa.atom_nbr)
    anbr_mask = np.asarray(aa.atom_nbr_mask) & atom_keep[anbr]
    new_anbr = atom_remap[anbr]
    new_anbr[~anbr_mask] = 0
    res_atom_idx = np.asarray(aa.res_atom_idx)
    res_atom_mask = np.asarray(aa.res_atom_mask) & atom_keep[res_atom_idx]
    new_rai = atom_remap[res_atom_idx]
    new_rai[~res_atom_mask] = 0
    return aa._replace(
        base=base,
        atom_cat=np.asarray(aa.atom_cat)[atom_keep],
        atom_mask=np.asarray(aa.atom_mask)[atom_keep],
        atom_pos=np.asarray(aa.atom_pos)[atom_keep],
        atom_nbr=new_anbr[atom_keep].astype(np.int32),
        atom_nbr_mask=anbr_mask[atom_keep],
        atom_res=remap[np.asarray(aa.atom_res)[atom_keep]].astype(np.int32),
        res_atom_idx=new_rai[keep].astype(np.int32),
        res_atom_mask=res_atom_mask[keep],
    )


def build_knn_neighbors(
    pos: np.ndarray, k: int, max_radius: Optional[float] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side kNN neighbor lists for the receptor graph.

    Mirrors the preprocessing kNN of the reference (knn-only graph,
    ``datasets/process_mols.py:172,208``): each node's k nearest other nodes,
    optionally radius-capped. Uses the native C++ kernel when available
    (``native/graphops.cpp``, ~40x faster; exact-parity tested), with this
    numpy path as fallback.
    """
    try:
        from diffdock_tpu.native import knn_graph_native

        out = knn_graph_native(np.asarray(pos, np.float32), k, max_radius)
        if out is not None:
            return out
    except Exception:
        pass
    n = pos.shape[0]
    k = min(k, max(n - 1, 1))
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    idx = np.argsort(d, axis=1)[:, :k]
    dist = np.take_along_axis(d, idx, axis=1)
    mask = np.isfinite(dist)
    if max_radius is not None:
        mask &= dist <= max_radius
        # never isolate a node: keep its nearest neighbor even beyond the
        # cutoff (reference process_mols.py:184-188 fallback)
        if n > 1:
            mask[:, 0] |= ~mask.any(axis=1)
    return idx.astype(np.int32), mask


def synthetic_aa_complex(
    rng: np.random.RandomState,
    n_lig: int = 12,
    n_rec: int = 16,
    n_bonds: int = 3,
    atoms_per_res: int = 4,
    lm_dim: int = 0,
    k_atom: int = 6,
) -> "AAComplexData":
    """Random all-atom complex: each residue gets a few heavy atoms near its
    C-alpha."""
    from diffdock_tpu.data.featurize import REC_ATOM_CATEGORICAL_DIMS

    base = synthetic_complex(
        rng, n_lig=n_lig, n_rec=n_rec, n_bonds=n_bonds, lm_dim=lm_dim
    )
    na = n_rec * atoms_per_res
    atom_res = np.repeat(np.arange(n_rec), atoms_per_res).astype(np.int32)
    atom_pos = (
        np.asarray(base.rec_pos)[atom_res]
        + rng.randn(na, 3).astype(np.float32) * 1.5
    )
    atom_cat = np.stack(
        [rng.randint(0, d, size=na) for d in REC_ATOM_CATEGORICAL_DIMS], axis=1
    ).astype(np.int32)
    atom_nbr, atom_nbr_mask = build_knn_neighbors(atom_pos, k_atom)
    res_atom_idx = np.arange(na).reshape(n_rec, atoms_per_res).astype(np.int32)
    res_atom_mask = np.ones((n_rec, atoms_per_res), bool)
    return AAComplexData(
        base=base,
        atom_cat=atom_cat,
        atom_mask=np.ones(na, bool),
        atom_pos=atom_pos,
        atom_nbr=atom_nbr,
        atom_nbr_mask=atom_nbr_mask,
        atom_res=atom_res,
        res_atom_idx=res_atom_idx,
        res_atom_mask=res_atom_mask,
    )


def synthetic_complex(
    rng: np.random.RandomState,
    n_lig: int = 12,
    n_rec: int = 48,
    n_bonds: int = 3,
    lm_dim: int = 0,
    k_rec: int = 10,
) -> ComplexData:
    """Random but structurally valid complex for tests and benchmarks."""
    # ligand: a random chain so rotatable bonds are well-defined
    lig_pos = np.cumsum(rng.randn(n_lig, 3).astype(np.float32) * 0.8, axis=0)
    lig_pos = lig_pos - lig_pos.mean(0)
    bonds = [(i, i + 1) for i in range(n_lig - 1)]

    from diffdock_tpu.geometry.torsion import rotatable_bond_mask

    edge_mask, mask_rotate = rotatable_bond_mask(n_lig, bonds)
    directed = [e for ij in bonds for e in (ij, ij[::-1])]
    rot_edges = [directed[i] for i in np.flatnonzero(edge_mask)]
    # keep at most n_bonds rotatable bonds
    rot_edges, mask_rotate = rot_edges[:n_bonds], mask_rotate[:n_bonds]

    kb = 4
    bond_nbr = np.zeros((n_lig, kb), np.int32)
    bond_mask = np.zeros((n_lig, kb), bool)
    bond_attr = np.zeros((n_lig, kb, 4), np.float32)
    deg = np.zeros(n_lig, int)
    for (i, j) in bonds:
        for a, b in ((i, j), (j, i)):
            bond_nbr[a, deg[a]] = b
            bond_mask[a, deg[a]] = True
            bond_attr[a, deg[a], rng.randint(4)] = 1.0
            deg[a] += 1

    rec_pos = (rng.randn(n_rec, 3) * 8.0).astype(np.float32)
    rec_pos = rec_pos - rec_pos.mean(0)
    rec_nbr, rec_nbr_mask = build_knn_neighbors(rec_pos, k_rec)

    from diffdock_tpu.data.featurize import LIG_CATEGORICAL_DIMS

    lig_cat = np.stack(
        [rng.randint(0, d, size=n_lig) for d in LIG_CATEGORICAL_DIMS], axis=1
    ).astype(np.int32)

    nb = len(rot_edges)
    return ComplexData(
        lig_cat=lig_cat,
        lig_mask=np.ones(n_lig, bool),
        lig_pos=lig_pos,
        lig_bond_nbr=bond_nbr,
        lig_bond_mask=bond_mask,
        lig_bond_attr=bond_attr,
        rot_u=np.array([e[0] for e in rot_edges], np.int32),
        rot_v=np.array([e[1] for e in rot_edges], np.int32),
        rot_mask=np.ones(nb, bool),
        mask_rotate=mask_rotate.astype(bool),
        rec_cat=rng.randint(0, 20, size=(n_rec, 1)).astype(np.int32),
        rec_lm=np.zeros((n_rec, lm_dim), np.float32),
        rec_mask=np.ones(n_rec, bool),
        rec_pos=rec_pos,
        rec_nbr=rec_nbr,
        rec_nbr_mask=rec_nbr_mask,
        original_center=np.zeros(3, np.float32),
    )
