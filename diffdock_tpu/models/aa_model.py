"""All-atom score/confidence network (reference ``models/aa_model.py``).

Extends the coarse-grained model with a third node set — receptor heavy
atoms — and the reference's nine edge types:

  0 lig<-lig   1 lig<-rec   2 lig<-atom
  3 rec<-rec   4 rec<-lig   5 rec<-atom
  6 atom<-atom 7 atom<-lig  8 atom<-rec

(group order = the reference's edge concatenation, ``aa_model.py:407-416``).
The time-independent protein embedding runs jointly over residues+atoms with
four edge groups (``aa_model.py:287-317``) and is cached per complex. The
last joint conv restricts to edges into the ligand (groups 0-2,
``aa_model.py:427-430``). Used primarily as the confidence model
(``utils/utils.py`` model factory picks AA when ``all_atoms``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from diffdock_tpu.data.complexes import AAComplexData
from diffdock_tpu.diffusion.schedules import t_to_sigma
from diffdock_tpu.models.encoders import AtomEncoder
from diffdock_tpu.models.score_model import (
    CGScoreModel,
    MLP2,
    ScoreOutput,
    _pairwise,
)
from diffdock_tpu.models.tpconv import MultiTPConvLayer, NeighborBlock, TPConvLayer
from diffdock_tpu.ops.spherical import spherical_harmonics

AA_ATOM_CATEGORICAL_DIMS = (38, 119, 23, 38)  # reference rec_atom_feature_dims


class AARecCache(NamedTuple):
    rec_node_attr: jnp.ndarray
    atom_node_attr: jnp.ndarray
    rec_edge_attr: jnp.ndarray  # (NR, KR, ns)
    rec_edge_sh: jnp.ndarray
    atom_edge_attr: jnp.ndarray  # (NA, KA, ns)
    atom_edge_sh: jnp.ndarray
    ar_edge_attr: jnp.ndarray  # (NA, 1, ns) atom -> parent residue
    ar_edge_sh: jnp.ndarray
    ra_edge_sh: jnp.ndarray  # (NR, KRA, sh) residue <- member atoms


class AAScoreModel(CGScoreModel):
    """cfg fields are shared with the CG model; atom graph cutoffs reuse
    ``lig_max_radius`` (the reference builds atom-atom edges with the ligand
    distance expansion, ``aa_model.py:573-586``)."""

    def setup(self):
        cfg = self.cfg
        # smooth edge ramps are a score-model training option; the reference
        # never enables them for the all-atom confidence model
        assert not cfg.smooth_edges, "smooth_edges unsupported in AA model"
        self._setup_base()
        self.atom_node_embedding = AtomEncoder(
            emb_dim=cfg.ns, categorical_dims=AA_ATOM_CATEGORICAL_DIMS,
            scalar_dim=0,
        )
        self.atom_edge_embedding = MLP2(cfg.ns, cfg.dropout)
        self.ar_edge_embedding = MLP2(cfg.ns, cfg.dropout)
        self.lr_edge_embedding = MLP2(cfg.ns, cfg.dropout)
        self.la_edge_embedding = MLP2(cfg.ns, cfg.dropout)

        self.rec_emb_layers = [
            MultiTPConvLayer(
                in_irreps=self._ladder(i), sh_irreps=self.sh_irreps_str,
                out_irreps=self._ladder(i + 1),
                differentiate_convolutions=cfg.differentiate_convolutions,
                residual=True, name=f"rec_emb_{i}", **self._conv_common(),
            )
            for i in range(cfg.num_prot_emb_layers)
        ]
        npe, n_joint = cfg.num_prot_emb_layers, cfg.num_conv_layers
        self.conv_layers = [
            MultiTPConvLayer(
                in_irreps=self._ladder(npe + i), sh_irreps=self.sh_irreps_str,
                out_irreps=self._ladder(npe + i + 1),
                differentiate_convolutions=cfg.differentiate_convolutions,
                residual=True, name=f"conv_{i}", **self._conv_common(),
            )
            for i in range(n_joint)
        ]

    # ------------------------------------------------------------------
    def embed_receptor(self, data: AAComplexData, train: bool = False) -> AARecCache:
        cfg = self.cfg
        ns = cfg.ns
        base = data.base

        rec_scalar = base.rec_lm if cfg.lm_embedding_dim > 0 else None
        rec_attr = self.rec_node_embedding(base.rec_cat, rec_scalar)
        atom_attr = self.atom_node_embedding(data.atom_cat, None)

        # rec-rec kNN
        rvec = base.rec_pos[base.rec_nbr] - base.rec_pos[:, None, :]
        rdist = jnp.linalg.norm(rvec, axis=-1)
        rec_edge_attr = self.rec_edge_embedding(
            self.rec_distance_expansion(rdist), train=train
        )
        rec_edge_sh = spherical_harmonics(rvec, cfg.sh_lmax)

        # atom-atom kNN (ligand-scale distance embedding, aa_model.py:583)
        avec = data.atom_pos[data.atom_nbr] - data.atom_pos[:, None, :]
        adist = jnp.linalg.norm(avec, axis=-1)
        atom_edge_attr = self.atom_edge_embedding(
            self.lig_distance_expansion(adist), train=train
        )
        atom_edge_sh = spherical_harmonics(avec, cfg.sh_lmax)

        # atom <-> parent residue
        arvec = base.rec_pos[data.atom_res][:, None, :] - data.atom_pos[:, None, :]
        ardist = jnp.linalg.norm(arvec, axis=-1)
        ar_edge_attr = self.ar_edge_embedding(
            self.rec_distance_expansion(ardist), train=train
        )
        ar_edge_sh = spherical_harmonics(arvec, cfg.sh_lmax)  # atom recv: vec to residue
        # residue <- member atoms: the reference reuses the UNFLIPPED
        # atom->rec SH for the reversed direction (aa_model.py:306 ar_edge_sh
        # appears twice), i.e. SH(rec - atom) even though the sender is the
        # atom — reproduced for weight parity
        ravec = base.rec_pos[:, None, :] - data.atom_pos[data.res_atom_idx]
        ra_edge_sh = spherical_harmonics(ravec, cfg.sh_lmax)

        for layer in self.rec_emb_layers:
            rec_sets = self._protein_sets(
                data, rec_attr, atom_attr, rec_edge_attr, rec_edge_sh,
                atom_edge_attr, atom_edge_sh, ar_edge_attr, ar_edge_sh,
                ra_edge_sh,
            )
            rec_attr, atom_attr = layer(rec_sets, train=train)

        return AARecCache(
            rec_node_attr=rec_attr, atom_node_attr=atom_attr,
            rec_edge_attr=rec_edge_attr, rec_edge_sh=rec_edge_sh,
            atom_edge_attr=atom_edge_attr, atom_edge_sh=atom_edge_sh,
            ar_edge_attr=ar_edge_attr, ar_edge_sh=ar_edge_sh,
            ra_edge_sh=ra_edge_sh,
        )

    def _protein_sets(
        self, data, rec_attr, atom_attr, rec_edge_attr, rec_edge_sh,
        atom_edge_attr, atom_edge_sh, ar_edge_attr, ar_edge_sh, ra_edge_sh,
    ):
        """Receiver sets for the 4-group protein embedding conv
        (groups: 0 rec<-rec, 1 atom<-rec, 2 atom<-atom, 3 rec<-atom,
        matching aa_model.py:303-309 edge order)."""
        ns = self.cfg.ns
        base = data.base
        ws = self._with_scalars

        rec_rec = NeighborBlock(
            sender_attr=rec_attr, nbr_idx=base.rec_nbr,
            nbr_mask=base.rec_nbr_mask,
            edge_attr=ws(ns, rec_attr, rec_edge_attr, base.rec_nbr),
            edge_sh=rec_edge_sh,
        )
        # rec <- its member atoms (group 3): edge attrs reuse ar embedding
        ra_attr = ar_edge_attr[data.res_atom_idx][..., 0, :]
        recv = jnp.broadcast_to(
            rec_attr[:, None, :ns], ra_attr.shape[:-1] + (ns,)
        )
        send = atom_attr[data.res_atom_idx][..., :ns]
        rec_atom = NeighborBlock(
            sender_attr=atom_attr, nbr_idx=data.res_atom_idx,
            nbr_mask=data.res_atom_mask,
            edge_attr=jnp.concatenate([ra_attr, recv, send], axis=-1),
            edge_sh=ra_edge_sh,
        )
        # atom <- parent residue (group 1)
        a_recv = jnp.broadcast_to(
            atom_attr[:, None, :ns], ar_edge_attr.shape[:-1] + (ns,)
        )
        a_send = rec_attr[data.atom_res][:, None, :ns]
        atom_rec = NeighborBlock(
            sender_attr=rec_attr, nbr_idx=data.atom_res[:, None],
            nbr_mask=data.atom_mask[:, None],
            edge_attr=jnp.concatenate([ar_edge_attr, a_recv, a_send], axis=-1),
            edge_sh=ar_edge_sh,
        )
        atom_atom = NeighborBlock(
            sender_attr=atom_attr, nbr_idx=data.atom_nbr,
            nbr_mask=data.atom_nbr_mask,
            edge_attr=ws(ns, atom_attr, atom_edge_attr, data.atom_nbr),
            edge_sh=atom_edge_sh,
        )
        return [
            (rec_attr, [rec_rec, rec_atom], (0, 3), base.rec_mask),
            (atom_attr, [atom_rec, atom_atom], (1, 2), data.atom_mask),
        ]

    # ------------------------------------------------------------------
    def __call__(
        self,
        data: AAComplexData,
        lig_pos: jnp.ndarray,
        t: jnp.ndarray,
        so3_tables,
        torus_tables,
        rec_cache: Optional[AARecCache] = None,
        train: bool = False,
        rec_keep=None,
    ):
        cfg = self.cfg
        ns = cfg.ns
        if rec_keep is not None:
            from diffdock_tpu.data.complexes import apply_rec_keep_aa

            data = apply_rec_keep_aa(data, rec_keep)
        base = data.base
        nl, nr, na = lig_pos.shape[0], base.rec_pos.shape[0], data.atom_pos.shape[0]
        t = jnp.asarray(t, jnp.float32)

        if cfg.confidence_mode:
            tr_sigma = rot_sigma = tor_sigma = t
        else:
            tr_sigma, rot_sigma, tor_sigma = t_to_sigma(t, t, t, cfg.sigma)

        sigma_emb = self.timestep_emb(t[None])[0]

        if rec_cache is None:
            rec_cache = self.embed_receptor(data, train=train)
        rec_sigma = self.rec_sigma_embedding(sigma_emb[None], train=train)[0]
        rec_attr = rec_cache.rec_node_attr.at[:, :ns].add(rec_sigma)
        atom_attr = rec_cache.atom_node_attr.at[:, :ns].add(rec_sigma)
        rec_edge_attr = rec_cache.rec_edge_attr + rec_sigma
        atom_edge_attr = rec_cache.atom_edge_attr + rec_sigma
        ar_edge_attr = rec_cache.ar_edge_attr + rec_sigma

        lig_graph = self._ligand_graph(base, lig_pos, sigma_emb, train)
        lig_attr = self._embed_ligand(base, lig_graph, sigma_emb, train)

        # cross graphs
        cross_cutoff = (
            tr_sigma * 3.0 + 20.0 if cfg.dynamic_max_cross
            else cfg.cross_max_distance
        )
        lrvec, lrdist = _pairwise(base.rec_pos, lig_pos)
        lrmask = (
            (lrdist <= cross_cutoff)
            & base.lig_mask[:, None] & base.rec_mask[None, :]
        )
        lr_attr = self.lr_edge_embedding(
            jnp.concatenate(
                [
                    jnp.broadcast_to(sigma_emb, lrdist.shape + sigma_emb.shape[-1:]),
                    self.cross_distance_expansion(lrdist),
                ], axis=-1,
            ), train=train,
        )
        lr_sh = spherical_harmonics(lrvec, cfg.sh_lmax)
        # rec<-lig reuses the UNFLIPPED lig<-rec SH (reference
        # aa_model.py:412 passes lr_edge_sh for the flipped edge set)
        rl_sh = spherical_harmonics(jnp.swapaxes(lrvec, 0, 1), cfg.sh_lmax)

        lavec, ladist = _pairwise(data.atom_pos, lig_pos)
        lamask = (
            (ladist <= cfg.lig_max_radius)
            & base.lig_mask[:, None] & data.atom_mask[None, :]
        )
        la_attr = self.la_edge_embedding(
            jnp.concatenate(
                [
                    jnp.broadcast_to(sigma_emb, ladist.shape + sigma_emb.shape[-1:]),
                    self.lig_distance_expansion(ladist),
                ], axis=-1,
            ), train=train,
        )
        la_sh = spherical_harmonics(lavec, cfg.sh_lmax)
        # atom<-lig likewise reuses the unflipped lig<-atom SH
        # (aa_model.py:413)
        al_sh = spherical_harmonics(jnp.swapaxes(lavec, 0, 1), cfg.sh_lmax)

        rec_idx_all = jnp.broadcast_to(jnp.arange(nr)[None, :], (nl, nr))
        atom_idx_all = jnp.broadcast_to(jnp.arange(na)[None, :], (nl, na))
        lig_idx_r = jnp.broadcast_to(jnp.arange(nl)[None, :], (nr, nl))
        lig_idx_a = jnp.broadcast_to(jnp.arange(nl)[None, :], (na, nl))

        ws = self._with_scalars
        for li, layer in enumerate(self.conv_layers):
            bond_block, radius_block = self._lig_blocks_from_graph(
                base, lig_graph, lig_attr
            )

            def xattr(recv_attr, send_attr, bases, send_idx):
                recv = jnp.broadcast_to(
                    recv_attr[:, None, :ns], bases.shape[:2] + (ns,)
                )
                send = send_attr[send_idx][..., :ns]
                return jnp.concatenate([bases, recv, send], axis=-1)

            lig_lr = NeighborBlock(
                sender_attr=rec_attr, nbr_idx=rec_idx_all, nbr_mask=lrmask,
                edge_attr=xattr(lig_attr, rec_attr, lr_attr, rec_idx_all),
                edge_sh=lr_sh,
            )
            lig_la = NeighborBlock(
                sender_attr=atom_attr, nbr_idx=atom_idx_all, nbr_mask=lamask,
                edge_attr=xattr(lig_attr, atom_attr, la_attr, atom_idx_all),
                edge_sh=la_sh,
            )
            lig_set = (
                lig_attr, [bond_block, radius_block, lig_lr, lig_la],
                (0, 0, 1, 2), base.lig_mask,
            )

            if li < len(self.conv_layers) - 1:
                rec_rec = NeighborBlock(
                    sender_attr=rec_attr, nbr_idx=base.rec_nbr,
                    nbr_mask=base.rec_nbr_mask,
                    edge_attr=ws(ns, rec_attr, rec_edge_attr, base.rec_nbr),
                    edge_sh=rec_cache.rec_edge_sh,
                )
                rec_lig = NeighborBlock(
                    sender_attr=lig_attr, nbr_idx=lig_idx_r,
                    nbr_mask=jnp.swapaxes(lrmask, 0, 1),
                    edge_attr=xattr(
                        rec_attr, lig_attr, jnp.swapaxes(lr_attr, 0, 1),
                        lig_idx_r,
                    ),
                    edge_sh=rl_sh,
                )
                ra_attr_b = ar_edge_attr[data.res_atom_idx][..., 0, :]
                rec_atom = NeighborBlock(
                    sender_attr=atom_attr, nbr_idx=data.res_atom_idx,
                    nbr_mask=data.res_atom_mask,
                    edge_attr=xattr(
                        rec_attr, atom_attr, ra_attr_b, data.res_atom_idx
                    ),
                    edge_sh=rec_cache.ra_edge_sh,
                )
                atom_atom = NeighborBlock(
                    sender_attr=atom_attr, nbr_idx=data.atom_nbr,
                    nbr_mask=data.atom_nbr_mask,
                    edge_attr=ws(ns, atom_attr, atom_edge_attr, data.atom_nbr),
                    edge_sh=rec_cache.atom_edge_sh,
                )
                atom_lig = NeighborBlock(
                    sender_attr=lig_attr, nbr_idx=lig_idx_a,
                    nbr_mask=jnp.swapaxes(lamask, 0, 1),
                    edge_attr=xattr(
                        atom_attr, lig_attr, jnp.swapaxes(la_attr, 0, 1),
                        lig_idx_a,
                    ),
                    edge_sh=al_sh,
                )
                atom_rec = NeighborBlock(
                    sender_attr=rec_attr, nbr_idx=data.atom_res[:, None],
                    nbr_mask=data.atom_mask[:, None],
                    edge_attr=xattr(
                        atom_attr, rec_attr, ar_edge_attr, data.atom_res[:, None]
                    ),
                    edge_sh=rec_cache.ar_edge_sh,
                )
                sets = [
                    lig_set,
                    (rec_attr, [rec_rec, rec_lig, rec_atom], (3, 4, 5),
                     base.rec_mask),
                    (atom_attr, [atom_atom, atom_lig, atom_rec], (6, 7, 8),
                     data.atom_mask),
                ]
            else:
                sets = [
                    lig_set,
                    (rec_attr, [], (), base.rec_mask),
                    (atom_attr, [], (), data.atom_mask),
                ]

            lig_attr, rec_attr, atom_attr = layer(sets, train=train)

        if cfg.confidence_mode:
            return self._confidence_head(base, lig_attr, train)

        tr_pred, rot_pred = self._center_head(
            base, lig_pos, lig_attr, sigma_emb, tr_sigma, rot_sigma,
            so3_tables, train,
        )
        if cfg.no_torsion or base.rot_u.shape[0] == 0:
            tor_pred = jnp.zeros((base.rot_u.shape[0],))
        else:
            tor_pred = self._torsion_head(
                base, lig_pos, lig_attr, tor_sigma, torus_tables, train
            )
        return ScoreOutput(tr=tr_pred, rot=rot_pred, tor=tor_pred)
