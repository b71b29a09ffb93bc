"""The v1.0 (ICLR'23) architecture family, TPU-native.

Re-implements the reference ``CGOldModel`` (``models/old_cg_model.py:18-538``)
and ``AAOldModel`` (``models/old_aa_model.py:21-524``) on the dense
masked-block machinery. These are required to load the RELEASED weights: the
reference's default inference stack runs the old all-atom confidence model
(``inference.py:84`` ``--old_confidence_model`` default True;
``utils/utils.py:179-218`` old-arch loading).

Differences from the 'new' family, replicated exactly:

* no protein-embedding layers / ``rec_sigma_embedding`` — the sigma
  embedding enters through the node encoders (``old_cg_model.py:381,401``)
  and is concatenated into every edge feature;
* per-edge-type conv stacks with INDEPENDENT TensorProducts and batch norms
  (``lig/rec/lig_to_rec/rec_to_lig`` in CG, a flat 9-per-layer list in AA)
  instead of one shared conv with grouped FCs;
* ``OldAtomEncoder`` additive scalar fusion (``models/layers.py:70-116``),
  including its ESM slicing overlap (see ``encoders.OldAtomEncoder``);
* reversed cross edges reuse the UNFLIPPED spherical harmonics
  (``old_cg_model.py:265``, ``old_aa_model.py:255-271`` pass
  ``lr/la/ar_edge_sh`` for the flipped edge sets);
* the CG lig->rec edge features are ordered (base, sender, receiver) —
  unlike every other conv's (base, receiver, sender)
  (``old_cg_model.py:264``);
* the old irrep ladder always ends in ``ns x0o``
  (``old_cg_model.py:88-94``: no reduce_pseudoscalars option);
* the AA ligand<-atom edges embed distances with the CROSS distance
  expansion despite the 5A cutoff (``old_aa_model.py:476``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from diffdock_tpu.data.complexes import AAComplexData, ComplexData
from diffdock_tpu.diffusion.schedules import t_to_sigma
from diffdock_tpu.diffusion.time_embed import get_timestep_embedding
from diffdock_tpu.models.aa_model import AA_ATOM_CATEGORICAL_DIMS
from diffdock_tpu.models.encoders import AtomEncoder, GaussianSmearing, OldAtomEncoder
from diffdock_tpu.models.score_model import (
    CGScoreModel,
    ConfidenceMLP,
    MLP2,
    ScoreOutput,
    _pairwise,
)
from diffdock_tpu.models.tpconv import NeighborBlock, TPConvLayer, _residual_pad
from diffdock_tpu.ops.irreps import Irreps, get_irrep_seq
from diffdock_tpu.ops.spherical import spherical_harmonics


class OldCGScoreModel(CGScoreModel):
    """Reference ``CGOldModel`` (coarse-grained v1.0)."""

    def _old_conv(self, i: int, name: str) -> TPConvLayer:
        cfg = self.cfg
        return TPConvLayer(
            in_irreps=self._ladder(i), sh_irreps=self.sh_irreps_str,
            out_irreps=self._ladder(i + 1), n_edge_features=3 * cfg.ns,
            hidden_features=3 * cfg.ns, residual=False, shared_fc=True,
            batch_norm=cfg.batch_norm, dropout=cfg.dropout,
            tp_weights_layers=2, bn_axis_names=tuple(cfg.bn_axis_names),
            factored=cfg.factored_tp, dtype=cfg.compute_dtype, name=name,
        )

    def _setup_old_base(self):
        cfg = self.cfg
        ns = cfg.ns
        if cfg.odd_parity:
            # the flag exists in the v1.0 arg space too
            # (old_aa_model.py:167-196) but no shipped old-architecture
            # checkpoint sets it; the new architectures support it
            # (score_model.py) — use those
            from diffdock_tpu.models.config import ConfigError

            raise ConfigError(
                "odd_parity is not supported on the v1.0 (old) "
                "architectures; use the current CG/AA score models"
            )
        self.sh_dim = (cfg.sh_lmax + 1) ** 2
        # the old ladder has no reduce_pseudoscalars branch
        # (old_cg_model.py:88-94)
        self.irrep_seq = get_irrep_seq(
            ns, cfg.nv, cfg.use_second_order_repr, reduce_pseudoscalars=False
        )
        self.sh_irreps_str = str(Irreps.spherical_harmonics(cfg.sh_lmax))
        self.timestep_emb = get_timestep_embedding(
            cfg.embedding_type, cfg.sigma_embed_dim, cfg.embedding_scale
        )

        if cfg.use_old_atom_encoder:
            self.lig_node_embedding = OldAtomEncoder(
                emb_dim=ns, categorical_dims=cfg.lig_node_categorical_dims,
                scalar_dim=cfg.sigma_embed_dim,
            )
            self.rec_node_embedding = OldAtomEncoder(
                emb_dim=ns, categorical_dims=cfg.rec_node_categorical_dims,
                scalar_dim=cfg.sigma_embed_dim, lm_dim=cfg.lm_embedding_dim,
            )
        else:
            self.lig_node_embedding = AtomEncoder(
                emb_dim=ns, categorical_dims=cfg.lig_node_categorical_dims,
                scalar_dim=cfg.sigma_embed_dim,
            )
            # new encoder consumes the whole (lm, sigma) tail fused
            self.rec_node_embedding = AtomEncoder(
                emb_dim=ns, categorical_dims=cfg.rec_node_categorical_dims,
                scalar_dim=cfg.lm_embedding_dim + cfg.sigma_embed_dim,
            )
        self.lig_edge_embedding = MLP2(ns, cfg.dropout)
        self.rec_edge_embedding = MLP2(ns, cfg.dropout)

        self.lig_distance_expansion = GaussianSmearing(
            0.0, cfg.lig_max_radius, cfg.distance_embed_dim
        )
        self.rec_distance_expansion = GaussianSmearing(
            0.0, cfg.rec_max_radius, cfg.distance_embed_dim
        )
        self.cross_distance_expansion = GaussianSmearing(
            0.0, cfg.cross_max_distance, cfg.cross_distance_embed_dim
        )
        self.final_ladder = self._ladder(cfg.num_conv_layers)

    def setup(self):
        cfg = self.cfg
        self._setup_old_base()
        self.cross_edge_embedding = MLP2(cfg.ns, cfg.dropout)
        L = cfg.num_conv_layers
        self.lig_conv_layers = [self._old_conv(i, f"lig_conv_{i}") for i in range(L)]
        self.rec_conv_layers = [self._old_conv(i, f"rec_conv_{i}") for i in range(L)]
        self.lig_to_rec_conv_layers = [
            self._old_conv(i, f"lig_to_rec_conv_{i}") for i in range(L)
        ]
        self.rec_to_lig_conv_layers = [
            self._old_conv(i, f"rec_to_lig_conv_{i}") for i in range(L)
        ]
        if cfg.confidence_mode:
            self.confidence_layers = self._build_old_confidence_mlp()
        else:
            self._setup_score_heads()

    def _build_old_confidence_mlp(self):
        # old output layout (old_aa_model.py:120-127): the affinity scalar is
        # ONE extra output column, not ns pose features
        cfg = self.cfg
        out_dim = cfg.num_confidence_outputs + (
            1 if cfg.affinity_prediction else 0
        )
        return ConfidenceMLP(
            ns=cfg.ns, out_dim=out_dim, dropout=cfg.confidence_dropout,
            no_batchnorm=cfg.confidence_no_batchnorm,
            axis_names=tuple(cfg.bn_axis_names),
            name="confidence_predictor",
        )

    # ------------------------------------------------------------------
    def _embed_nodes(self, data: ComplexData, sigma_emb, train):
        """Node encoders with the sigma embedding in the scalar tail
        (old_cg_model.py:381,401: node_attr = cat(x, node_sigma_emb))."""
        cfg = self.cfg
        nl, nr = data.lig_cat.shape[0], data.rec_cat.shape[0]
        lig_tail = jnp.broadcast_to(sigma_emb, (nl,) + sigma_emb.shape[-1:])
        rec_sigma = jnp.broadcast_to(sigma_emb, (nr,) + sigma_emb.shape[-1:])
        if cfg.lm_embedding_dim > 0:
            rec_tail = jnp.concatenate([data.rec_lm, rec_sigma], axis=-1)
        else:
            rec_tail = rec_sigma
        lig_attr = self.lig_node_embedding(data.lig_cat, lig_tail)
        rec_attr = self.rec_node_embedding(data.rec_cat, rec_tail)
        return lig_attr, rec_attr

    def _rec_graph(self, data: ComplexData, sigma_emb, train):
        """Receptor kNN edges; edge attr order (sigma, dist_emb)
        (old_cg_model.py:410)."""
        cfg = self.cfg
        vec = data.rec_pos[data.rec_nbr] - data.rec_pos[:, None, :]
        dist = jnp.linalg.norm(vec, axis=-1)
        raw = jnp.concatenate(
            [
                jnp.broadcast_to(sigma_emb, dist.shape + sigma_emb.shape[-1:]),
                self.rec_distance_expansion(dist),
            ],
            axis=-1,
        )
        attr = self.rec_edge_embedding(raw, train=train)
        sh = spherical_harmonics(vec, cfg.sh_lmax)
        w = self._edge_weight(dist, cfg.rec_max_radius)
        return attr, sh, w

    def _cross_graph(self, data, lig_pos, sigma_emb, tr_sigma, train,
                     embedding, expansion, cutoff=None):
        """Dense lig x other cross block; edge attr order (sigma, dist_emb)
        (old_cg_model.py:455)."""
        cfg = self.cfg
        if cutoff is None:
            cutoff = (
                tr_sigma * 3.0 + 20.0 if cfg.dynamic_max_cross
                else cfg.cross_max_distance
            )
        vec, dist = _pairwise(data[0], lig_pos)  # (NL, NX, 3)
        mask = (dist <= cutoff) & data[1][None, :]
        raw = jnp.concatenate(
            [
                jnp.broadcast_to(sigma_emb, dist.shape + sigma_emb.shape[-1:]),
                expansion(dist),
            ],
            axis=-1,
        )
        attr = embedding(raw, train=train)
        sh = spherical_harmonics(vec, cfg.sh_lmax)
        # the reversed direction reuses the UNFLIPPED sh (old_cg_model.py:265)
        rev_sh = jnp.swapaxes(sh, 0, 1)
        w = self._edge_weight(dist, cutoff)
        return vec, dist, mask, attr, sh, rev_sh, w

    @staticmethod
    def _xattr(ns, recv_attr, send_attr, base, send_idx, swap=False):
        """(base, receiver, sender) scalar concatenation; ``swap`` flips to
        (base, sender, receiver) — the CG lig->rec quirk
        (old_cg_model.py:264)."""
        recv = jnp.broadcast_to(recv_attr[:, None, :ns], base.shape[:-1] + (ns,))
        send = send_attr[send_idx][..., :ns]
        parts = [base, send, recv] if swap else [base, recv, send]
        return jnp.concatenate(parts, axis=-1)

    # ------------------------------------------------------------------
    def __call__(
        self,
        data: ComplexData,
        lig_pos: jnp.ndarray,
        t: jnp.ndarray,
        so3_tables,
        torus_tables,
        rec_cache=None,  # signature-compatible; old arch has no cache
        train: bool = False,
        rec_keep=None,
    ):
        cfg = self.cfg
        ns = cfg.ns
        if rec_keep is not None:
            from diffdock_tpu.data.complexes import apply_rec_keep

            data = apply_rec_keep(data, rec_keep)
        nl, nr = lig_pos.shape[0], data.rec_pos.shape[0]
        t = jnp.asarray(t, jnp.float32)
        if cfg.confidence_mode:
            tr_sigma = rot_sigma = tor_sigma = t
        else:
            tr_sigma, rot_sigma, tor_sigma = t_to_sigma(t, t, t, cfg.sigma)
        sigma_emb = self.timestep_emb(t[None])[0]

        lig_attr, rec_attr = self._embed_nodes(data, sigma_emb, train)
        lig_graph = self._ligand_graph(data, lig_pos, sigma_emb, train)
        rec_edge_attr, rec_edge_sh, rec_edge_w = self._rec_graph(
            data, sigma_emb, train
        )
        (cvec, cdist, cmask_x, cross_attr, cross_sh, rev_cross_sh, cross_w) = (
            self._cross_graph(
                (data.rec_pos, data.rec_mask), lig_pos, sigma_emb, tr_sigma,
                train, self.cross_edge_embedding, self.cross_distance_expansion,
            )
        )
        cmask = cmask_x & data.lig_mask[:, None]
        rev_cross_w = None if cross_w is None else jnp.swapaxes(cross_w, 0, 1)
        rec_idx_all = jnp.broadcast_to(jnp.arange(nr)[None, :], (nl, nr))
        lig_idx_all = jnp.broadcast_to(jnp.arange(nl)[None, :], (nr, nl))

        L = len(self.lig_conv_layers)
        for l in range(L):
            bond_block, radius_block = self._lig_blocks_from_graph(
                data, lig_graph, lig_attr
            )
            lig_intra = self.lig_conv_layers[l](
                None, [bond_block, radius_block], data.lig_mask, train=train
            )
            r2l_block = NeighborBlock(
                sender_attr=rec_attr, nbr_idx=rec_idx_all, nbr_mask=cmask,
                edge_attr=self._xattr(ns, lig_attr, rec_attr, cross_attr,
                                      rec_idx_all),
                edge_sh=cross_sh, edge_weight=cross_w,
            )
            lig_inter = self.rec_to_lig_conv_layers[l](
                None, [r2l_block], data.lig_mask, train=train
            )
            if l < L - 1:
                rec_rec_block = NeighborBlock(
                    sender_attr=rec_attr, nbr_idx=data.rec_nbr,
                    nbr_mask=data.rec_nbr_mask,
                    edge_attr=self._xattr(ns, rec_attr, rec_attr,
                                          rec_edge_attr, data.rec_nbr),
                    edge_sh=rec_edge_sh, edge_weight=rec_edge_w,
                )
                rec_intra = self.rec_conv_layers[l](
                    None, [rec_rec_block], data.rec_mask, train=train
                )
                # lig->rec: edge attrs ordered (base, SENDER lig, RECEIVER
                # rec) — the CG-only quirk (old_cg_model.py:264)
                l2r_block = NeighborBlock(
                    sender_attr=lig_attr, nbr_idx=lig_idx_all,
                    nbr_mask=jnp.swapaxes(cmask, 0, 1),
                    edge_attr=self._xattr(
                        ns, rec_attr, lig_attr,
                        jnp.swapaxes(cross_attr, 0, 1), lig_idx_all, swap=True,
                    ),
                    edge_sh=rev_cross_sh, edge_weight=rev_cross_w,
                )
                rl = self.lig_to_rec_conv_layers[l](
                    None, [l2r_block], data.rec_mask, train=train
                )
            lig_attr = _residual_pad(lig_intra + lig_inter, lig_attr)
            if l < L - 1:
                rec_attr = _residual_pad(rec_intra + rl, rec_attr)

        if cfg.confidence_mode:
            return self._old_confidence_head(data, lig_attr, train)

        tr_pred, rot_pred = self._center_head(
            data, lig_pos, lig_attr, sigma_emb, tr_sigma, rot_sigma,
            so3_tables, train,
        )
        if cfg.no_torsion or data.rot_u.shape[0] == 0:
            tor_pred = jnp.zeros((data.rot_u.shape[0],))
        else:
            tor_pred = self._torsion_head(
                data, lig_pos, lig_attr, tor_sigma, torus_tables, train
            )
        return ScoreOutput(tr=tr_pred, rot=rot_pred, tor=tor_pred)

    def _old_confidence_head(self, data, lig_attr, train):
        """old_cg_model.py:297-300 / old_aa_model.py:284-295: scalar
        channels (first ns + final ns-x0o block when deep enough) mean-pooled
        over real ligand atoms."""
        cfg = self.cfg
        ns = cfg.ns
        if cfg.num_conv_layers >= 3:
            scalar = jnp.concatenate(
                [lig_attr[:, :ns], lig_attr[:, -ns:]], axis=-1
            )
        else:
            scalar = lig_attr[:, :ns]
        w = data.lig_mask[:, None].astype(scalar.dtype)
        pooled = (scalar * w).sum(0) / jnp.maximum(w.sum(), 1.0)
        return self.confidence_layers(pooled[None], train=train)[0]


class OldAAScoreModel(OldCGScoreModel):
    """Reference ``AAOldModel`` — the architecture of the SHIPPED default
    confidence model. Conv layers live in one flat list ``conv_{9l+k}``
    matching the reference's ``conv_layers`` ModuleList indexing
    (old_aa_model.py:114-117), k in:

      0 lig<-lig  1 lig<-rec  2 lig<-atom
      3 atom<-atom  4 atom<-lig  5 atom<-rec
      6 rec<-rec  7 rec<-lig  8 rec<-atom
    """

    def setup(self):
        cfg = self.cfg
        ns = cfg.ns
        self._setup_old_base()
        if cfg.use_old_atom_encoder:
            self.atom_node_embedding = OldAtomEncoder(
                emb_dim=ns, categorical_dims=AA_ATOM_CATEGORICAL_DIMS,
                scalar_dim=cfg.sigma_embed_dim,
            )
        else:
            self.atom_node_embedding = AtomEncoder(
                emb_dim=ns, categorical_dims=AA_ATOM_CATEGORICAL_DIMS,
                scalar_dim=cfg.sigma_embed_dim,
            )
        self.atom_edge_embedding = MLP2(ns, cfg.dropout)
        self.lr_edge_embedding = MLP2(ns, cfg.dropout)
        self.ar_edge_embedding = MLP2(ns, cfg.dropout)
        self.la_edge_embedding = MLP2(ns, cfg.dropout)
        self.conv_layers = [
            self._old_conv(l, f"conv_{9 * l + k}")
            for l in range(cfg.num_conv_layers)
            for k in range(9)
        ]
        if cfg.confidence_mode:
            self.confidence_layers = self._build_old_confidence_mlp()
        else:
            self._setup_score_heads()

    def __call__(
        self,
        data: AAComplexData,
        lig_pos: jnp.ndarray,
        t: jnp.ndarray,
        so3_tables,
        torus_tables,
        rec_cache=None,
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

        lig_attr, rec_attr = self._embed_nodes(base, sigma_emb, train)
        atom_tail = jnp.broadcast_to(sigma_emb, (na,) + sigma_emb.shape[-1:])
        atom_attr = self.atom_node_embedding(data.atom_cat, atom_tail)

        lig_graph = self._ligand_graph(base, lig_pos, sigma_emb, train)
        rec_edge_attr, rec_edge_sh, rec_edge_w = self._rec_graph(
            base, sigma_emb, train
        )
        # atom-atom kNN: lig-scale distance expansion (old_aa_model.py:440)
        avec = data.atom_pos[data.atom_nbr] - data.atom_pos[:, None, :]
        adist = jnp.linalg.norm(avec, axis=-1)
        atom_edge_attr = self.atom_edge_embedding(
            jnp.concatenate(
                [
                    jnp.broadcast_to(sigma_emb, adist.shape + sigma_emb.shape[-1:]),
                    self.lig_distance_expansion(adist),
                ],
                axis=-1,
            ),
            train=train,
        )
        atom_edge_sh = spherical_harmonics(avec, cfg.sh_lmax)
        atom_edge_w = self._edge_weight(adist, cfg.lig_max_radius)

        # lig <-> rec (dynamic cutoff)
        (_, _, cmask_x, lr_attr, lr_sh, rl_sh, lr_w) = self._cross_graph(
            (base.rec_pos, base.rec_mask), lig_pos, sigma_emb, tr_sigma,
            train, self.lr_edge_embedding, self.cross_distance_expansion,
        )
        cmask = cmask_x & base.lig_mask[:, None]
        rl_w = None if lr_w is None else jnp.swapaxes(lr_w, 0, 1)

        # lig <-> atom: 5A cutoff, CROSS distance expansion
        # (old_aa_model.py:472-476)
        (_, _, lamask_x, la_attr, la_sh, al_sh, la_w) = self._cross_graph(
            (data.atom_pos, data.atom_mask), lig_pos, sigma_emb, tr_sigma,
            train, self.la_edge_embedding, self.cross_distance_expansion,
            cutoff=cfg.lig_max_radius,
        )
        lamask = lamask_x & base.lig_mask[:, None]
        al_w = None if la_w is None else jnp.swapaxes(la_w, 0, 1)

        # atom <-> parent residue (precomputed; weight 1, old_aa_model.py:489)
        arvec = base.rec_pos[data.atom_res][:, None, :] - data.atom_pos[:, None, :]
        ardist = jnp.linalg.norm(arvec, axis=-1)
        ar_attr = self.ar_edge_embedding(
            jnp.concatenate(
                [
                    jnp.broadcast_to(sigma_emb, ardist.shape + sigma_emb.shape[-1:]),
                    self.rec_distance_expansion(ardist),
                ],
                axis=-1,
            ),
            train=train,
        )
        ar_sh = spherical_harmonics(arvec, cfg.sh_lmax)
        # rec <- member atoms reuses the unflipped atom->rec sh
        # (old_aa_model.py:270 passes ar_edge_sh for the flipped edges)
        ra_sh = spherical_harmonics(
            base.rec_pos[:, None, :] - data.atom_pos[data.res_atom_idx],
            cfg.sh_lmax,
        )
        ra_attr_b = ar_attr[data.res_atom_idx][..., 0, :]

        rec_idx_all = jnp.broadcast_to(jnp.arange(nr)[None, :], (nl, nr))
        atom_idx_all = jnp.broadcast_to(jnp.arange(na)[None, :], (nl, na))
        lig_idx_r = jnp.broadcast_to(jnp.arange(nl)[None, :], (nr, nl))
        lig_idx_a = jnp.broadcast_to(jnp.arange(nl)[None, :], (na, nl))

        L = cfg.num_conv_layers
        for l in range(L):
            conv = lambda k: self.conv_layers[9 * l + k]  # noqa: E731
            bond_block, radius_block = self._lig_blocks_from_graph(
                base, lig_graph, lig_attr
            )
            lig_update = conv(0)(
                None, [bond_block, radius_block], base.lig_mask, train=train
            )
            lr_block = NeighborBlock(
                sender_attr=rec_attr, nbr_idx=rec_idx_all, nbr_mask=cmask,
                edge_attr=self._xattr(ns, lig_attr, rec_attr, lr_attr,
                                      rec_idx_all),
                edge_sh=lr_sh, edge_weight=lr_w,
            )
            lr_update = conv(1)(None, [lr_block], base.lig_mask, train=train)
            la_block = NeighborBlock(
                sender_attr=atom_attr, nbr_idx=atom_idx_all, nbr_mask=lamask,
                edge_attr=self._xattr(ns, lig_attr, atom_attr, la_attr,
                                      atom_idx_all),
                edge_sh=la_sh, edge_weight=la_w,
            )
            la_update = conv(2)(None, [la_block], base.lig_mask, train=train)

            if l < L - 1:
                atom_block = NeighborBlock(
                    sender_attr=atom_attr, nbr_idx=data.atom_nbr,
                    nbr_mask=data.atom_nbr_mask,
                    edge_attr=self._xattr(ns, atom_attr, atom_attr,
                                          atom_edge_attr, data.atom_nbr),
                    edge_sh=atom_edge_sh, edge_weight=atom_edge_w,
                )
                atom_update = conv(3)(
                    None, [atom_block], data.atom_mask, train=train
                )
                al_block = NeighborBlock(
                    sender_attr=lig_attr, nbr_idx=lig_idx_a,
                    nbr_mask=jnp.swapaxes(lamask, 0, 1),
                    edge_attr=self._xattr(
                        ns, atom_attr, lig_attr,
                        jnp.swapaxes(la_attr, 0, 1), lig_idx_a,
                    ),
                    edge_sh=al_sh, edge_weight=al_w,
                )
                al_update = conv(4)(
                    None, [al_block], data.atom_mask, train=train
                )
                ar_block = NeighborBlock(
                    sender_attr=rec_attr, nbr_idx=data.atom_res[:, None],
                    nbr_mask=data.atom_mask[:, None],
                    edge_attr=self._xattr(
                        ns, atom_attr, rec_attr, ar_attr,
                        data.atom_res[:, None],
                    ),
                    edge_sh=ar_sh,
                )
                ar_update = conv(5)(
                    None, [ar_block], data.atom_mask, train=train
                )
                rec_block = NeighborBlock(
                    sender_attr=rec_attr, nbr_idx=base.rec_nbr,
                    nbr_mask=base.rec_nbr_mask,
                    edge_attr=self._xattr(ns, rec_attr, rec_attr,
                                          rec_edge_attr, base.rec_nbr),
                    edge_sh=rec_edge_sh, edge_weight=rec_edge_w,
                )
                rec_update = conv(6)(
                    None, [rec_block], base.rec_mask, train=train
                )
                rl_block = NeighborBlock(
                    sender_attr=lig_attr, nbr_idx=lig_idx_r,
                    nbr_mask=jnp.swapaxes(cmask, 0, 1),
                    edge_attr=self._xattr(
                        ns, rec_attr, lig_attr,
                        jnp.swapaxes(lr_attr, 0, 1), lig_idx_r,
                    ),
                    edge_sh=rl_sh, edge_weight=rl_w,
                )
                rl_update = conv(7)(
                    None, [rl_block], base.rec_mask, train=train
                )
                ra_block = NeighborBlock(
                    sender_attr=atom_attr, nbr_idx=data.res_atom_idx,
                    nbr_mask=data.res_atom_mask,
                    edge_attr=self._xattr(ns, rec_attr, atom_attr, ra_attr_b,
                                          data.res_atom_idx),
                    edge_sh=ra_sh,
                )
                ra_update = conv(8)(
                    None, [ra_block], base.rec_mask, train=train
                )

            lig_attr = _residual_pad(
                lig_update + la_update + lr_update, lig_attr
            )
            if l < L - 1:
                atom_attr = _residual_pad(
                    atom_update + al_update + ar_update, atom_attr
                )
                rec_attr = _residual_pad(
                    rec_update + ra_update + rl_update, rec_attr
                )

        if cfg.confidence_mode:
            return self._old_confidence_head(base, lig_attr, train)

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
