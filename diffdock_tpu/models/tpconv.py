"""Tensor-product graph convolutions over dense neighbor blocks.

The TPU-native re-design of the reference ``TensorProductConvLayer``
(``models/tensor_layers.py:234-335``): instead of edge lists + torch-scatter,
each receiver set consumes dense neighbor blocks
(gather -> per-edge MLP weights -> CG tensor product -> masked mean over the
combined neighbor axis). Multi-block mean semantics match the reference's
``tp_scatter_multigroup`` (sum over all groups / total degree,
``tensor_layers.py:148-231``); batch norm precedes the residual as in the
'new' layer (``tensor_layers.py:309-330``).

Two modules:
* ``TPConvLayer`` — one receiver set (receptor/ligand embedding layers,
  score heads).
* ``JointTPConvLayer`` — ligand+receptor receivers with per-edge-type FC
  groups and a batch norm computed jointly over both node sets, matching the
  reference's concatenated-node-array convs (``models/cg_model.py:329-349``).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from diffdock_tpu.models.encoders import FCBlock
from diffdock_tpu.ops.batch_norm import IrrepsBatchNorm
from diffdock_tpu.ops.irreps import Irreps
from diffdock_tpu.ops.linear import IrrepsLinear
from diffdock_tpu.ops.segment import multi_group_mean
from diffdock_tpu.ops.tensor_product import (
    DepthwiseTensorProduct,
    FullyConnectedTensorProduct,
)


class NeighborBlock(NamedTuple):
    """One dense edge group targeting a common receiver set.

    sender_attr: (S, F_in) sender node features (may be the receiver set).
    nbr_idx: (R, K) int32 indices into sender_attr.
    nbr_mask: (R, K) bool edge validity.
    edge_attr: (R, K, E) scalar edge features (already embedded+concatenated).
    edge_sh: (R, K, sh_dim) spherical harmonics of edge vectors
      (sender_pos - receiver_pos, the reference's pos[dst] - pos[src]).
    edge_weight: optional (R, K) smooth-edge weights.
    """

    sender_attr: jnp.ndarray
    nbr_idx: jnp.ndarray
    nbr_mask: jnp.ndarray
    edge_attr: jnp.ndarray
    edge_sh: jnp.ndarray
    edge_weight: Optional[jnp.ndarray] = None


def _tp_message(tp, fc, blk: NeighborBlock, train: bool):
    """fc(edge_attr) -> weights; tp(gathered senders, sh, weights)."""
    w = fc(blk.edge_attr, train=train)
    if blk.edge_weight is not None:
        w = w * blk.edge_weight[..., None]
    x_nbr = blk.sender_attr[blk.nbr_idx]  # (R, K, F_in)
    return tp(x_nbr, blk.edge_sh, w)  # (R, K, out_dim)


def _tp_message_reduced(tp, fc, blk: NeighborBlock, train: bool,
                        dtype: str = "float32", merged: bool = True):
    """Factored message computation: reduce over neighbors BEFORE applying
    the weight-generating FC's last (linear) layer.

    Exact reassociation of fc+tp+sum: with per-edge hidden activations
    h[r,j,:] (fan-out H), last-layer kernel T[H, fan*mul] and bias b, and the
    weight-independent coupled tensor G[r,j,u,d] per output irrep,

        sum_j TP(x_j, sh_j, h_j @ T + b)
          = einsum('hud,huw->wd', einsum('rjh,rjud->rhud', h, G), T)
          + einsum('rud,uw->rwd', einsum('rj,rjud->rud', 1, G), b)

    This avoids materializing the (edges, weight_numel) tensor — the HBM
    blow-up of the naive path — and cuts the contraction FLOPs by
    ~mul_out/d3 (an order of magnitude at DiffDock-L scale).

    The default ``merged`` layout runs ONE reduction einsum and ONE weight
    contraction across every output class (v5e-profiled 1.06-1.25x over the
    per-class loop): the per-class coupled tensors concatenate into a single
    (R, K, F_tot) operand, the bias joins as an extra hidden row whose
    activation is ``mw``, and the per-class weights (d3-identity-expanded,
    1/sqrt(fan)-scaled) form one block-diagonal (H+1, F_tot, W_tot) tensor.
    This also collapses the narrow per-class intermediates (fan*d3 of 10-90
    lanes pad to 128 on TPU) into one wide, well-tiled pair of dots.

    Returns (summed_messages (R, out_dim), valid_counts (R,)).
    """
    cd = jnp.dtype(dtype)
    mask = blk.nbr_mask.astype(cd)  # (R, K)
    mw = mask if blk.edge_weight is None else mask * blk.edge_weight.astype(cd)
    h = fc.hidden(blk.edge_attr.astype(cd), train=train) * mw[..., None]
    x_nbr = blk.sender_attr.astype(cd)[blk.nbr_idx]  # (R, K, F_in)
    edge_sh = blk.edge_sh.astype(cd)
    H = h.shape[-1]
    counts = blk.nbr_mask.astype(jnp.float32).sum(axis=-1)

    if merged:
        classes = []  # (k, offset, fan, d3, mul)
        parts = []
        for k, ((offset, fan, mul), ek) in enumerate(
            zip(tp.weight_slices(), tp.irreps_out)
        ):
            if fan == 0:
                continue
            classes.append((k, offset, fan, ek.ir.dim, mul))
            parts.append(tp.coupled_class_merged(k, x_nbr, edge_sh))
        if not classes:
            dim = sum(e.dim for e in tp.irreps_out)
            return jnp.zeros(blk.nbr_idx.shape[:-1] + (dim,), h.dtype), counts
        coupled = jnp.concatenate(parts, axis=-1).astype(cd)  # (R, K, F_tot)
        f_tot = coupled.shape[-1]
        w_tot = sum(mul * d3 for _, _, _, d3, mul in classes)

        h_aug = jnp.concatenate([h, mw[..., None].astype(cd)], axis=-1)
        p = jnp.einsum(
            "rkh,rkF->rhF", h_aug, coupled,
            preferred_element_type=jnp.float32,
        ).astype(cd)  # (R, H+1, F_tot)

        t3 = jnp.zeros((H + 1, f_tot, w_tot), cd)
        f_off = w_off = 0
        for _, offset, fan, d3, mul in classes:
            t_k = fc.out_kernel[:, offset : offset + fan * mul].reshape(
                H, fan, mul
            )
            b_k = fc.out_bias[offset : offset + fan * mul].reshape(fan, mul)
            inv = 1.0 / np.sqrt(fan)
            tt = tp.expand_weight_identity(t_k.astype(cd), d3) * inv
            bb = tp.expand_bias_identity(b_k.astype(cd), d3) * inv
            blk_w = jnp.concatenate(
                [tt.reshape(H, fan * d3, mul * d3), bb[None]], axis=0
            )
            t3 = jax.lax.dynamic_update_slice(
                t3, blk_w.astype(cd), (0, f_off, w_off)
            )
            f_off += fan * d3
            w_off += mul * d3

        merged_out = jnp.einsum(
            "rhF,hFW->rW", p, t3, preferred_element_type=jnp.float32
        )  # (R, W_tot) f32, classes contiguous in e3nn layout

        if len(classes) == len(tp.irreps_out):
            return merged_out, counts
        outs = []
        live = {k: i for i, (k, *_r) in enumerate(classes)}
        w_offs = np.cumsum([0] + [mul * d3 for _, _, _, d3, mul in classes])
        for k, ek in enumerate(tp.irreps_out):
            if k in live:
                i = live[k]
                outs.append(merged_out[:, w_offs[i] : w_offs[i + 1]])
            else:
                outs.append(
                    jnp.zeros(blk.nbr_idx.shape[:-1] + (ek.dim,),
                              merged_out.dtype)
                )
        return jnp.concatenate(outs, axis=-1), counts

    # per-class reference path (kept as the merged layout's numeric oracle)
    outs = []
    for k, ((offset, fan, mul), ek) in enumerate(
        zip(tp.weight_slices(), tp.irreps_out)
    ):
        if fan == 0:
            outs.append(
                jnp.zeros(blk.nbr_idx.shape[:-1] + (ek.dim,), h.dtype)
            )
            continue
        d3 = ek.ir.dim
        coupled = tp.coupled_class_merged(k, x_nbr, edge_sh)  # (R, K, fan*d3)
        p_h = jnp.einsum(
            "rkh,rkF->rhF", h, coupled,
            preferred_element_type=jnp.float32,
        )
        p_b = jnp.einsum(
            "rk,rkF->rF", mw, coupled,
            preferred_element_type=jnp.float32,
        )
        t_k = fc.out_kernel[:, offset : offset + fan * mul].reshape(
            fc.out_kernel.shape[0], fan, mul
        )
        b_k = fc.out_bias[offset : offset + fan * mul].reshape(fan, mul)
        tt = tp.expand_weight_identity(t_k.astype(cd), d3)  # (H*fan*d3, mul*d3)
        bb = tp.expand_bias_identity(b_k.astype(cd), d3)  # (fan*d3, mul*d3)
        out_k = (
            jnp.einsum(
                "rG,GW->rW",
                p_h.astype(cd).reshape(p_h.shape[0], H * fan * d3),
                tt, preferred_element_type=jnp.float32,
            )
            + jnp.einsum("rF,FW->rW", p_b.astype(cd), bb,
                         preferred_element_type=jnp.float32)
        ) / jnp.sqrt(jnp.asarray(fan, jnp.float32))
        outs.append(out_k)  # already (R, mul*d3) = (R, ek.dim)
    summed = jnp.concatenate(outs, axis=-1)
    return summed, counts


def _combine_reduced(parts, eps: float = 1e-16):
    """Mean over several (sum, count) neighbor blocks per receiver."""
    total = sum(p[0] for p in parts)
    counts = sum(p[1] for p in parts)
    return total / jnp.maximum(counts[..., None], eps)


def _residual_pad(out: jnp.ndarray, attr: jnp.ndarray) -> jnp.ndarray:
    pad = out.shape[-1] - attr.shape[-1]
    return out + jnp.pad(attr, [(0, 0)] * (out.ndim - 1) + [(0, pad)])


class TPConvLayer(nn.Module):
    in_irreps: str
    sh_irreps: str
    out_irreps: str
    n_edge_features: int
    shared_fc: bool = True  # one FC for all blocks (one reference edge set)
    residual: bool = True
    batch_norm: bool = True
    dropout: float = 0.0
    hidden_features: Optional[int] = None
    tp_weights_layers: int = 2
    activation: str = "relu"
    bn_axis_names: tuple = ()
    factored: bool = True
    dtype: str = "float32"
    # 'uvu' depthwise variant (reference tensor_layers.py:248-292): channels
    # couple with the harmonics independently, then an equivariant linear
    # mixes multiplicities BEFORE batch norm (tensor_layers.py:324-328)
    depthwise: bool = False

    @nn.compact
    def __call__(
        self,
        receiver_attr: Optional[jnp.ndarray],
        blocks: List[NeighborBlock],
        receiver_mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        if self.depthwise:
            tp = DepthwiseTensorProduct(
                self.in_irreps, self.sh_irreps, self.out_irreps
            )
        else:
            tp = FullyConnectedTensorProduct(
                self.in_irreps, self.sh_irreps, self.out_irreps
            )
        hidden = self.hidden_features or self.n_edge_features

        def make_fc(name):
            return FCBlock(
                hidden_dim=hidden,
                out_dim=tp.weight_numel,
                layers=self.tp_weights_layers,
                dropout=self.dropout,
                activation=self.activation,
                dtype=self.dtype,
                name=name,
            )

        shared = make_fc("fc") if self.shared_fc else None
        if self.factored and not self.depthwise:
            parts = []
            for g, blk in enumerate(blocks):
                fc = shared if self.shared_fc else make_fc(f"fc_{g}")
                parts.append(_tp_message_reduced(tp, fc, blk, train, self.dtype))
            out = _combine_reduced(parts)
        else:
            # depthwise runs the naive per-edge path: its weight tensor is
            # one scalar per channel, so the HBM blow-up the factored path
            # avoids does not occur
            parts, masks = [], []
            for g, blk in enumerate(blocks):
                fc = shared if self.shared_fc else make_fc(f"fc_{g}")
                parts.append(_tp_message(tp, fc, blk, train))
                masks.append(blk.nbr_mask)
            out = multi_group_mean(parts, masks)

        if self.depthwise:
            out = IrrepsLinear(
                irreps_in=str(tp.irreps_mid), irreps_out=self.out_irreps,
                name="linear_2",
            )(out)
        if self.batch_norm:
            out = IrrepsBatchNorm(
                Irreps(self.out_irreps), axis_names=self.bn_axis_names, name="bn"
            )(out, mask=receiver_mask, train=train)
        if self.residual:
            assert receiver_attr is not None
            out = _residual_pad(out, receiver_attr)
        return out


class MultiTPConvLayer(nn.Module):
    """N receiver sets with per-edge-type FC groups and one joint batch norm.

    Generalization of ``JointTPConvLayer`` to the all-atom model's three node
    sets (ligand / residues / atoms, reference ``models/aa_model.py:395-430``
    with 9 edge groups). ``receiver_sets`` is a list of
    (attr, blocks, groups, mask); sets with no blocks (last-layer receptors)
    receive zero messages but still pass through the joint batch norm, like
    the reference's concatenated node array.
    """

    in_irreps: str
    sh_irreps: str
    out_irreps: str
    n_edge_features: int
    differentiate_convolutions: bool = True
    residual: bool = True
    batch_norm: bool = True
    dropout: float = 0.0
    hidden_features: Optional[int] = None
    tp_weights_layers: int = 2
    activation: str = "relu"
    bn_axis_names: tuple = ()
    factored: bool = True
    dtype: str = "float32"
    depthwise: bool = False

    @nn.compact
    def __call__(self, receiver_sets, train: bool = False):
        if self.depthwise:
            tp = DepthwiseTensorProduct(
                self.in_irreps, self.sh_irreps, self.out_irreps
            )
            mid_dim = tp.irreps_mid.dim
        else:
            tp = FullyConnectedTensorProduct(
                self.in_irreps, self.sh_irreps, self.out_irreps
            )
            mid_dim = Irreps(self.out_irreps).dim
        hidden = self.hidden_features or self.n_edge_features
        fcs = {}

        def get_fc(g: int):
            key = g if self.differentiate_convolutions else 0
            if key not in fcs:
                name = f"fc_{key}" if self.differentiate_convolutions else "fc_shared"
                fcs[key] = FCBlock(
                    hidden_dim=hidden, out_dim=tp.weight_numel,
                    layers=self.tp_weights_layers, dropout=self.dropout,
                    activation=self.activation, dtype=self.dtype, name=name,
                )
            return fcs[key]

        outs = []
        for attr, blocks, groups, _mask in receiver_sets:
            if not blocks:
                outs.append(jnp.zeros(attr.shape[:-1] + (mid_dim,), attr.dtype))
                continue
            if self.factored and not self.depthwise:
                parts = [
                    _tp_message_reduced(tp, get_fc(g), blk, train, self.dtype)
                    for g, blk in zip(groups, blocks)
                ]
                outs.append(_combine_reduced(parts))
            else:
                parts = [
                    _tp_message(tp, get_fc(g), blk, train)
                    for g, blk in zip(groups, blocks)
                ]
                outs.append(
                    multi_group_mean(parts, [b.nbr_mask for b in blocks])
                )

        out = jnp.concatenate(outs, axis=0)
        if self.depthwise:
            out = IrrepsLinear(
                irreps_in=str(tp.irreps_mid), irreps_out=self.out_irreps,
                name="linear_2",
            )(out)
        if self.batch_norm:
            mask = jnp.concatenate([s[3] for s in receiver_sets], axis=0)
            out = IrrepsBatchNorm(
                Irreps(self.out_irreps), axis_names=self.bn_axis_names,
                name="bn",
            )(out, mask=mask, train=train)
        if self.residual:
            out = _residual_pad(
                out, jnp.concatenate([s[0] for s in receiver_sets], axis=0)
            )
        splits = np.cumsum([s[0].shape[0] for s in receiver_sets])[:-1]
        return jnp.split(out, splits, axis=0)


class JointTPConvLayer(nn.Module):
    """Ligand+receptor joint conv with per-edge-type FC groups.

    Groups follow the reference edge concatenation order
    (``models/cg_model.py:331-338``): 0 = lig<-lig, 1 = lig<-rec,
    2 = rec<-rec, 3 = rec<-lig. A group may span several dense blocks (the
    lig<-lig edge set is a bonded block plus an all-pairs radius block);
    ``lig_groups``/``rec_groups`` assign each block to an FC group. When
    ``last_layer`` is set, only ligand receivers get messages — but batch
    norm still sees the zero receptor rows (the reference passes the full
    node array through the final conv's BN). When
    ``differentiate_convolutions`` is False, one shared FC serves all groups.
    """

    in_irreps: str
    sh_irreps: str
    out_irreps: str
    n_edge_features: int
    last_layer: bool = False
    differentiate_convolutions: bool = True
    residual: bool = True
    batch_norm: bool = True
    dropout: float = 0.0
    hidden_features: Optional[int] = None
    tp_weights_layers: int = 2
    activation: str = "relu"
    bn_axis_names: tuple = ()
    factored: bool = True
    dtype: str = "float32"
    depthwise: bool = False

    @nn.compact
    def __call__(
        self,
        lig_attr: jnp.ndarray,
        rec_attr: jnp.ndarray,
        lig_blocks: List[NeighborBlock],
        lig_groups: Tuple[int, ...],
        rec_blocks: List[NeighborBlock],
        rec_groups: Tuple[int, ...],
        lig_mask: jnp.ndarray,
        rec_mask: jnp.ndarray,
        train: bool = False,
        rec_extra: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        rec_message_only: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """``rec_extra``: a precomputed (summed_messages, counts) receptor
        part folded into the receptor mean — used to share the layer-0
        rec<-rec messages across a pose batch (they are pose-independent:
        receptor features at layer 0 depend only on the cached embedding +
        sigma). ``rec_message_only``: compute and return just the receptor
        factored message parts for the given blocks (the precompute path);
        uses the same FC parameters as the full call."""
        if self.depthwise:
            tp = DepthwiseTensorProduct(
                self.in_irreps, self.sh_irreps, self.out_irreps
            )
        else:
            tp = FullyConnectedTensorProduct(
                self.in_irreps, self.sh_irreps, self.out_irreps
            )
        hidden = self.hidden_features or self.n_edge_features

        fcs = {}

        def get_fc(g: int):
            key = g if self.differentiate_convolutions else 0
            if key not in fcs:
                name = f"fc_{key}" if self.differentiate_convolutions else "fc_shared"
                fcs[key] = FCBlock(
                    hidden_dim=hidden,
                    out_dim=tp.weight_numel,
                    layers=self.tp_weights_layers,
                    dropout=self.dropout,
                    activation=self.activation,
                    dtype=self.dtype,
                    name=name,
                )
            return fcs[key]

        factored = self.factored and not self.depthwise
        if rec_message_only:
            assert factored, "precomputed rec messages need the factored path"
            return [
                _tp_message_reduced(tp, get_fc(g), blk, train, self.dtype)
                for g, blk in zip(rec_groups, rec_blocks)
            ]
        if factored:
            lig_parts = [
                _tp_message_reduced(tp, get_fc(g), blk, train, self.dtype)
                for g, blk in zip(lig_groups, lig_blocks)
            ]
            lig_out = _combine_reduced(lig_parts)
        else:
            lig_parts = [
                _tp_message(tp, get_fc(g), blk, train)
                for g, blk in zip(lig_groups, lig_blocks)
            ]
            lig_out = multi_group_mean(
                lig_parts, [b.nbr_mask for b in lig_blocks]
            )

        if self.last_layer:
            assert not rec_blocks
            rec_out = jnp.zeros(rec_attr.shape[:-1] + (lig_out.shape[-1],), lig_out.dtype)
        elif factored:
            rec_parts = [
                _tp_message_reduced(tp, get_fc(g), blk, train, self.dtype)
                for g, blk in zip(rec_groups, rec_blocks)
            ]
            if rec_extra is not None:
                rec_parts.append(rec_extra)
            rec_out = _combine_reduced(rec_parts)
        else:
            assert rec_extra is None, "rec_extra needs the factored path"
            rec_parts = [
                _tp_message(tp, get_fc(g), blk, train)
                for g, blk in zip(rec_groups, rec_blocks)
            ]
            rec_out = multi_group_mean(rec_parts, [b.nbr_mask for b in rec_blocks])

        out = jnp.concatenate([lig_out, rec_out], axis=0)
        if self.depthwise:
            out = IrrepsLinear(
                irreps_in=str(tp.irreps_mid), irreps_out=self.out_irreps,
                name="linear_2",
            )(out)
        if self.batch_norm:
            mask = jnp.concatenate([lig_mask, rec_mask], axis=0)
            out = IrrepsBatchNorm(
                Irreps(self.out_irreps), axis_names=self.bn_axis_names, name="bn"
            )(out, mask=mask, train=train)
        if self.residual:
            out = _residual_pad(out, jnp.concatenate([lig_attr, rec_attr], axis=0))

        nl = lig_attr.shape[0]
        return out[:nl], out[nl:]
