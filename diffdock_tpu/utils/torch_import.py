"""Import reference PyTorch (e3nn/PyG) checkpoints into diffdock_tpu params.

The reference releases trained score/confidence weights as torch
state_dicts (``train.py:141-146`` checkpoint flavors; downloaded zips in
``inference.py:123-143``). This converter maps the CG architecture's state
dict (``models/cg_model.py``) onto our flax parameter tree:

* plain Linears transpose (torch stores (out, in); flax (in, out)),
* per-categorical embedding tables map 1:1,
* the tensor-product weight-generating MLP's FINAL linear maps onto our
  ``FCBlock.out_kernel/out_bias`` with a **column permutation**: e3nn
  flattens TP weights in instruction order (in1-entry-major,
  ``o3.FullyConnectedTensorProduct`` with shared_weights=False), ours are
  grouped by output entry (``ops/tensor_product.py`` weight layout). Within
  a group both orders enumerate (in1, in2) the same way, so the permutation
  is a reordering of contiguous per-path blocks,
* e3nn BatchNorm weight/bias/running stats map onto ``IrrepsBatchNorm``'s
  weight/bias and ``batch_stats`` mean/var.

Verification status: the mapping is validated structurally (bijective
round-trip against synthetic state dicts with the reference's exact naming
scheme; every target parameter covered). Numerical parity against e3nn
itself cannot be executed in this image (no e3nn wheel); the TP/BN
normalization conventions were separately locked to e3nn semantics via the
closed-form golden tests in ``tests/test_ops.py``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def _t(a) -> np.ndarray:
    return np.asarray(a, np.float32).T


def _n(a) -> np.ndarray:
    return np.asarray(a, np.float32)


def tp_weight_permutation(tp) -> np.ndarray:
    """perm[j] = e3nn flat index feeding OUR flat weight index j.

    e3nn instruction order: for i in in1, for j in in2, for every allowed
    output entry (i-major). Ours: for k in irreps_out, for (i, j) i-major.
    Both decompose into the same (i, j, k) path blocks of size
    mul1 * mul_out (sh entries have mul 1), laid out (u-major, w-minor) in
    both conventions — so blocks permute wholesale.
    """
    # e3nn order: list of (i, j, k) with block sizes
    e3nn_paths: List[Tuple[int, int, int, int]] = []  # (i, j, k, size)
    for i, e1 in enumerate(tp.irreps_in1):
        for j, e2 in enumerate(tp.irreps_in2):
            for k, ek in enumerate(tp.irreps_out):
                if ek.ir in e1.ir * e2.ir:
                    e3nn_paths.append((i, j, k, e1.mul * e2.mul * ek.mul))
    offsets = {}
    off = 0
    for i, j, k, size in e3nn_paths:
        offsets[(i, j, k)] = (off, size)
        off += size
    total = off

    perm = np.empty(total, np.int64)
    pos = 0
    for k, (pk, ek) in enumerate(zip(tp.paths, tp.irreps_out)):
        for p in pk:
            o, size = offsets[(p.i, p.j, k)]
            perm[pos : pos + size] = np.arange(o, o + size)
            pos += size
    assert pos == total == tp.weight_numel
    return perm


def _convert_fc(sd: Dict, prefix: str, tp, tp_weights_layers: int = 2):
    """Reference FCBlock (Sequential, linears at indices 0,3,6,...) ->
    our FCBlock {Dense_i: {kernel,bias}, out_kernel, out_bias}."""
    out: Dict[str, Any] = {}
    n_linears = tp_weights_layers
    for li in range(n_linears - 1):
        w = sd.pop(f"{prefix}.{3 * li}.weight")
        b = sd.pop(f"{prefix}.{3 * li}.bias")
        out[f"Dense_{li}"] = {"kernel": _t(w), "bias": _n(b)}
    w = sd.pop(f"{prefix}.{3 * (n_linears - 1)}.weight")
    b = sd.pop(f"{prefix}.{3 * (n_linears - 1)}.bias")
    perm = tp_weight_permutation(tp)
    out["out_kernel"] = _t(w)[:, perm]
    out["out_bias"] = _n(b)[perm]
    return out


def _convert_sequential(sd: Dict, prefix: str, linear_idxs=(0, 3)):
    out = {}
    for di, li in enumerate(linear_idxs):
        out[f"Dense_{di}"] = {
            "kernel": _t(sd.pop(f"{prefix}.{li}.weight")),
            "bias": _n(sd.pop(f"{prefix}.{li}.bias")),
        }
    return out


def _convert_bn(sd: Dict, prefix: str):
    params = {
        "weight": _n(sd.pop(f"{prefix}.weight")),
        "bias": _n(sd.pop(f"{prefix}.bias")),
    }
    stats = {
        "mean": _n(sd.pop(f"{prefix}.running_mean")),
        "var": _n(sd.pop(f"{prefix}.running_var")),
    }
    sd.pop(f"{prefix}.num_batches_tracked", None)
    return params, stats


def _convert_atom_encoder(sd: Dict, prefix: str, has_fuse: bool):
    out: Dict[str, Any] = {}
    i = 0
    while f"{prefix}.atom_embedding_list.{i}.weight" in sd:
        out[f"cat_{i}"] = {
            "embedding": _n(sd.pop(f"{prefix}.atom_embedding_list.{i}.weight"))
        }
        i += 1
    if has_fuse and f"{prefix}.linear.weight" in sd:
        out["fuse"] = {
            "kernel": _t(sd.pop(f"{prefix}.linear.weight")),
            "bias": _n(sd.pop(f"{prefix}.linear.bias")),
        }
    return out


def convert_cg_state_dict(
    state_dict: Dict[str, Any],
    cfg,
) -> Tuple[Dict[str, Any], Dict[str, Any], Dict[str, List[str]]]:
    """Reference CGModel state dict -> (params, batch_stats, report).

    ``cfg``: our ScoreModelConfig matching the checkpoint hyperparameters.
    Returns a report with ``unconsumed`` (reference keys we did not map) and
    ``missing`` is implicitly checked by the caller loading the tree.
    """
    from diffdock_tpu.ops.irreps import Irreps, get_irrep_seq
    from diffdock_tpu.ops.tensor_product import FullyConnectedTensorProduct

    sd = {
        k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
        for k, v in state_dict.items()
    }
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    twl = cfg.tp_weights_layers
    irrep_seq = get_irrep_seq(
        cfg.ns, cfg.nv, cfg.use_second_order_repr, cfg.reduce_pseudoscalars
    )
    sh = str(Irreps.spherical_harmonics(cfg.sh_lmax))

    def ladder(i):
        return irrep_seq[min(i, len(irrep_seq) - 1)]

    # --- embeddings -----------------------------------------------------
    params["lig_node_embedding"] = _convert_atom_encoder(
        sd, "lig_node_embedding", has_fuse=True
    )
    params["rec_node_embedding"] = _convert_atom_encoder(
        sd, "rec_node_embedding", has_fuse=True
    )
    for name in (
        "lig_edge_embedding", "rec_edge_embedding", "rec_sigma_embedding",
        "cross_edge_embedding",
    ):
        if f"{name}.0.weight" in sd:
            params[name] = _convert_sequential(sd, name)

    # --- conv stacks ----------------------------------------------------
    def tp_for(i):
        return FullyConnectedTensorProduct(ladder(i), sh, ladder(i + 1))

    def convert_layer(ref, ours, tp, n_groups):
        p: Dict[str, Any] = {}
        if n_groups == 1:
            fc_prefixes = {"fc": f"{ref}.fc"}
        else:
            fc_prefixes = {
                f"fc_{g}": f"{ref}.fc.{g}" for g in range(n_groups)
            }
        for our_fc, ref_fc in fc_prefixes.items():
            if f"{ref_fc}.0.weight" in sd:
                p[our_fc] = _convert_fc(sd, ref_fc, tp, twl)
        if f"{ref}.batch_norm.weight" in sd:
            bn_p, bn_s = _convert_bn(sd, f"{ref}.batch_norm")
            p["bn"] = bn_p
            stats_key = ours
            stats.setdefault(stats_key, {})["bn"] = bn_s
        params[ours] = p

    for l in range(cfg.num_prot_emb_layers):
        convert_layer(f"rec_emb_layers.{l}", f"rec_emb_{l}", tp_for(l), 1)
        if f"lig_emb_layers.{l}.fc.0.weight" in sd or \
           f"lig_emb_layers.{l}.fc.0.0.weight" in sd:
            convert_layer(f"lig_emb_layers.{l}", f"lig_emb_{l}", tp_for(l), 1)
    n_groups = 4 if cfg.differentiate_convolutions else 1
    for l in range(cfg.num_conv_layers):
        convert_layer(
            f"conv_layers.{l}", f"conv_{l}",
            tp_for(cfg.num_prot_emb_layers + l), n_groups,
        )

    # --- heads ------------------------------------------------------------
    if cfg.confidence_mode:
        if "confidence_predictor.0.weight" in sd:
            # Dense-BN-ReLU-Drop x2 + Dense: linears at 0, 4, 8
            cp: Dict[str, Any] = {}
            li = 0
            idx = 0
            while f"confidence_predictor.{idx}.weight" in sd:
                w = sd.pop(f"confidence_predictor.{idx}.weight")
                b = sd.pop(f"confidence_predictor.{idx}.bias")
                if w.ndim == 2:
                    cp[f"Dense_{li}"] = {"kernel": _t(w), "bias": _n(b)}
                    li += 1
                else:  # 1D -> torch BatchNorm1d inside the MLP
                    cp[f"BatchNorm_{li - 1}"] = {
                        "scale": _n(w), "bias": _n(b),
                    }
                    stats.setdefault("confidence_predictor", {})[
                        f"BatchNorm_{li - 1}"
                    ] = {
                        "mean": _n(sd.pop(
                            f"confidence_predictor.{idx}.running_mean")),
                        "var": _n(sd.pop(
                            f"confidence_predictor.{idx}.running_var")),
                    }
                    sd.pop(f"confidence_predictor.{idx}.num_batches_tracked",
                           None)
                idx += 1
            params["confidence_predictor"] = cp
    else:
        if "center_edge_embedding.0.weight" in sd:
            params["center_edge_embedding"] = _convert_sequential(
                sd, "center_edge_embedding"
            )
        final_in = ladder(cfg.num_prot_emb_layers + cfg.num_conv_layers)
        tp_final = FullyConnectedTensorProduct(
            final_in, sh, "2x1o + 2x1e"
        )
        convert_layer("final_conv", "final_conv", tp_final, 1)
        for name in ("tr_final_layer", "rot_final_layer"):
            if f"{name}.0.weight" in sd:
                params[name] = _convert_sequential(sd, name, (0, 3))
        if not cfg.no_torsion and "final_edge_embedding.0.weight" in sd:
            params["final_edge_embedding"] = _convert_sequential(
                sd, "final_edge_embedding"
            )
            from diffdock_tpu.ops.tensor_product import FullTensorProduct
            ftp = FullTensorProduct(sh, "2e")
            tp_tor = FullyConnectedTensorProduct(
                final_in, str(ftp.irreps_out), f"{cfg.ns}x0o + {cfg.ns}x0e"
            )
            convert_layer("tor_bond_conv", "tor_bond_conv", tp_tor, 1)
            # tor_final_layer Sequential: Linear(0), Tanh(1), Dropout(2), Linear(3)
            params["tor_final_dense1"] = {
                "kernel": _t(sd.pop("tor_final_layer.0.weight")),
            }
            sd.pop("tor_final_layer.0.bias", None)
            params["tor_final_dense2"] = {
                "kernel": _t(sd.pop("tor_final_layer.3.weight")),
            }
            sd.pop("tor_final_layer.3.bias", None)

    report = {"unconsumed": sorted(sd.keys())}
    return params, stats, report


def load_torch_checkpoint(path: str, cfg):
    """torch.load a reference .pt checkpoint and convert (torch CPU wheel is
    in the image; weights_only-safe load)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "model" in raw:
        raw = raw["model"]
    state_dict = {
        k.replace("module.", ""): v for k, v in raw.items()
    }
    return convert_cg_state_dict(state_dict, cfg)
