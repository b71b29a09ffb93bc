"""Torch checkpoint converter: structural round-trip on a tiny config."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdock_tpu.data.complexes import bucket_sizes, pad_to, synthetic_complex
from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
from diffdock_tpu.models.config import ScoreModelConfig
from diffdock_tpu.models.score_model import CGScoreModel
from diffdock_tpu.ops.irreps import Irreps, get_irrep_seq
from diffdock_tpu.ops.tensor_product import FullyConnectedTensorProduct
from diffdock_tpu.utils.torch_import import (
    convert_cg_state_dict,
    tp_weight_permutation,
)

CFG = ScoreModelConfig(ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=1)


def expected_params():
    model = CGScoreModel(CFG)
    rng = np.random.RandomState(0)
    d = synthetic_complex(rng, n_lig=8, n_rec=16, n_bonds=2)
    nl, nr, nb = bucket_sizes(d.n_lig, d.n_rec, d.n_bonds)
    d = jax.tree.map(jnp.asarray, pad_to(d, nl, nr, nb))
    so3 = get_so3_tables(SO3Config(n_eps=64, x_n=256, l_max=512))
    torus = get_torus_tables(TorusConfig(x_n=256, sigma_n=128, mc_samples=2000))
    v = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), d, d.lig_pos, jnp.asarray(0.5),
        so3, torus,
    )
    return v["params"], v.get("batch_stats", {})


def synth_reference_state_dict(params, stats):
    """Build a torch-style state dict with the REFERENCE's naming scheme
    whose conversion should reproduce `params` (up to the documented
    transforms)."""
    rng = np.random.RandomState(0)
    sd = {}
    seq = get_irrep_seq(CFG.ns, CFG.nv, CFG.use_second_order_repr,
                        CFG.reduce_pseudoscalars)
    sh = str(Irreps.spherical_harmonics(CFG.sh_lmax))

    def ladder(i):
        return seq[min(i, len(seq) - 1)]

    def put_linear(ref_name, kernel, bias=None):
        sd[f"{ref_name}.weight"] = np.asarray(kernel).T.copy()
        if bias is not None:
            sd[f"{ref_name}.bias"] = np.asarray(bias).copy()

    def put_seq(ref, ours):
        put_linear(f"{ref}.0", ours["Dense_0"]["kernel"],
                   ours["Dense_0"]["bias"])
        put_linear(f"{ref}.3", ours["Dense_1"]["kernel"],
                   ours["Dense_1"]["bias"])

    def put_fc(ref, ours, tp):
        perm = tp_weight_permutation(tp)
        inv = np.argsort(perm)
        put_linear(f"{ref}.0", ours["Dense_0"]["kernel"],
                   ours["Dense_0"]["bias"])
        put_linear(f"{ref}.3", np.asarray(ours["out_kernel"])[:, inv],
                   np.asarray(ours["out_bias"])[inv])

    def put_bn(ref, ours, our_stats):
        sd[f"{ref}.weight"] = np.asarray(ours["weight"]).copy()
        sd[f"{ref}.bias"] = np.asarray(ours["bias"]).copy()
        sd[f"{ref}.running_mean"] = np.asarray(our_stats["mean"]).copy()
        sd[f"{ref}.running_var"] = np.asarray(our_stats["var"]).copy()

    # embeddings
    for side in ("lig", "rec"):
        enc = params[f"{side}_node_embedding"]
        for key, sub in enc.items():
            if key.startswith("cat_"):
                i = int(key.split("_")[1])
                sd[f"{side}_node_embedding.atom_embedding_list.{i}.weight"] = (
                    np.asarray(sub["embedding"]).copy()
                )
            elif key == "fuse":
                put_linear(f"{side}_node_embedding.linear",
                           sub["kernel"], sub["bias"])
    for name in ("lig_edge_embedding", "rec_edge_embedding",
                 "rec_sigma_embedding", "cross_edge_embedding",
                 "center_edge_embedding", "final_edge_embedding"):
        if name in params:
            put_seq(name, params[name])

    def rand_like(shape):
        return rng.randn(*shape).astype(np.float32)

    # conv stacks
    def tp_for(i):
        return FullyConnectedTensorProduct(ladder(i), sh, ladder(i + 1))

    for l in range(CFG.num_prot_emb_layers):
        for side, ref in (("rec", "rec_emb_layers"), ("lig", "lig_emb_layers")):
            ours = params[f"{side}_emb_{l}"]
            put_fc(f"{ref}.{l}.fc", ours["fc"], tp_for(l))
            put_bn(f"{ref}.{l}.batch_norm", ours["bn"],
                   stats[f"{side}_emb_{l}"]["bn"])
    for l in range(CFG.num_conv_layers):
        ours = params[f"conv_{l}"]
        tp = tp_for(CFG.num_prot_emb_layers + l)
        # last joint layer only has edges into the ligand -> fewer groups
        # (reference models/cg_model.py:427-430)
        groups = sorted(k for k in ours if k.startswith("fc_"))
        for g, key in enumerate(groups):
            put_fc(f"conv_layers.{l}.fc.{g}", ours[key], tp)
        put_bn(f"conv_layers.{l}.batch_norm", ours["bn"],
               stats[f"conv_{l}"]["bn"])

    # heads
    final_in = ladder(CFG.num_prot_emb_layers + CFG.num_conv_layers)
    tp_final = FullyConnectedTensorProduct(final_in, sh, "2x1o + 2x1e")
    put_fc("final_conv.fc", params["final_conv"]["fc"], tp_final)
    put_bn("final_conv.batch_norm", params["final_conv"]["bn"],
           stats["final_conv"]["bn"])
    for name in ("tr_final_layer", "rot_final_layer"):
        put_seq(name, params[name])
    from diffdock_tpu.ops.tensor_product import FullTensorProduct

    ftp = FullTensorProduct(sh, "2e")
    tp_tor = FullyConnectedTensorProduct(
        final_in, str(ftp.irreps_out), f"{CFG.ns}x0o + {CFG.ns}x0e"
    )
    put_fc("tor_bond_conv.fc", params["tor_bond_conv"]["fc"], tp_tor)
    put_bn("tor_bond_conv.batch_norm", params["tor_bond_conv"]["bn"],
           stats["tor_bond_conv"]["bn"])
    put_linear("tor_final_layer.0", params["tor_final_dense1"]["kernel"],
               np.zeros(params["tor_final_dense1"]["kernel"].shape[1]))
    put_linear("tor_final_layer.3", params["tor_final_dense2"]["kernel"],
               np.zeros(1))
    return sd


def _assert_trees_match(converted, expected, path=""):
    assert set(converted) == set(expected), (
        f"{path}: {set(converted) ^ set(expected)}"
    )
    for k in expected:
        e = expected[k]
        c = converted[k]
        if isinstance(e, dict):
            _assert_trees_match(c, e, f"{path}/{k}")
        else:
            assert tuple(np.shape(c)) == tuple(e.shape), (
                f"{path}/{k}: {np.shape(c)} != {e.shape}"
            )


def test_converter_structural_roundtrip():
    # random concrete params with the right structure
    shapes, stat_shapes = expected_params()
    rng = np.random.RandomState(3)
    concretize = lambda t: jax.tree.map(
        lambda s: rng.randn(*s.shape).astype(np.float32), t
    )
    params = concretize(shapes)
    stats = concretize(stat_shapes)

    sd = synth_reference_state_dict(params, stats)
    conv_params, conv_stats, report = convert_cg_state_dict(sd, CFG)

    assert report["unconsumed"] == [], report["unconsumed"]
    _assert_trees_match(conv_params, params)

    # values survive the transforms exactly (transpose/permutation inverses)
    flat_c = jax.tree_util.tree_leaves_with_path(conv_params)
    flat_e = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    for path, leaf in flat_c:
        np.testing.assert_allclose(
            leaf, np.asarray(flat_e[path]), atol=1e-6,
            err_msg=str(path),
        )

    # batch stats mapped too
    for layer in ("rec_emb_0", "conv_0", "conv_1", "final_conv"):
        np.testing.assert_allclose(
            conv_stats[layer]["bn"]["mean"], np.asarray(stats[layer]["bn"]["mean"])
        )


def test_import_weights_cli_end_to_end(tmp_path):
    """Full path: synthetic torch .pt -> CLI -> load_checkpoint -> forward."""
    import torch

    shapes, stat_shapes = expected_params()
    rng = np.random.RandomState(5)
    params = jax.tree.map(
        lambda s: rng.randn(*s.shape).astype(np.float32) * 0.1, shapes
    )
    stats = jax.tree.map(
        lambda s: np.abs(rng.randn(*s.shape).astype(np.float32)) * 0.1 + 0.5,
        stat_shapes,
    )
    sd = synth_reference_state_dict(params, stats)
    pt = tmp_path / "ref.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, pt)

    from diffdock_tpu.cli.import_weights import main as import_main

    out = tmp_path / "run"
    rc = import_main([
        "--torch_checkpoint", str(pt), "--out_dir", str(out),
        "--preset", "diffdock_s", "--ns", "8", "--nv", "2",
        "--num_conv_layers", "2", "--num_prot_emb_layers", "1",
    ])
    assert rc == 0

    from diffdock_tpu.train.checkpoints import load_checkpoint

    variables, cfg, _ = load_checkpoint(str(out))
    assert cfg.ns == 8

    # the imported weights run a forward
    model = CGScoreModel(cfg)
    r = np.random.RandomState(0)
    d = synthetic_complex(r, n_lig=8, n_rec=16, n_bonds=2)
    nl, nr, nb = bucket_sizes(d.n_lig, d.n_rec, d.n_bonds)
    d = jax.tree.map(jnp.asarray, pad_to(d, nl, nr, nb))
    so3 = get_so3_tables(SO3Config(n_eps=64, x_n=256, l_max=512))
    torus = get_torus_tables(TorusConfig(x_n=256, sigma_n=128,
                                         mc_samples=2000))
    out_score = jax.jit(
        lambda v, dd: model.apply(v, dd, dd.lig_pos, jnp.asarray(0.5),
                                  so3, torus)
    )(variables, d)
    assert np.isfinite(np.asarray(out_score.tr)).all()
