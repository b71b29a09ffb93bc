"""Torch checkpoint converters: structural round-trips for all four
reference architectures (new/old x CG/AA) on tiny configs.

Each test materializes OUR parameter tree (eval_shape on model.init), emits
a torch-style state dict with the REFERENCE's exact naming scheme that
should convert back to it, and asserts: every reference key consumed, every
target parameter produced, and values surviving the transforms exactly.
Numerical semantics (does the converted model compute what the torch model
computes?) are covered separately in test_e3nn_parity.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffdock_tpu.data.complexes import (
    bucket_sizes,
    pad_to,
    synthetic_aa_complex,
    synthetic_complex,
)
from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
from diffdock_tpu.models.config import ScoreModelConfig
from diffdock_tpu.models.factory import build_model
from diffdock_tpu.models.score_model import CGScoreModel
from diffdock_tpu.ops.irreps import Irreps, get_irrep_seq
from diffdock_tpu.ops.tensor_product import FullTensorProduct, FullyConnectedTensorProduct
from diffdock_tpu.utils.torch_import import (
    convert_state_dict,
    faster_weight_permutation,
    tp_weight_permutation,
)

CFG = ScoreModelConfig(ns=8, nv=2, num_conv_layers=2, num_prot_emb_layers=1)
SO3_SMALL = SO3Config(n_eps=64, x_n=256, l_max=512)
TORUS_SMALL = TorusConfig(x_n=256, sigma_n=128, mc_samples=2000)


def expected_params(cfg):
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    if cfg.all_atoms:
        d = synthetic_aa_complex(rng, n_lig=8, n_rec=12, n_bonds=2,
                                 atoms_per_res=3, lm_dim=cfg.lm_embedding_dim)
        pos = d.base.lig_pos
    else:
        d = synthetic_complex(rng, n_lig=8, n_rec=16, n_bonds=2,
                              lm_dim=cfg.lm_embedding_dim)
        pos = d.lig_pos
    d = jax.tree.map(jnp.asarray, d)
    so3 = get_so3_tables(SO3_SMALL)
    torus = get_torus_tables(TORUS_SMALL)
    v = jax.eval_shape(
        model.init, jax.random.PRNGKey(0), d, pos, jnp.asarray(0.5),
        so3, torus,
    )
    return v["params"], v.get("batch_stats", {})


class RefSD:
    """Builds a reference-style state dict from our parameter tree."""

    def __init__(self, params, stats, cfg, old: bool):
        self.sd = {}
        self.params = params
        self.stats = stats
        self.cfg = cfg
        self.old = old
        self.seq_irreps = get_irrep_seq(
            cfg.ns, cfg.nv, cfg.use_second_order_repr,
            False if old else cfg.reduce_pseudoscalars,
        )
        self.sh = str(Irreps.spherical_harmonics(cfg.sh_lmax))
        self.faster = (not old) and cfg.sh_lmax == 1 and not cfg.use_second_order_repr

    def ladder(self, i):
        return self.seq_irreps[min(i, len(self.seq_irreps) - 1)]

    def tp_for(self, i):
        return FullyConnectedTensorProduct(
            self.ladder(i), self.sh, self.ladder(i + 1)
        )

    def put_linear(self, ref, kernel, bias=None):
        self.sd[f"{ref}.weight"] = np.asarray(kernel).T.copy()
        if bias is not None:
            self.sd[f"{ref}.bias"] = np.asarray(bias).copy()

    def put_seq(self, ref, name=None):
        ours = self.params[name or ref]
        self.put_linear(f"{ref}.0", ours["Dense_0"]["kernel"],
                        ours["Dense_0"]["bias"])
        self.put_linear(f"{ref}.3", ours["Dense_1"]["kernel"],
                        ours["Dense_1"]["bias"])

    def put_fc(self, ref, ours, tp, faster=False):
        perm = (faster_weight_permutation(tp) if faster
                else tp_weight_permutation(tp))
        inv = np.argsort(perm)
        self.put_linear(f"{ref}.0", ours["Dense_0"]["kernel"],
                        ours["Dense_0"]["bias"])
        self.put_linear(f"{ref}.3", np.asarray(ours["out_kernel"])[:, inv],
                        np.asarray(ours["out_bias"])[inv])

    def put_bn(self, ref, ours, our_stats):
        self.sd[f"{ref}.weight"] = np.asarray(ours["weight"]).copy()
        self.sd[f"{ref}.bias"] = np.asarray(ours["bias"]).copy()
        self.sd[f"{ref}.running_mean"] = np.asarray(our_stats["mean"]).copy()
        self.sd[f"{ref}.running_var"] = np.asarray(our_stats["var"]).copy()

    def put_encoder(self, name):
        enc = self.params[name]
        for key, sub in enc.items():
            if key.startswith("cat_"):
                i = int(key.split("_")[1])
                self.sd[f"{name}.atom_embedding_list.{i}.weight"] = (
                    np.asarray(sub["embedding"]).copy()
                )
            elif key == "fuse":
                self.put_linear(f"{name}.additional_features_embedder",
                                sub["kernel"], sub["bias"])
            elif key in ("linear", "lm_embedding_layer"):
                self.put_linear(f"{name}.{key}", sub["kernel"], sub["bias"])

    def put_conv(self, ref, ours_name, tp, faster=False):
        ours = self.params[ours_name]
        groups = sorted(
            (k for k in ours if k.startswith("fc_") and k != "fc_shared"),
            key=lambda s: int(s.split("_")[1]),
        )
        if groups:
            for g, key in enumerate(groups):
                self.put_fc(f"{ref}.fc.{g}", ours[key], tp, faster)
        else:
            key = "fc" if "fc" in ours else "fc_shared"
            self.put_fc(f"{ref}.fc", ours[key], tp, faster)
        if "bn" in ours:
            self.put_bn(f"{ref}.batch_norm", ours["bn"],
                        self.stats[ours_name]["bn"])

    def put_confidence_mlp(self, ref, name=None):
        ours = self.params[name or ref]
        st = self.stats.get(name or ref, {})
        idx = 0
        li = 0
        while f"Dense_{li}" in ours:
            self.put_linear(f"{ref}.{idx}", ours[f"Dense_{li}"]["kernel"],
                            ours[f"Dense_{li}"]["bias"])
            bn = f"BatchNorm_{li}"
            if bn in ours:
                self.sd[f"{ref}.{idx + 1}.weight"] = np.asarray(
                    ours[bn]["scale"]).copy()
                self.sd[f"{ref}.{idx + 1}.bias"] = np.asarray(
                    ours[bn]["bias"]).copy()
                self.sd[f"{ref}.{idx + 1}.running_mean"] = np.asarray(
                    st[bn]["mean"]).copy()
                self.sd[f"{ref}.{idx + 1}.running_var"] = np.asarray(
                    st[bn]["var"]).copy()
            idx += 4
            li += 1

    def put_score_heads(self):
        cfg = self.cfg
        npe = 0 if self.old else cfg.num_prot_emb_layers
        final_in = self.ladder(npe + cfg.num_conv_layers)
        self.put_seq("center_edge_embedding")
        tp_final = FullyConnectedTensorProduct(final_in, self.sh, "2x1o + 2x1e")
        self.put_conv("final_conv", "final_conv", tp_final)
        self.put_seq("tr_final_layer")
        self.put_seq("rot_final_layer")
        self.put_seq("final_edge_embedding")
        ftp = FullTensorProduct(self.sh, "2e")
        tp_tor = FullyConnectedTensorProduct(
            final_in, str(ftp.irreps_out), f"{cfg.ns}x0o + {cfg.ns}x0e"
        )
        self.put_conv("tor_bond_conv", "tor_bond_conv", tp_tor)
        self.put_linear("tor_final_layer.0",
                        self.params["tor_final_dense1"]["kernel"])
        self.put_linear("tor_final_layer.3",
                        self.params["tor_final_dense2"]["kernel"])


def build_ref_sd(params, stats, cfg):
    old = cfg.old_architecture
    r = RefSD(params, stats, cfg, old)
    r.put_encoder("lig_node_embedding")
    r.put_encoder("rec_node_embedding")
    if cfg.all_atoms:
        r.put_encoder("atom_node_embedding")
    seqs = ["lig_edge_embedding", "rec_edge_embedding"]
    if cfg.all_atoms:
        seqs += ["atom_edge_embedding", "lr_edge_embedding",
                 "ar_edge_embedding", "la_edge_embedding"]
        if not old:
            seqs += ["rec_sigma_embedding"]
    else:
        seqs += ["cross_edge_embedding"]
        if not old:
            seqs += ["rec_sigma_embedding"]
    for s in seqs:
        if s in params:
            r.put_seq(s)

    if old:
        # the reference constructs receiver-side convs it never calls on the
        # last layer; emit them (shapes cloned from the used sibling) so the
        # converter's consume-and-drop path is exercised
        if cfg.all_atoms:
            for i in range(9 * cfg.num_conv_layers):
                src = f"conv_{i}" if f"conv_{i}" in params else f"conv_{9 * (i // 9)}"
                r.put_conv(f"conv_layers.{i}", src, r.tp_for(i // 9))
        else:
            for stack, our in (
                ("lig_conv_layers", "lig_conv"),
                ("rec_conv_layers", "rec_conv"),
                ("lig_to_rec_conv_layers", "lig_to_rec_conv"),
                ("rec_to_lig_conv_layers", "rec_to_lig_conv"),
            ):
                for l in range(cfg.num_conv_layers):
                    src = (f"{our}_{l}" if f"{our}_{l}" in params
                           else f"lig_conv_{l}")
                    r.put_conv(f"{stack}.{l}", src, r.tp_for(l))
    else:
        for l in range(cfg.num_prot_emb_layers):
            r.put_conv(f"rec_emb_layers.{l}", f"rec_emb_{l}", r.tp_for(l),
                       r.faster)
            if f"lig_emb_{l}" in params:
                r.put_conv(f"lig_emb_layers.{l}", f"lig_emb_{l}", r.tp_for(l),
                           r.faster)
        for l in range(cfg.num_conv_layers):
            r.put_conv(f"conv_layers.{l}", f"conv_{l}",
                       r.tp_for(cfg.num_prot_emb_layers + l), r.faster)

    if cfg.confidence_mode:
        r.put_confidence_mlp("confidence_predictor")
        if "atom_confidence_predictor" in params:
            r.put_confidence_mlp("atom_confidence_predictor")
        if "affinity_predictor" in params:
            r.put_confidence_mlp("affinity_predictor")
    else:
        r.put_score_heads()
    return r.sd


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
            assert tuple(np.shape(c)) == tuple(np.shape(e)), (
                f"{path}/{k}: {np.shape(c)} != {np.shape(e)}"
            )


def _roundtrip(cfg):
    shapes, stat_shapes = expected_params(cfg)
    rng = np.random.RandomState(3)
    concretize = lambda t: jax.tree.map(
        lambda s: rng.randn(*s.shape).astype(np.float32), t
    )
    params = concretize(shapes)
    stats = concretize(stat_shapes)
    sd = build_ref_sd(params, stats, cfg)
    conv_params, conv_stats, report = convert_state_dict(sd, cfg)
    assert report["unconsumed"] == [], report["unconsumed"]
    _assert_trees_match(conv_params, params)
    flat_e = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    for path, leaf in jax.tree_util.tree_leaves_with_path(conv_params):
        np.testing.assert_allclose(
            leaf, np.asarray(flat_e[path]), atol=1e-6, err_msg=str(path)
        )
    return conv_stats, stats


def test_converter_structural_roundtrip_cg():
    conv_stats, stats = _roundtrip(CFG)
    for layer in ("rec_emb_0", "conv_0", "conv_1", "final_conv"):
        np.testing.assert_allclose(
            conv_stats[layer]["bn"]["mean"],
            np.asarray(stats[layer]["bn"]["mean"]),
        )


def test_converter_structural_roundtrip_aa_confidence():
    cfg = dataclasses.replace(
        CFG, all_atoms=True, confidence_mode=True, lm_embedding_dim=16,
    )
    _roundtrip(cfg)


def test_converter_structural_roundtrip_old_cg():
    cfg = ScoreModelConfig(
        ns=8, nv=2, num_conv_layers=2, old_architecture=True,
        fixed_center_conv=False,
    )
    _roundtrip(cfg)


def test_converter_structural_roundtrip_old_aa_confidence():
    """The shipped default confidence architecture (old AA, with ESM)."""
    cfg = ScoreModelConfig(
        ns=8, nv=2, num_conv_layers=3, old_architecture=True,
        all_atoms=True, confidence_mode=True, lm_embedding_dim=16,
    )
    _roundtrip(cfg)


def test_converter_structural_roundtrip_faster_sh1():
    """sh_lmax=1 models use FasterTensorProduct's weight layout
    (tensor_layers.py:295-299)."""
    cfg = dataclasses.replace(CFG, sh_lmax=1)
    _roundtrip(cfg)


def test_faster_permutation_matches_layout():
    """For ladder-ordered irreps the Faster layout equals ours (identity);
    for reordered outputs it must not."""
    sh = "1x0e + 1x1o"
    tp = FullyConnectedTensorProduct("8x0e + 2x1o + 2x1e + 8x0o", sh,
                                     "8x0e + 2x1o + 2x1e + 8x0o")
    np.testing.assert_array_equal(
        faster_weight_permutation(tp), np.arange(tp.weight_numel)
    )
    tp2 = FullyConnectedTensorProduct("8x0e + 2x1o", sh, "2x1o + 8x0e")
    perm = faster_weight_permutation(tp2)
    assert not np.array_equal(perm, np.arange(tp2.weight_numel))
    assert sorted(perm) == list(range(tp2.weight_numel))


def test_import_weights_cli_end_to_end(tmp_path):
    """Full path: synthetic torch .pt -> CLI -> load_checkpoint -> forward."""
    import torch

    shapes, stat_shapes = expected_params(CFG)
    rng = np.random.RandomState(5)
    params = jax.tree.map(
        lambda s: rng.randn(*s.shape).astype(np.float32) * 0.1, shapes
    )
    stats = jax.tree.map(
        lambda s: np.abs(rng.randn(*s.shape).astype(np.float32)) * 0.1 + 0.5,
        stat_shapes,
    )
    sd = build_ref_sd(params, stats, CFG)
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
    # YAML round-trip must keep the config hashable (tuples, not lists) —
    # flax modules are jit-static, so an unhashable cfg breaks every jit
    # of a checkpoint-loaded model
    hash(cfg)
    assert isinstance(cfg.parallel_aggregators, tuple)

    model = CGScoreModel(cfg)
    r = np.random.RandomState(0)
    d = synthetic_complex(r, n_lig=8, n_rec=16, n_bonds=2)
    nl, nr, nb = bucket_sizes(d.n_lig, d.n_rec, d.n_bonds)
    d = jax.tree.map(jnp.asarray, pad_to(d, nl, nr, nb))
    so3 = get_so3_tables(SO3_SMALL)
    torus = get_torus_tables(TORUS_SMALL)
    out_score = jax.jit(
        lambda v, dd: model.apply(v, dd, dd.lig_pos, jnp.asarray(0.5),
                                  so3, torus)
    )(variables, d)
    assert np.isfinite(np.asarray(out_score.tr)).all()
