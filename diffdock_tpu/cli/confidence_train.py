"""Confidence-model training CLI (reference ``confidence/confidence_train.py``).

Two phases:
1. pose generation: run the (trained) score model over the training split,
   ``samples_per_complex`` poses each, label with RMSD vs crystal
   (cached npz per complex, like the reference's ligand_positions pickles,
   ``confidence/dataset.py:82-155``);
2. BCE training of the confidence classifier on (pose, rmsd < cutoff).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from pathlib import Path

import numpy as np


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", default=None)
    p.add_argument("--split_train", default=None)
    p.add_argument("--score_model_dir", default=None)
    p.add_argument("--log_dir", default="workdir/confidence_model")
    p.add_argument("--cache_path", default="data/cache_tpu")
    p.add_argument("--pose_cache", default="data/confidence_poses")
    p.add_argument("--samples_per_complex", type=int, default=8)
    p.add_argument("--cache_id", type=int, default=None,
                   help="tag generated pose files as {name}.id{N}.npz so "
                        "several partial generation runs can accumulate "
                        "(reference cache_creation_id, "
                        "confidence/dataset.py:85)")
    p.add_argument("--cache_ids_to_combine", type=int, nargs="+",
                   default=None,
                   help="skip generation; train on the union of the given "
                        "cache ids' pose files, poses concatenated per "
                        "complex (reference confidence/dataset.py:133-155)")
    p.add_argument("--inference_steps", type=int, default=8)
    p.add_argument("--rmsd_classification_cutoff", type=float, nargs="+",
                   default=[2.0],
                   help="one cutoff -> BCE; several -> CE over RMSD bins")
    p.add_argument("--rmsd_prediction", action="store_true", default=False,
                   help="regress RMSD instead of classifying")
    p.add_argument("--n_epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--all_atoms", action="store_true", default=False)
    p.add_argument("--ns", type=int, default=16)
    p.add_argument("--nv", type=int, default=4)
    p.add_argument("--num_conv_layers", type=int, default=2)
    p.add_argument("--num_prot_emb_layers", type=int, default=0)
    p.add_argument("--limit_complexes", type=int, default=0)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_parallel", type=int, default=1,
                   help="shard phase-2 confidence TRAINING batches over "
                        "this many devices (data-parallel mesh, pmean "
                        "gradient sync, globally-aggregated batch norm). "
                        "0 = all visible devices; 1 (default) = "
                        "single-device")
    p.add_argument("--pose_devices", type=int, default=1,
                   help="shard pose GENERATION (phase 1 — the score-model "
                        "sweep over the train split, the longest "
                        "preprocessing job, reference "
                        "confidence/dataset.py:212-273) over this many "
                        "devices (1-axis jax mesh). 0 = all visible "
                        "devices; 1 (default) = single-device")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    from diffdock_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from diffdock_tpu.data.complexes import pad_to, synthetic_complex
    from diffdock_tpu.diffusion.so3 import get_so3_tables
    from diffdock_tpu.diffusion.torus import get_torus_tables
    from diffdock_tpu.inference.pipeline import DockingPipeline
    from diffdock_tpu.inference.sampler import SamplerConfig
    from diffdock_tpu.models.config import PRESETS, ScoreModelConfig
    from diffdock_tpu.models.factory import build_model
    from diffdock_tpu.train.checkpoints import load_checkpoint, save_checkpoint
    from diffdock_tpu.train.confidence import (
        ConfidenceTrainConfig,
        generate_poses_for_complex,
        load_pose_cache,
        make_confidence_train_step,
        pose_cache_file,
    )
    from diffdock_tpu.train.trainer import training_model_config

    so3 = get_so3_tables()
    torus = get_torus_tables()

    # --- score model (pose generator) ---
    if args.score_model_dir:
        sp, score_cfg, _ = load_checkpoint(args.score_model_dir)
    else:
        print("WARNING: random score-model weights (pose labels still valid)")
        score_cfg = ScoreModelConfig(
            ns=args.ns, nv=args.nv, num_conv_layers=args.num_conv_layers,
            num_prot_emb_layers=args.num_prot_emb_layers,
        )
        model = build_model(score_cfg)
        d0 = synthetic_complex(np.random.RandomState(0))
        sp = jax.jit(model.init)(
            jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, d0),
            jnp.asarray(d0.lig_pos), jnp.asarray(0.5), so3, torus,
        )
    mesh = None
    n_dev = args.pose_devices
    if n_dev == 0:
        n_dev = len(jax.devices())
    if n_dev > 1:
        from diffdock_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_dev)
    pipeline = DockingPipeline(
        score_cfg, sp,
        SamplerConfig(
            inference_steps=args.inference_steps,
            actual_steps=args.inference_steps,
        ),
        so3_tables=so3, torus_tables=torus, mesh=mesh,
    )

    # --- dataset (AAComplexData when --all_atoms: the reference's default
    # confidence architecture is all-atom, inference.py:84) ---
    from diffdock_tpu.data.complexes import AAComplexData, pad_aa_to

    if args.synthetic:
        rng = np.random.RandomState(args.seed)
        if args.all_atoms:
            from diffdock_tpu.data.complexes import synthetic_aa_complex

            raw = [
                synthetic_aa_complex(rng, n_lig=12, n_rec=32, n_bonds=3)
                for _ in range(args.synthetic)
            ]
            datas = {
                str(i): pad_aa_to(d, 16, 64, 8, 256)
                for i, d in enumerate(raw)
            }
        else:
            raw = [
                synthetic_complex(rng, n_lig=12, n_rec=32, n_bonds=3)
                for _ in range(args.synthetic)
            ]
            datas = {str(i): pad_to(d, 16, 64, 8) for i, d in enumerate(raw)}
        topo = {str(i): None for i in range(len(raw))}
    else:
        from diffdock_tpu.data.chem import read_molecule_file
        from diffdock_tpu.data.complexes import bucket_sizes
        from diffdock_tpu.data.datasets import (
            ComplexDataset, DatasetConfig, pdbbind_specs,
        )

        specs = pdbbind_specs(args.data_dir, args.split_train)
        if args.limit_complexes:
            specs = specs[: args.limit_complexes]
        ds = ComplexDataset(specs, DatasetConfig(
            cache_dir=args.cache_path, all_atoms=args.all_atoms,
        ))
        ds.preprocess()
        datas = {n: ds.get(n) for n in ds.names}
        # pad every complex to shared buckets so one compilation serves all
        if datas:
            bases = {
                n: (d.base if isinstance(d, AAComplexData) else d)
                for n, d in datas.items()
            }
            buckets = [
                bucket_sizes(b.n_lig, b.n_rec, b.n_bonds)
                for b in bases.values()
            ]
            nl, nr, nb = (max(b[i] for b in buckets) for i in range(3))
            # normalize data-dependent widths (max bond degree, kNN column
            # counts) across complexes so the later jnp.stack batches mixed
            # molecules (same fix as loaders._stack / dock_batch)
            kb = max(4, *(b.lig_bond_nbr.shape[1] for b in bases.values()))
            kr = max(b.rec_nbr.shape[1] for b in bases.values())
            if args.all_atoms:
                na = max(
                    ((d.n_atoms + 255) // 256) * 256 for d in datas.values()
                )
                ka = max(
                    np.asarray(d.atom_nbr).shape[1] for d in datas.values()
                )
                ar = max(
                    np.asarray(d.res_atom_idx).shape[1]
                    for d in datas.values()
                )
                datas = {
                    n: pad_aa_to(d, nl, nr, nb, na,
                                 kb=kb, kr=kr, ka=ka, ar=ar)
                    for n, d in datas.items()
                }
            else:
                datas = {
                    n: pad_to(d, nl, nr, nb, kb=kb, kr=kr)
                    for n, d in datas.items()
                }
        topo = {}
        for s in specs:
            if s.name in datas:
                mol = read_molecule_file(s.ligand_path).remove_hs()
                topo[s.name] = (mol.elements, [(i, j) for i, j, _ in mol.bonds])

    # --- phase 1: generate poses + rmsd labels ---
    pose_cache = Path(args.pose_cache)
    pose_cache.mkdir(parents=True, exist_ok=True)
    samples = {}
    for i, (name, data) in enumerate(datas.items()):
        if args.cache_ids_to_combine is not None:
            got = load_pose_cache(pose_cache, name, args.cache_ids_to_combine)
            if got is None:
                raise FileNotFoundError(
                    f"no pose cache for '{name}' under any of cache ids "
                    f"{args.cache_ids_to_combine} in {pose_cache}"
                )
            samples[name] = got
            continue
        got = load_pose_cache(pose_cache, name,
                              None if args.cache_id is None
                              else [args.cache_id])
        if got is not None:
            samples[name] = got
            continue
        el_bonds = topo.get(name)
        gen_data = data.base if isinstance(data, AAComplexData) else data
        # fold cache_id into the seed so each accumulation run generates
        # genuinely new poses
        poses, rmsds = generate_poses_for_complex(
            pipeline, gen_data, args.samples_per_complex,
            seed=args.seed + i + 7919 * (args.cache_id or 0),
            elements=None if el_bonds is None else el_bonds[0],
            bonds=None if el_bonds is None else el_bonds[1],
        )
        np.savez_compressed(
            pose_cache_file(pose_cache, name, args.cache_id),
            poses=poses, rmsds=rmsds,
        )
        samples[name] = (poses, rmsds)
        print(f"[{name}] generated {len(rmsds)} poses, "
              f"min rmsd {rmsds.min():.2f}")

    # --- phase 2: train the confidence classifier ---
    tcfg = ConfidenceTrainConfig(
        rmsd_classification_cutoff=tuple(args.rmsd_classification_cutoff),
        rmsd_prediction=args.rmsd_prediction,
        samples_per_complex=args.samples_per_complex, lr=args.lr,
    )
    dp_dev = args.data_parallel
    if dp_dev == 0:
        dp_dev = len(jax.devices())
    conf_cfg = training_model_config(
        ScoreModelConfig(
            ns=args.ns, nv=args.nv, num_conv_layers=args.num_conv_layers,
            num_prot_emb_layers=args.num_prot_emb_layers,
            confidence_mode=True, all_atoms=args.all_atoms,
            num_confidence_outputs=tcfg.num_outputs,
        ),
        data_parallel=dp_dev > 1,
    )
    conf_model = build_model(conf_cfg)
    name0 = next(iter(datas))
    d0 = jax.tree.map(jnp.asarray, datas[name0])
    d0_base = d0.base if isinstance(d0, AAComplexData) else d0
    variables = jax.jit(conf_model.init)(
        jax.random.PRNGKey(args.seed), d0,
        jnp.asarray(samples[name0][0][0]) - d0_base.original_center,
        jnp.asarray(0.0), so3, torus,
    )
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    if dp_dev > 1:
        from diffdock_tpu.parallel.mesh import (
            make_mesh,
            shard_confidence_train_step,
        )
        from diffdock_tpu.train.trainer import DP_AXIS

        train_step, tx = make_confidence_train_step(
            conf_model, tcfg, so3, torus, dp_axis=DP_AXIS
        )
        train_step = shard_confidence_train_step(train_step, make_mesh(dp_dev))
    else:
        train_step, tx = make_confidence_train_step(
            conf_model, tcfg, so3, torus
        )
        train_step = jax.jit(train_step)
    opt_state = tx.init(params)
    # sharded batches need a leading dim divisible by the mesh size; wrap
    # indices to fill the last partial batch (duplicates are harmless)
    step_bs = -(-args.batch_size // dp_dev) * dp_dev

    names = list(datas.keys())
    rng_np = np.random.RandomState(args.seed)
    os.makedirs(args.log_dir, exist_ok=True)
    from diffdock_tpu.utils.logging import MetricsWriter

    metrics_log = MetricsWriter(os.path.join(args.log_dir, "metrics.jsonl"))
    for epoch in range(args.n_epochs):
        order = rng_np.permutation(len(names))
        losses, accs = [], []
        for start in range(0, len(order), step_bs):
            idx = order[start : start + step_bs]
            if len(idx) % dp_dev:
                idx = np.resize(idx, step_bs)
            batch_names = [names[j] for j in idx]
            stacked = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[datas[n] for n in batch_names]
            )
            pose_sel = [
                rng_np.randint(samples[n][0].shape[0]) for n in batch_names
            ]
            def center_of(d):
                b = d.base if isinstance(d, AAComplexData) else d
                return jnp.asarray(b.original_center)

            poses = jnp.stack([
                jnp.asarray(samples[n][0][k]) - center_of(datas[n])
                for n, k in zip(batch_names, pose_sel)
            ])
            labels = jnp.asarray(tcfg.labels_from_rmsds([
                samples[n][1][k] for n, k in zip(batch_names, pose_sel)
            ]))
            params, batch_stats, opt_state, m = train_step(
                params, batch_stats, opt_state, (stacked, poses, labels),
                jax.random.PRNGKey(epoch * 1000 + start),
            )
            losses.append(float(m["loss"]))
            accs.append(float(m["accuracy"]))
        kind = "mse" if tcfg.rmsd_prediction else (
            "bce" if tcfg.num_outputs == 1 else "ce")
        print(f"epoch {epoch}: {kind} {np.mean(losses):.4f} "
              f"acc {np.mean(accs):.3f}")
        metrics_log.log(epoch, "train", loss=float(np.mean(losses)),
                        accuracy=float(np.mean(accs)), kind=kind)
        save_checkpoint(
            args.log_dir, {"params": params, "batch_stats": batch_stats},
            conf_cfg, extra={"epoch": epoch},
            weights_name="last_model.msgpack",
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
