"""Benchmark harness (reference ``evaluate.py``): dock a test split with
known crystal poses, score symmetry-corrected RMSDs, print the metric table
and dump per-complex arrays.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def get_parser():
    p = argparse.ArgumentParser(description="diffdock_tpu evaluation")
    p.add_argument("--data_dir", required=True,
                   help="PDBBind-layout root (or MOAD root with --dataset moad)")
    p.add_argument("--dataset", default="pdbbind",
                   choices=["pdbbind", "moad"],
                   help="moad = DockGen-style eval with min RMSD over all "
                        "same-formula ground-truth poses in the cluster")
    p.add_argument("--split", default=None, help="file with complex names")
    p.add_argument("--model_dir", default=None)
    p.add_argument("--confidence_model_dir", default=None)
    p.add_argument("--model_preset", default="diffdock_s")
    p.add_argument("--samples_per_complex", type=int, default=10)
    p.add_argument("--inference_steps", type=int, default=20)
    p.add_argument("--actual_steps", type=int, default=19)
    p.add_argument("--limit_complexes", type=int, default=0)
    p.add_argument("--out_dir", default="results/evaluation")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cache_path", default="data/cache_tpu")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)

    from diffdock_tpu.cli.dock import load_pipeline
    from diffdock_tpu.data.chem import read_molecule_file
    from diffdock_tpu.data.datasets import (
        ComplexDataset, DatasetConfig, pdbbind_specs,
    )
    from diffdock_tpu.eval.metrics import compute_metric_table
    from diffdock_tpu.eval.rmsd import molecular_automorphisms, symmetry_rmsd

    dock_args = argparse.Namespace(
        model_dir=args.model_dir,
        confidence_model_dir=args.confidence_model_dir,
        model_preset=args.model_preset,
        inference_steps=args.inference_steps,
        actual_steps=args.actual_steps,
        no_final_step_noise=True, ode=False, no_random=False,
        initial_noise_std_proportion=1.4601642460337794,
        compute_dtype=args.compute_dtype,
    )
    pipeline = load_pipeline(dock_args)

    from diffdock_tpu.eval.metrics import min_self_distances

    if args.dataset == "moad":
        from diffdock_tpu.data.moad import MOADConfig, MOADDataset

        moad = MOADDataset(MOADConfig(
            moad_dir=args.data_dir, cache_dir=args.cache_path,
            split="test", limit_complexes=args.limit_complexes,
        ))
        moad.preprocess()
        eval_names = moad.names
        get_data = moad.get_by_name
        get_mol = lambda name: read_molecule_file(
            os.path.join(moad._ligand_dir(), name + ".pdb")
        ).remove_hs()
        # DockGen metric: min over all same-formula ground truths
        # (reference evaluate.py:474-484)
        get_refs = moad.alternative_ground_truths
    else:
        specs = pdbbind_specs(args.data_dir, args.split)
        if args.limit_complexes:
            specs = specs[: args.limit_complexes]
        ds = ComplexDataset(specs, DatasetConfig(cache_dir=args.cache_path))
        ds.preprocess()
        spec_by_name = {s.name: s for s in specs}
        eval_names = ds.names
        get_data = ds.get
        get_mol = lambda name: read_molecule_file(
            spec_by_name[name].ligand_path
        ).remove_hs()
        get_refs = None
    print(f"evaluating {len(eval_names)} complexes")

    names, rmsd_rows, centroid_rows, run_times, clash_rows = [], [], [], [], []
    for name in eval_names:
        data = get_data(name)
        if data is None:
            continue
        t0 = time.time()
        try:
            result = pipeline.dock_complex(
                data, num_poses=args.samples_per_complex, seed=args.seed
            )
        except Exception as e:  # noqa: BLE001 — skip-and-continue
            print(f"[{name}] failed: {type(e).__name__}: {e}")
            continue
        run_times.append(time.time() - t0)

        mol = get_mol(name)
        bonds = [(i, j) for i, j, _ in mol.bonds]
        perms = molecular_automorphisms(mol.elements, bonds)
        ordered = result.poses[result.order]
        if get_refs is not None:
            refs = get_refs(name)
        else:
            refs = [np.asarray(data.lig_pos) + np.asarray(data.original_center)]
        rmsds = np.min(
            [symmetry_rmsd(r, ordered, mol.elements, bonds, perms=perms)
             for r in refs],
            axis=0,
        )
        centroids = np.min(
            [np.linalg.norm(ordered.mean(axis=1) - r.mean(axis=0), axis=-1)
             for r in refs],
            axis=0,
        )
        clash_rows.append(
            [min_self_distances(p, bonds) for p in ordered]
        )
        names.append(name)
        rmsd_rows.append(rmsds)
        centroid_rows.append(centroids)
        print(f"[{name}] top-1 rmsd {rmsds[0]:.2f} A ({run_times[-1]:.1f}s)")

    os.makedirs(args.out_dir, exist_ok=True)
    rmsds = np.asarray(rmsd_rows)
    centroids = np.asarray(centroid_rows)
    np.save(os.path.join(args.out_dir, "rmsds.npy"), rmsds)
    np.save(os.path.join(args.out_dir, "centroid_distances.npy"), centroids)
    np.save(os.path.join(args.out_dir, "run_times.npy"), np.asarray(run_times))
    np.save(os.path.join(args.out_dir, "names.npy"), np.asarray(names))
    np.save(os.path.join(args.out_dir, "min_self_distances.npy"),
            np.asarray(clash_rows))

    table = compute_metric_table(rmsds, centroids, np.asarray(run_times))
    if clash_rows:
        # steric clash proxy (reference evaluate.py:486-505)
        table["steric_clash_fraction"] = float(
            (np.asarray(clash_rows)[:, 0] < 0.4).mean() * 100
        )
    with open(os.path.join(args.out_dir, "metrics.json"), "w") as f:
        json.dump(table, f, indent=2)
    print(json.dumps(table, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
