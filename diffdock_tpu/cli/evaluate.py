"""Benchmark harness (reference ``evaluate.py``): dock a test split with
known crystal poses, score symmetry-corrected RMSDs, print the metric table
and dump per-complex arrays.

Covers the reference's dataset modes (pdbbind / posebusters / custom
protein+ligand file names / moad-DockGen, ``evaluate.py:36-87``,
``datasets/pdbbind.py:392-404``), gnina-in-the-loop rescoring
(``evaluate.py:434-472``), and the batch-halving retry recovery
(``evaluate.py:523-540``).
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
                   choices=["pdbbind", "posebusters", "moad"],
                   help="posebusters = {name}_protein.pdb/{name}_ligand.sdf "
                        "layout with min-RMSD over all poses in "
                        "{name}_ligands.sdf; moad = DockGen-style eval with "
                        "min RMSD over all same-formula ground-truth poses")
    p.add_argument("--split", default=None, help="file with complex names")
    p.add_argument("--protein_file", default=None,
                   help="protein file stem, e.g. 'protein_processed' -> "
                        "{name}_protein_processed.pdb (reference "
                        "evaluate.py --protein_file)")
    p.add_argument("--ligand_file", default=None,
                   help="ligand file stem, e.g. 'ligand' -> {name}_ligand.sdf")
    p.add_argument("--model_dir", default=None)
    p.add_argument("--ckpt", default=None,
                   help="weights file in --model_dir (reference .pt names "
                        "map to converted .msgpack flavors)")
    p.add_argument("--confidence_model_dir", default=None)
    p.add_argument("--confidence_ckpt", default=None)
    p.add_argument("--old_confidence_model", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="reference-format confidence dirs convert as the old "
                        "architecture (the released default, inference.py:84)")
    p.add_argument("--model_preset", default="diffdock_s")
    p.add_argument("--samples_per_complex", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=None,
                   help="poses in flight per device program (reference "
                        "evaluate.py --batch_size). Default None = "
                        "bucket-optimal: the cover ladder entry's "
                        "poses-in-flight with --bucket_ladder cover (so "
                        "the sweep hits exactly the programs `prewarm` "
                        "compiles), else all poses in one program; "
                        "explicit values are capped at the ladder's "
                        "HBM-safe P")
    p.add_argument("--inference_steps", type=int, default=20)
    p.add_argument("--actual_steps", type=int, default=19)
    # sampler recipe (reference evaluate.py:125-165)
    p.add_argument("--sigma_schedule", default="expbeta")
    p.add_argument("--inf_sched_alpha", type=float, default=1.0)
    p.add_argument("--inf_sched_beta", type=float, default=1.0)
    p.add_argument("--no_random", action="store_true", default=False)
    p.add_argument("--no_final_step_noise", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="zero the SDE noise at the last executed step "
                        "(reference evaluate.py:123 default False — note "
                        "inference.py:79 defaults True)")
    p.add_argument("--ode", action="store_true", default=False)
    p.add_argument("--initial_noise_std_proportion", type=float,
                   default=-1.0,
                   help="-1.0 (reference evaluate.py:153 default) = "
                        "tr_sigma_max Gaussian; DiffDock-L runs pass the "
                        "tuned 1.4601642460337794")
    p.add_argument("--choose_residue", action="store_true", default=False)
    for comp in ("tr", "rot", "tor"):
        p.add_argument(f"--temp_sampling_{comp}", type=float, default=None)
        p.add_argument(f"--temp_psi_{comp}", type=float, default=None)
        p.add_argument(f"--temp_sigma_data_{comp}", type=float, default=None)
    # pocket-knowledge eval (reference evaluate.py:137-140,317-321,364-366):
    # initial placement at the TRUE pocket center with small translation
    # noise; with --different_schedules the time grid is capped so
    # translation diffusion starts at pocket_tr_max
    p.add_argument("--pocket_knowledge", action="store_true", default=False)
    p.add_argument("--no_random_pocket", action="store_true", default=False,
                   help="disable initial randomization (pocket eval)")
    p.add_argument("--pocket_tr_max", type=float, default=3.0)
    p.add_argument("--pocket_cutoff", type=float, default=5.0)
    p.add_argument("--different_schedules", action="store_true",
                   default=False)
    p.add_argument("--limit_complexes", type=int, default=0)
    p.add_argument("--out_dir", default="results/evaluation")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cache_path", default="data/cache_tpu")
    p.add_argument("--esm_embeddings_path", default=None,
                   help="directory of precomputed per-complex LM "
                        "embedding .npy files (reference "
                        "evaluate.py:110)")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    # gnina rescoring in the loop (reference evaluate.py:166-172,434-472)
    p.add_argument("--gnina_minimize", action="store_true", default=False)
    p.add_argument("--gnina_path", default="gnina")
    p.add_argument("--gnina_full_dock", action="store_true", default=False)
    p.add_argument("--gnina_autobox_add", type=float, default=4.0)
    p.add_argument("--gnina_poses_to_optimize", type=int, default=1)
    # failure handling (reference evaluate.py:523-540)
    p.add_argument("--crop_beyond", type=float, default=None,
                   help="sigma-dependent receptor crop radius per step "
                        "(overrides the model config)")
    p.add_argument("--pocket_capacity", type=int, default=None,
                   help="with crop_beyond: gather-compact the receptor to "
                        "this many nearest residues per step")
    p.add_argument("--bucket_ladder",
                   choices=("fine", "fine_dense", "cover"),
                   default="cover",
                   help="'cover' (default for sweeps) pads each complex to "
                        "the ~10-program cover ladder (inference/ladder.py) "
                        "so the whole run compiles a bounded program set; "
                        "'fine' = minimal-padding geometric buckets")
    p.add_argument("--pose_devices", type=int, default=1,
                   help="shard each complex's pose batch over this many "
                        "devices (0 = all visible; see cli.dock)")
    p.add_argument("--complex_devices", type=int, default=1,
                   help="dock this many COMPLEXES concurrently, one per "
                        "mesh device (DockingPipeline.dock_batch; 0 = all "
                        "visible devices). The sweep-level scale-out: "
                        "complexes are grouped by size into mesh-size "
                        "chunks and per-complex run_times are the "
                        "amortized chunk wall-clock. Mutually exclusive "
                        "with --pose_devices.")
    p.add_argument("--max_retries", type=int, default=3,
                   help="dock retries with halved pose batches before a "
                        "complex is recorded as a penalty row")
    p.add_argument("--no_rec_overlap_names", default=None,
                   help="file listing complexes whose receptor is unseen in "
                        "the train set (one name per line); every metric is "
                        "additionally reported restricted to those with a "
                        "no_overlap_ prefix (reference evaluate.py:555-640, "
                        "data/splits/timesplit_test_no_rec_overlap)")
    p.add_argument("--restrict_cpu", action="store_true", default=False,
                   help="cap host BLAS/OMP pools at --num_cpu threads "
                        "(reference evaluate.py:186-196); useful when "
                        "sharing the host, at the cost of slower "
                        "preprocessing and dispatch")
    p.add_argument("--num_cpu", type=int, default=16,
                   help="thread cap applied by --restrict_cpu")
    p.add_argument("--dataset_statistics",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="print dataset geometry statistics after loading "
                        "(reference datasets/pdbbind.py:421-452)")
    return p


def restrict_cpu_threads(threads: int) -> None:
    """Cap host thread pools (reference ``evaluate.py:186-196``). The env
    vars only affect libraries initialized afterwards — the
    ``diffdock-tpu`` dispatcher (cli/main.py) therefore sets them BEFORE
    importing this module; here they are (re)set best-effort for direct
    ``python -m`` invocation, torch (if present) is capped directly, and
    XLA host threads via --xla_cpu flags are left alone (the TPU path
    doesn't use them)."""
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS", "VECLIB_MAXIMUM_THREADS",
                "NUMEXPR_NUM_THREADS"):
        os.environ[var] = str(threads)
    try:
        import torch

        torch.set_num_threads(threads)
    except Exception:  # noqa: BLE001 — torch optional here
        pass


def true_pocket_center(data, pocket_cutoff: float):
    """Ground-truth pocket center (reference ``utils/sampling.py:20-29``):
    mean of receptor residues within ``pocket_cutoff`` of any true ligand
    atom; the closest residue when none qualifies. Coordinates are in the
    complex's centered frame."""
    rec = np.asarray(data.rec_pos)[np.asarray(data.rec_mask, bool)]
    lig = np.asarray(data.lig_pos)[np.asarray(data.lig_mask, bool)]
    d = np.linalg.norm(rec[:, None] - lig[None], axis=-1)
    label = (d < pocket_cutoff).any(axis=1)
    if label.any():
        return rec[label].mean(axis=0)
    print(f"  no pocket residue below {pocket_cutoff} A, taking closest at "
          f"{d.min():.2f}")
    return rec[d.min(axis=1).argmin()]


def dock_with_retry(pipeline, data, num_poses, seed, max_retries=3,
                    batch_size=None, pocket_center=None):
    """Dock with batch-halving recovery (reference ``evaluate.py:523-527``):
    on failure, retry the same total pose count with fewer poses in
    flight. Chunking itself is ``DockingPipeline.dock_complex``'s
    (one compiled program per (bucket, chunk), per-chunk folded RNG,
    joint confidence ranking) — this wrapper only halves the chunk."""
    chunk = batch_size
    for attempt in range(max_retries):
        try:
            return pipeline.dock_complex(
                data, num_poses=num_poses, seed=seed,
                batch_size=chunk, pocket_center=pocket_center,
            )
        except Exception as e:  # noqa: BLE001 — reference-style halving
            # halve from the poses-in-flight that actually ran (the cover
            # ladder caps batch_size at its entry's P, so halving from
            # num_poses could retry the identical failing program); on a
            # pose mesh the program can't shrink below one pose per
            # device, so stop once the real in-flight count hits that
            # floor instead of burning retries on the identical program
            ran = pipeline.effective_pose_chunk(data, num_poses, chunk)
            floor = pipeline.mesh.size if pipeline.mesh is not None else 1
            if ran <= floor or attempt == max_retries - 1:
                raise
            chunk = max(1, ran // 2)
            print(f"  retry with pose chunks of {chunk}: "
                  f"{type(e).__name__}: {e}")
    raise RuntimeError("unreachable")


def main(argv=None):
    args = get_parser().parse_args(argv)
    if args.restrict_cpu:
        restrict_cpu_threads(args.num_cpu)
    if args.complex_devices != 1 and args.pose_devices != 1:
        raise SystemExit(
            "--complex_devices and --pose_devices are mutually exclusive "
            "(both shard the same 1-axis mesh)"
        )

    from diffdock_tpu.cli.dock import load_pipeline
    from diffdock_tpu.data.chem import read_molecule_file
    from diffdock_tpu.data.datasets import (
        ComplexDataset, DatasetConfig, pdbbind_specs,
    )
    from diffdock_tpu.eval.gnina import gnina_minimize_pose
    from diffdock_tpu.eval.metrics import (
        compute_metric_table, gnina_metric_table, min_self_distances,
    )
    from diffdock_tpu.eval.rmsd import molecular_automorphisms, symmetry_rmsd

    # fail fast on a bad names file — emit_metric_tables only reads it
    # after the (potentially hours-long) sweep has finished
    if args.no_rec_overlap_names and not os.path.isfile(
        args.no_rec_overlap_names
    ):
        raise SystemExit(
            f"--no_rec_overlap_names file not found: "
            f"{args.no_rec_overlap_names}"
        )

    dock_args = argparse.Namespace(
        model_dir=args.model_dir,
        ckpt=args.ckpt,
        confidence_model_dir=args.confidence_model_dir,
        confidence_ckpt=args.confidence_ckpt,
        old_confidence_model=args.old_confidence_model,
        model_preset=args.model_preset,
        inference_steps=args.inference_steps,
        actual_steps=args.actual_steps,
        sigma_schedule=args.sigma_schedule,
        inf_sched_alpha=args.inf_sched_alpha,
        inf_sched_beta=args.inf_sched_beta,
        no_final_step_noise=args.no_final_step_noise,
        ode=args.ode, no_random=args.no_random,
        initial_noise_std_proportion=args.initial_noise_std_proportion,
        choose_residue=args.choose_residue,
        compute_dtype=args.compute_dtype,
        crop_beyond=args.crop_beyond,
        pocket_capacity=args.pocket_capacity,
        bucket_ladder=args.bucket_ladder,
        esm_embeddings_path=args.esm_embeddings_path,
        # one 1-axis mesh serves either sharding layout: poses within a
        # complex (--pose_devices) or one complex per device
        # (--complex_devices, used by dock_batch below)
        pose_devices=(
            args.complex_devices
            if args.complex_devices != 1 else args.pose_devices
        ),
        **{
            f"{pre}_{c}": getattr(args, f"{pre}_{c}")
            for pre in ("temp_sampling", "temp_psi", "temp_sigma_data")
            for c in ("tr", "rot", "tor")
        },
    )
    pipeline = load_pipeline(dock_args)

    if args.pocket_knowledge or args.no_random_pocket:
        import dataclasses

        sc = pipeline.score_cfg.sigma
        t_max = 1.0
        if args.pocket_knowledge and args.different_schedules:
            # start translation diffusion at pocket_tr_max (reference
            # evaluate.py:317-321)
            t_max = (np.log(args.pocket_tr_max) - np.log(sc.tr_sigma_min)) / (
                np.log(sc.tr_sigma_max) - np.log(sc.tr_sigma_min)
            )
        pipeline.sampler_cfg = dataclasses.replace(
            pipeline.sampler_cfg,
            no_random_pocket=args.no_random_pocket,
            pocket_tr_max=(args.pocket_tr_max if args.pocket_knowledge
                           else None),
            t_max=t_max,
        )

    protein_stem = args.protein_file or (
        "protein" if args.dataset == "posebusters" else "protein_processed"
    )
    ligand_stem = args.ligand_file or "ligand"

    spec_by_name = {}
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
        get_receptor_pdb = lambda name: moad._receptor_path(name[:6])
    else:
        specs = pdbbind_specs(
            args.data_dir, args.split,
            protein_suffix=f"_{protein_stem}.pdb",
            ligand_suffix=f"_{ligand_stem}.sdf",
            esm_embeddings_dir=args.esm_embeddings_path,
        )
        if args.limit_complexes:
            specs = specs[: args.limit_complexes]
        ds = ComplexDataset(specs, DatasetConfig(cache_dir=args.cache_path))
        ds.preprocess()
        if args.dataset_statistics:
            ds.print_statistics()
        spec_by_name = {s.name: s for s in specs}
        eval_names = ds.names
        get_data = ds.get
        get_mol = lambda name: read_molecule_file(
            spec_by_name[name].ligand_path
        ).remove_hs()
        get_receptor_pdb = lambda name: spec_by_name[name].protein_path
        if args.dataset == "posebusters":
            # min-RMSD over every pose in {name}_ligands.sdf
            # (reference datasets/pdbbind.py:392-404)
            from diffdock_tpu.data.chem import parse_sdf

            def get_refs(name):
                path = os.path.join(args.data_dir, name,
                                    f"{name}_ligands.sdf")
                if not os.path.exists(path):
                    return None
                with open(path) as f:
                    mols = parse_sdf(f.read())
                refs = [m.remove_hs().coords for m in mols]
                print(f"[{name}] {len(refs)} alternative poses")
                return refs or None
        else:
            get_refs = None
    print(f"evaluating {len(eval_names)} complexes")

    P = args.samples_per_complex

    # --- complex-parallel pre-dock: one complex per mesh device, grouped
    # by size so chunk buckets stay tight (DockingPipeline.dock_batch).
    # On a chunk failure the names simply stay un-predocked and fall back
    # to the sequential retry path below.
    pre_docked = {}
    if args.complex_devices != 1 and pipeline.mesh is not None:
        from diffdock_tpu.data.complexes import bucket_sizes

        ndev = pipeline.mesh.size
        entries = [(n, get_data(n)) for n in eval_names]
        entries = [(n, d) for n, d in entries if d is not None]
        # keep the loaded complexes for the main loop: ComplexDataset.get
        # re-reads the npz on every call
        data_cache = dict(entries)
        entries.sort(
            key=lambda e: bucket_sizes(e[1].n_lig, e[1].n_rec, e[1].n_bonds)
        )
        for s in range(0, len(entries), ndev):
            grp = entries[s : s + ndev]
            pockets = [
                true_pocket_center(d, args.pocket_cutoff)
                if args.pocket_knowledge else None
                for _, d in grp
            ]
            t0 = time.time()
            try:
                rs = pipeline.dock_batch(
                    [d for _, d in grp], num_poses=P, seed=args.seed,
                    pocket_centers=pockets, batch_size=args.batch_size,
                )
            except Exception as e:  # noqa: BLE001 — fall back sequential
                print(f"batch dock failed ({type(e).__name__}: {e}); "
                      f"{len(grp)} complexes fall back to sequential")
                continue
            dt = (time.time() - t0) / len(grp)
            for (n, _), r in zip(grp, rs):
                pre_docked[n] = (r, dt)

    names, rmsd_rows, centroid_rows, run_times, clash_rows = [], [], [], [], []
    conf_rows, gnina_rmsd_rows, gnina_score_rows = [], [], []
    failures = 0
    for name in eval_names:
        if pre_docked and name in data_cache:
            # pop: holding every loaded complex (incl. 1280-dim per-residue
            # LM embeddings) for the whole sweep costs gigabytes of host
            # RAM on large evaluations; each entry is needed exactly once
            # here (ADVICE r3)
            data = data_cache.pop(name)
        else:
            data = get_data(name)
        if data is None:
            continue
        t0 = time.time()
        try:
            if name in pre_docked:
                result, amortized = pre_docked[name]
            else:
                # only needed when actually docking here (the pre-dock
                # already applied its own pocket centers)
                pocket_center = (
                    true_pocket_center(data, args.pocket_cutoff)
                    if args.pocket_knowledge else None
                )
                result = dock_with_retry(
                    pipeline, data, P, args.seed,
                    max_retries=args.max_retries,
                    batch_size=args.batch_size, pocket_center=pocket_center,
                )
                amortized = time.time() - t0
        except Exception as e:  # noqa: BLE001 — penalty row, keep counts
            print(f"[{name}] failed: {type(e).__name__}: {e}")
            failures += 1
            names.append(name)
            rmsd_rows.append(np.full(P, 10000.0))
            centroid_rows.append(np.full(P, 10000.0))
            clash_rows.append(np.full(P, 10000.0))
            conf_rows.append(np.full(P, -10000.0))
            # NaN sentinel keeps run_times.npy index-aligned with names.npy
            # (excluded from runtime metrics below)
            run_times.append(float("nan"))
            if args.gnina_minimize:
                gnina_rmsd_rows.append(
                    np.full(args.gnina_poses_to_optimize, 10000.0))
                gnina_score_rows.append(
                    np.full(args.gnina_poses_to_optimize, -10000.0))
            continue
        run_times.append(amortized)

        mol = get_mol(name)
        bonds = [(i, j) for i, j, _ in mol.bonds]
        perms = molecular_automorphisms(mol.elements, bonds)
        ordered = result.poses[result.order]
        if get_refs is not None:
            refs = get_refs(name)
            if refs is None:
                refs = [np.asarray(data.lig_pos)
                        + np.asarray(data.original_center)]
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
        if args.gnina_minimize:
            # rescoring pass (reference evaluate.py:434-472): minimize the
            # top-confidence poses with gnina, re-RMSD the minimized coords
            g_rmsds, g_scores = [], []
            for pose in ordered[: args.gnina_poses_to_optimize]:
                gpos, gmol, gscore = gnina_minimize_pose(
                    mol, pose, get_receptor_pdb(name),
                    binary=args.gnina_path,
                    full_dock=args.gnina_full_dock,
                    autobox_add=args.gnina_autobox_add,
                )
                gbonds = [(i, j) for i, j, _ in gmol.bonds]
                try:
                    gr = np.min([
                        symmetry_rmsd(r, gpos[None], gmol.elements, gbonds)[0]
                        for r in refs
                    ])
                except Exception:  # noqa: BLE001 — uncorrected fallback
                    gr = float(np.min([
                        np.sqrt(((gpos - r) ** 2).sum(-1).mean())
                        for r in refs if r.shape == gpos.shape
                    ] or [np.inf]))
                g_rmsds.append(gr)
                g_scores.append(gscore)
            gnina_rmsd_rows.append(np.asarray(g_rmsds))
            gnina_score_rows.append(np.asarray(g_scores))
        clash_rows.append(
            [min_self_distances(p, bonds) for p in ordered]
        )
        names.append(name)
        rmsd_rows.append(rmsds)
        centroid_rows.append(centroids)
        conf = result.confidence if result.confidence is not None \
            else np.zeros(P)
        conf_rows.append(np.asarray(conf)[result.order])
        print(f"[{name}] top-1 rmsd {rmsds[0]:.2f} A ({run_times[-1]:.1f}s)")

    print(f"{failures} failures due to exceptions")
    table = emit_metric_tables(
        args.out_dir, names, rmsd_rows, centroid_rows, run_times,
        conf_rows, clash_rows, failures,
        no_rec_overlap_names=args.no_rec_overlap_names,
        gnina_rmsd_rows=gnina_rmsd_rows if args.gnina_minimize else None,
        gnina_score_rows=gnina_score_rows if args.gnina_minimize else None,
    )
    print(json.dumps(table, indent=2))
    return 0


def emit_metric_tables(out_dir, names, rmsd_rows, centroid_rows, run_times,
                       conf_rows, clash_rows, failures,
                       no_rec_overlap_names=None,
                       gnina_rmsd_rows=None, gnina_score_rows=None):
    """Dump per-complex arrays + metrics.json; every metric is reported
    twice — over all complexes, and restricted to receptors unseen in the
    train set (``no_overlap_`` prefix), the generalization-honesty column
    of the paper tables (reference ``evaluate.py:555-640``, names file
    ``data/splits/timesplit_test_no_rec_overlap``)."""
    from diffdock_tpu.eval.metrics import (
        compute_metric_table, gnina_metric_table,
    )

    os.makedirs(out_dir, exist_ok=True)
    names_arr = np.asarray(names)
    all_rmsds = np.asarray(rmsd_rows)
    all_centroids = np.asarray(centroid_rows)
    all_run_times = np.asarray(run_times)
    all_conf = np.asarray(conf_rows)
    all_clash = np.asarray(clash_rows)

    selections = [("", np.ones(len(names_arr), dtype=bool))]
    if no_rec_overlap_names:
        with open(no_rec_overlap_names) as f:
            overlap_free = {ln.strip() for ln in f if ln.strip()}
        sel = np.asarray([n in overlap_free for n in names], dtype=bool)
        if sel.sum() == 0:
            print("no_rec_overlap: no evaluated complex in names file, "
                  "skipping split")
        else:
            selections.append(("no_overlap_", sel))

    table = {}
    for prefix, sel in selections:
        rmsds = all_rmsds[sel]
        centroids = all_centroids[sel]
        rt = all_run_times[sel]
        np.save(os.path.join(out_dir, f"{prefix}rmsds.npy"), rmsds)
        np.save(os.path.join(out_dir, f"{prefix}centroid_distances.npy"),
                centroids)
        np.save(os.path.join(out_dir, f"{prefix}run_times.npy"), rt)
        np.save(os.path.join(out_dir, f"{prefix}names.npy"), names_arr[sel])
        np.save(os.path.join(out_dir, f"{prefix}confidences.npy"),
                all_conf[sel])
        np.save(os.path.join(out_dir, f"{prefix}min_self_distances.npy"),
                all_clash[sel])

        sub = compute_metric_table(rmsds, centroids, rt)
        if len(all_clash):
            # steric clash proxy (reference evaluate.py:486-505)
            sub["steric_clash_fraction"] = float(
                (all_clash[sel][:, 0] < 0.4).mean() * 100
            )
        if gnina_rmsd_rows is not None and len(gnina_rmsd_rows):
            g_rmsds = np.asarray(gnina_rmsd_rows)[sel]
            g_scores = np.asarray(gnina_score_rows)[sel]
            np.save(os.path.join(out_dir, f"{prefix}gnina_rmsds.npy"),
                    g_rmsds)
            np.save(os.path.join(out_dir, f"{prefix}gnina_scores.npy"),
                    g_scores)
            sub.update(gnina_metric_table(g_rmsds, g_scores))
        table.update({prefix + k: v for k, v in sub.items()})
    table["failures"] = failures
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(table, f, indent=2)
    return table


if __name__ == "__main__":
    raise SystemExit(main())
