"""Docking CLI (the reference ``inference.py`` equivalent).

Examples::

    python -m diffdock_tpu.cli.dock \
        --protein_path examples/6w70.pdb --ligand examples/6w70_ligand.sdf \
        --out_dir results/6w70 --samples_per_complex 10

    python -m diffdock_tpu.cli.dock --protein_ligand_csv pairs.csv --out_dir results
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

import numpy as np


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="diffdock_tpu docking")
    p.add_argument("--config", default=None, help="YAML overriding defaults")
    p.add_argument("--protein_path", default=None)
    p.add_argument("--protein_sequence", default=None,
                   help="fold with ESMFold (requires cached weights)")
    p.add_argument("--ligand", "--ligand_description", dest="ligand",
                   default=None,
                   help="ligand file (.sdf/.mol/.pdb) or SMILES (needs RDKit)")
    p.add_argument("--protein_ligand_csv", default=None,
                   help="CSV with columns complex_name,protein_path,ligand_description")
    p.add_argument("--complex_name", default=None)
    p.add_argument("--out_dir", default="results/user_predictions")
    p.add_argument("--model_dir", default=None,
                   help="run dir with model_parameters.yml + model.msgpack")
    p.add_argument("--ckpt", default=None,
                   help="weights file inside --model_dir; reference .pt "
                        "names map to the converted .msgpack flavors")
    p.add_argument("--confidence_model_dir", default=None)
    p.add_argument("--confidence_ckpt", default=None,
                   help="weights file inside --confidence_model_dir")
    p.add_argument("--samples_per_complex", type=int, default=10)
    p.add_argument("--batch_size", type=int, default=None,
                   help="poses in flight per device program (reference "
                        "inference.py:78, default 10 there). Default None "
                        "= bucket-optimal: with --bucket_ladder cover the "
                        "cover-ladder entry's poses-in-flight (so runs hit "
                        "exactly the programs `prewarm` compiles), else "
                        "all samples in one program; explicit values are "
                        "capped at the ladder's HBM-safe P")
    p.add_argument("--inference_steps", type=int, default=20)
    p.add_argument("--actual_steps", type=int, default=19)
    p.add_argument("--sigma_schedule", default="expbeta")
    p.add_argument("--inf_sched_alpha", type=float, default=1.0)
    p.add_argument("--inf_sched_beta", type=float, default=1.0)
    p.add_argument("--no_final_step_noise", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="zero the SDE noise at the last executed step "
                        "(reference inference.py:79 default True; unlike "
                        "the reference's store_true-with-default-True, "
                        "--no-no_final_step_noise can actually disable it)")
    p.add_argument("--ode", action="store_true", default=False)
    p.add_argument("--no_random", action="store_true", default=False)
    p.add_argument("--initial_noise_std_proportion", type=float,
                   default=1.4601642460337794)
    p.add_argument("--choose_residue", action="store_true", default=False,
                   help="initial placement at a random receptor residue "
                        "(reference inference.py:86)")
    # low-temperature sampling (reference inference.py:88-96); defaults are
    # the SamplerConfig tuned values from default_inference_args.yaml
    for comp, idx in (("tr", 0), ("rot", 1), ("tor", 2)):
        p.add_argument(f"--temp_sampling_{comp}", type=float, default=None)
        p.add_argument(f"--temp_psi_{comp}", type=float, default=None)
        p.add_argument(f"--temp_sigma_data_{comp}", type=float, default=None)
    p.add_argument("--old_score_model", action="store_true", default=False,
                   help="accepted for reference CLI compatibility; the "
                        "architecture is read from the checkpoint config")
    p.add_argument("--old_confidence_model", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="the released confidence checkpoint is the old "
                        "architecture (reference inference.py:84); pass "
                        "--no-old_confidence_model to convert a "
                        "reference-format NEW-architecture confidence dir")
    p.add_argument("--loglevel", "-l", "--log", dest="loglevel",
                   default="WARNING")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model_preset", default="diffdock_s",
                   help="preset when no --model_dir given (random weights)")
    p.add_argument("--save_visualisation", action="store_true", default=False,
                   help="write rankN_reverseprocess.pdb denoising trajectories")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"],
                   help="conv-layer compute dtype (bf16 validated to match "
                        "fp32 docking RMSDs; 1.43x faster on TPU)")
    p.add_argument("--crop_beyond", type=float, default=None,
                   help="sigma-dependent receptor crop radius per step "
                        "(reference crop_beyond, utils/utils.py:388-413); "
                        "overrides the model config when given")
    p.add_argument("--bucket_ladder",
                   choices=("fine", "fine_dense", "cover"),
                   default="fine",
                   help="'fine' = minimal-padding geometric buckets; "
                        "'fine_dense' = fine on the ~1.2x-spaced dense "
                        "rungs (least padding; for warmed services, see "
                        "prewarm --fine --dense); "
                        "'cover' = the ~10-program cover ladder "
                        "(inference/ladder.py) so a many-complex sweep "
                        "avoids the per-size compile churn")
    p.add_argument("--pose_devices", type=int, default=1,
                   help="shard each complex's pose batch over this many "
                        "devices (1-axis jax mesh; poses are "
                        "embarrassingly parallel so the hot loop needs no "
                        "collectives). 0 = all visible devices; 1 "
                        "(default) = single-device")
    p.add_argument("--pocket_capacity", type=int, default=None,
                   help="with crop_beyond: per-step gather-compaction of "
                        "the receptor to this many nearest residues (dense "
                        "blocks shrink; big-receptor speed/memory win). "
                        "Default keeps exact masking.")
    return p


def sampler_config_from_args(args):
    """Build a SamplerConfig from parsed CLI args. Per-component
    temperature overrides (``--temp_sampling_tr`` etc., reference
    inference.py:88-96) fall back to the tuned SamplerConfig defaults
    (= default_inference_args.yaml values) when not given."""
    from diffdock_tpu.inference.sampler import SamplerConfig

    base = SamplerConfig()

    def _triple(prefix):
        vals = [getattr(args, f"{prefix}_{c}", None)
                for c in ("tr", "rot", "tor")]
        return tuple(
            v if v is not None else d
            for v, d in zip(vals, getattr(base, prefix))
        )

    return SamplerConfig(
        inference_steps=args.inference_steps,
        actual_steps=args.actual_steps,
        sigma_schedule=args.sigma_schedule,
        inf_sched_alpha=args.inf_sched_alpha,
        inf_sched_beta=args.inf_sched_beta,
        no_final_step_noise=args.no_final_step_noise,
        ode=args.ode,
        no_random=args.no_random,
        initial_noise_std_proportion=args.initial_noise_std_proportion,
        choose_residue=getattr(args, "choose_residue", False),
        temp_sampling=_triple("temp_sampling"),
        temp_psi=_triple("temp_psi"),
        temp_sigma_data=_triple("temp_sigma_data"),
    )


def load_pipeline(args):
    import jax

    from diffdock_tpu.inference.pipeline import DockingPipeline
    from diffdock_tpu.inference.sampler import SamplerConfig
    from diffdock_tpu.models.config import PRESETS
    from diffdock_tpu.models.score_model import CGScoreModel
    from diffdock_tpu.train.checkpoints import load_checkpoint

    sampler_cfg = sampler_config_from_args(args)

    if args.model_dir:
        from diffdock_tpu.utils.download import (
            ensure_downloaded,
            prepare_model_dir,
        )

        # reference inference.py:123-143: fetch released weights when the
        # dir is absent; then (TPU-side extra) convert a reference-format
        # dir to native msgpack once, via the signed-off importer
        files = ensure_downloaded(args.model_dir)
        if files:
            print(f"downloaded {len(files)} files for {args.model_dir}",
                  file=sys.stderr)
        model_dir = prepare_model_dir(
            args.model_dir, args.ckpt,
            old=getattr(args, "old_score_model", False),
        )
        ckpt = args.ckpt if model_dir == args.model_dir else None
        params, cfg, _ = load_checkpoint(model_dir, ckpt)
    else:
        print(
            "WARNING: no --model_dir given; using RANDOM weights "
            f"({args.model_preset}) — poses will not be meaningful.",
            file=sys.stderr,
        )
        cfg = PRESETS[args.model_preset]
        # drop the LM feature block only when no embeddings are available
        # (random-weight smokes without ESM); with a precomputed
        # embeddings dir the TRUE preset runs, so timings/programs match
        # the real model (and prewarm/bench's banked programs)
        if cfg.lm_embedding_dim and not getattr(
            args, "esm_embeddings_path", None
        ):
            import dataclasses

            cfg = dataclasses.replace(cfg, lm_embedding_dim=0)
        from diffdock_tpu.data.complexes import synthetic_complex
        from diffdock_tpu.diffusion.so3 import get_so3_tables
        from diffdock_tpu.diffusion.torus import get_torus_tables
        import jax.numpy as jnp

        model = CGScoreModel(cfg)
        d = synthetic_complex(np.random.RandomState(0),
                              lm_dim=cfg.lm_embedding_dim)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, d),
            jnp.asarray(d.lig_pos), jnp.asarray(0.5),
            get_so3_tables(), get_torus_tables(),
        )

    if args.compute_dtype != cfg.compute_dtype:
        import dataclasses

        cfg = dataclasses.replace(cfg, compute_dtype=args.compute_dtype)
    if args.crop_beyond is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, crop_beyond=args.crop_beyond)

    conf_cfg = conf_params = None
    if args.confidence_model_dir:
        from diffdock_tpu.utils.download import prepare_model_dir

        # the released zip (ensure_downloaded above) also carries the
        # confidence run dir; the shipped default is the v1.0 ("old")
        # architecture (reference inference.py:84)
        conf_dir = prepare_model_dir(
            args.confidence_model_dir, args.confidence_ckpt,
            confidence_mode=True,
            old=getattr(args, "old_confidence_model", True),
        )
        conf_ckpt = (
            args.confidence_ckpt
            if conf_dir == args.confidence_model_dir else None
        )
        conf_params, conf_cfg, _ = load_checkpoint(conf_dir, conf_ckpt)

    mesh = None
    n_dev = getattr(args, "pose_devices", 1)
    if n_dev == 0:
        n_dev = len(jax.devices())
    if n_dev > 1:
        from diffdock_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_dev)

    return DockingPipeline(
        score_cfg=cfg,
        score_params=params,
        sampler_cfg=sampler_cfg,
        confidence_cfg=conf_cfg,
        confidence_params=conf_params,
        pocket_capacity=args.pocket_capacity,
        bucket_ladder=getattr(args, "bucket_ladder", "fine"),
        mesh=mesh,
    )


# reference default_inference_args.yaml keys that have no diffdock_tpu
# equivalent but are harmless to accept (no warning): either eval-only
# knobs or torch-runtime details
_ACCEPTED_NOOP_KEYS = {
    "different_schedules",  # only matters with pocket_knowledge (evaluate)
    "limit_failures",       # evaluate-side retry budget
    "no_model",             # debug mode; our no --model_dir warns instead
    "old_filtering_model",  # architecture comes from the checkpoint config
    "old_score_model",
    "old_confidence_model",
    "resample_rdkit",       # evaluate-side conformer resampling
    "no_random_pocket",     # evaluate-side pocket-mode flag
    "loglevel",
}


def apply_config_overrides(args, overrides):
    """Overlay a YAML config (including the reference's
    ``default_inference_args.yaml`` verbatim) onto parsed args; unknown
    keys WARN instead of being silently dropped."""
    for k, v in (overrides or {}).items():
        if k == "ligand_description":
            k = "ligand"
        if hasattr(args, k):
            setattr(args, k, v)
        elif k not in _ACCEPTED_NOOP_KEYS:
            print(f"WARNING: unknown config key {k!r} ignored",
                  file=sys.stderr)
    return args


def main(argv=None):
    args = get_parser().parse_args(argv)
    if args.config:
        import yaml

        with open(args.config) as f:
            apply_config_overrides(args, yaml.safe_load(f))

    from diffdock_tpu.data.inference_dataset import (
        InferenceDatasetBuilder, InferenceSpec, specs_from_csv,
    )

    if args.protein_ligand_csv:
        specs = specs_from_csv(args.protein_ligand_csv)
        for i, s in enumerate(specs):
            if not s.name and s.protein_path:
                specs[i].name = os.path.splitext(
                    os.path.basename(s.protein_path)
                )[0]
    else:
        if not ((args.protein_path or args.protein_sequence) and args.ligand):
            print("need --protein_path/--protein_sequence + --ligand "
                  "or --protein_ligand_csv", file=sys.stderr)
            return 2
        name = args.complex_name or (
            os.path.splitext(os.path.basename(args.protein_path))[0]
            if args.protein_path else "complex_0"
        )
        specs = [InferenceSpec(
            name, args.protein_path, args.protein_sequence, args.ligand,
        )]

    pipeline = load_pipeline(args)
    builder = InferenceDatasetBuilder(workdir=args.out_dir)

    failures = 0
    for i, spec in enumerate(specs):
        name = spec.name
        out = os.path.join(args.out_dir, name)
        t0 = time.time()
        try:
            mol, protein, lm = builder.load(spec, seed=i)
            result = pipeline.dock_mol_protein(
                mol, protein, out,
                num_poses=args.samples_per_complex, seed=args.seed,
                lm_embeddings=lm,
                save_trajectory=args.save_visualisation,
                batch_size=args.batch_size,
            )
        except Exception as e:  # noqa: BLE001 — skip-and-continue like the reference
            print(f"[{name}] FAILED: {type(e).__name__}: {e}", file=sys.stderr)
            failures += 1
            continue
        best = (
            f"{result.confidence[result.order[0]]:.3f}"
            if result.confidence is not None
            else "n/a"
        )
        print(
            f"[{name}] {result.poses.shape[0]} poses in {time.time() - t0:.1f}s"
            f" -> {out} (best confidence {best})"
        )
    print(f"done: {len(specs) - failures}/{len(specs)} complexes succeeded")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
