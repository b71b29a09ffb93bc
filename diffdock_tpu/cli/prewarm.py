"""Prewarm the persistent XLA compilation cache for an evaluation sweep.

A cold DiffDock-L docking program compiles in minutes on TPU; a realistic
150-complex sweep over the fine bucket ladder needs ~38 programs (hours of
first-run compile; bench.py --churn). This command compiles the docking
program for every bucket of the cover ladder (and optionally an explicit
bucket list) into the persistent cache (``utils/compile_cache.py``) ahead
of time, so the sweep itself — or the next ``bench.py``/``evaluate`` run —
loads programs from disk instead.

Because the pipeline takes model parameters as jit ARGUMENTS (not baked
constants, ``inference/pipeline.py:_program``), the cache entries are
weight-independent: prewarming with randomly-initialized parameters warms
the cache for any checkpoint of the same architecture.

Cache keys DO depend on the step counts AND the model architectures:
``--inference_steps`` / ``--actual_steps`` must match the sweep you are
warming for (the default 20/19 is the reference inference recipe;
``bench.py`` runs 20/20), and a sweep that ranks with a confidence model
runs a different program than a confidence-free one — pass the same
``--model_dir`` / ``--confidence_model_dir`` (configs are read from the
checkpoints; the weight VALUES still don't matter) or
``--confidence_preset`` so the warmed HLO is the one the sweep executes.

The reference has no analogue (torch eager pays no compile wall).
"""

from __future__ import annotations

import argparse
import time


def get_parser():
    p = argparse.ArgumentParser(description="prewarm XLA compile cache")
    p.add_argument("--model_preset", default="diffdock_l")
    p.add_argument("--model_dir", default=None,
                   help="read the score-model config from this native "
                        "checkpoint dir so the warmed HLO matches the "
                        "sweep exactly (overrides --model_preset)")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--confidence_model_dir", default=None,
                   help="also include the confidence-model apply in the "
                        "warmed programs, config read from this native "
                        "checkpoint dir (CG confidence only)")
    p.add_argument("--confidence_ckpt", default=None)
    p.add_argument("--confidence_preset", default=None,
                   help="alternatively build a random confidence model "
                        "from this preset (confidence_mode, old "
                        "architecture by default)")
    p.add_argument("--old_confidence_model",
                   action=argparse.BooleanOptionalAction, default=True,
                   help="architecture for --confidence_preset (the shipped "
                        "confidence checkpoint is the old architecture)")
    p.add_argument("--compute_dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--inference_steps", type=int, default=20)
    p.add_argument("--actual_steps", type=int, default=19)
    p.add_argument("--bucket", action="append", default=[],
                   metavar="NL,NR,NB,POSES",
                   help="extra (bucket, poses) programs to compile; "
                        "repeatable. Default: the cover ladder "
                        "(inference/ladder.py)")
    p.add_argument("--no_cover_ladder", action="store_true", default=False,
                   help="only compile --bucket entries")
    p.add_argument("--fine", action="store_true", default=False,
                   help="additionally compile the warmed-service fine "
                        "plan (~38 minimal-padding programs for a "
                        "PDBBind-like size mix, bench.py fine_plan) — "
                        "hours cold, then every sweep runs the "
                        "minimal-padding plan from cache")
    p.add_argument("--dense", action="store_true", default=False,
                   help="with --fine: the dense-grid plan instead "
                        "(~85 programs on the ~1.2x-spaced rungs, what "
                        "bucket_ladder='fine_dense' executes — the "
                        "max-throughput warmed-service plan)")
    p.add_argument("--samples_per_complex", type=int, default=None,
                   help="also compile each cover bucket at this pose count "
                        "(e.g. 10 for the reference default recipe)")
    return p


def main(argv=None) -> int:
    args = get_parser().parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffdock_tpu.data.complexes import (
        pad_to, synthetic_complex,
    )
    from diffdock_tpu.diffusion.so3 import get_so3_tables
    from diffdock_tpu.diffusion.torus import get_torus_tables
    from diffdock_tpu.inference.ladder import COVER_LADDER
    from diffdock_tpu.inference.pipeline import DockingPipeline
    from diffdock_tpu.inference.sampler import SamplerConfig
    from diffdock_tpu.models.config import PRESETS
    from diffdock_tpu.models.factory import build_model
    from diffdock_tpu.utils.compile_cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    print(f"persistent cache: {cache_dir or 'DISABLED (cpu backend?)'}")

    so3 = get_so3_tables()
    torus = get_torus_tables()
    rng = np.random.RandomState(0)

    if args.model_dir:
        from diffdock_tpu.train.checkpoints import load_checkpoint

        params, cfg, _ = load_checkpoint(args.model_dir, args.ckpt)
        cfg = dataclasses.replace(cfg, compute_dtype=args.compute_dtype)
    else:
        cfg = dataclasses.replace(
            PRESETS[args.model_preset], compute_dtype=args.compute_dtype
        )
        model = build_model(cfg)
        d0 = jax.tree.map(
            jnp.asarray,
            synthetic_complex(rng, n_lig=16, n_rec=64, n_bonds=4,
                              lm_dim=cfg.lm_embedding_dim or 1280),
        )
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), d0, d0.lig_pos, jnp.asarray(0.5),
            so3, torus,
        )

    conf_cfg = conf_params = None
    if args.confidence_model_dir:
        from diffdock_tpu.train.checkpoints import load_checkpoint

        conf_params, conf_cfg, _ = load_checkpoint(
            args.confidence_model_dir, args.confidence_ckpt
        )
    elif args.confidence_preset:
        conf_cfg = dataclasses.replace(
            PRESETS[args.confidence_preset],
            confidence_mode=True,
            old_architecture=args.old_confidence_model,
            compute_dtype=args.compute_dtype,
        )
        conf_model = build_model(conf_cfg)
        c0 = jax.tree.map(
            jnp.asarray,
            synthetic_complex(rng, n_lig=16, n_rec=64, n_bonds=4,
                              lm_dim=conf_cfg.lm_embedding_dim or 1280),
        )
        conf_params = jax.jit(conf_model.init)(
            jax.random.PRNGKey(1), c0, c0.lig_pos, jnp.asarray(0.0),
            so3, torus,
        )
    if conf_cfg is not None and conf_cfg.all_atoms:
        raise SystemExit(
            "prewarm supports CG confidence models only (an all-atom "
            "confidence program additionally depends on the atom bucket)"
        )

    pipeline = DockingPipeline(
        cfg, params,
        SamplerConfig(inference_steps=args.inference_steps,
                      actual_steps=args.actual_steps),
        confidence_cfg=conf_cfg, confidence_params=conf_params,
        so3_tables=so3, torus_tables=torus,
    )

    ladder = [] if args.no_cover_ladder else list(COVER_LADDER)
    jobs = list(ladder)
    if args.fine:
        from diffdock_tpu.inference.ladder import fine_plan

        jobs += list(fine_plan(dense=args.dense).keys())
    if args.samples_per_complex:
        jobs += [
            (nl, nr, nb, args.samples_per_complex)
            for nl, nr, nb, _ in ladder
        ]
    for spec in args.bucket:
        nl, nr, nb, poses = (int(x) for x in spec.split(","))
        jobs.append((nl, nr, nb, poses))
    jobs = list(dict.fromkeys(jobs))  # dedupe identical (bucket, P) programs

    for nl, nr, nb, poses in jobs:
        data = synthetic_complex(
            rng, n_lig=nl, n_rec=nr, n_bonds=nb,
            lm_dim=cfg.lm_embedding_dim or 1280,
        )
        # the job sizes ARE the program's bucket sizes (fine, dense, and
        # cover rungs alike — re-rounding through one grid would corrupt
        # the others' rungs); synthetic_complex was built at exactly
        # these sizes, so pad_to is an identity check
        bl, br, bb = nl, nr, nb
        padded = jax.tree.map(jnp.asarray, pad_to(data, bl, br, bb))
        fn = pipeline._get_compiled((bl, br, bb, 0), poses, False)
        t0 = time.time()
        # AOT compile (no execution): lands in the persistent cache
        fn.lower(
            (pipeline.so3, pipeline.torus),
            (pipeline.score_params, pipeline.confidence_params),
            jax.random.PRNGKey(0), padded, None,
            jnp.zeros((4,), jnp.float32),
        ).compile()
        print(f"bucket nl={bl} nr={br} nb={bb} poses={poses}: "
              f"{time.time() - t0:.1f}s", flush=True)
    print("prewarm complete")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
