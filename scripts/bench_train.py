"""Measured score-model TRAINING throughput on one chip.

The reference trains with torch eager, batch_size 16 complexes per step
(``/root/reference/utils/parsing.py:64``), DataParallel on multi-GPU
(``utils/utils.py:278-279``); it publishes no steps/s. This script
measures our jitted train step (forward + per-sample in-jit noise +
backward + optimizer + EMA, ``train/trainer.py:make_train_step``) at
reference-like batch shapes so PERF.md can carry a measured number, and
so regressions in the training path show up as a number rather than an
anecdote.

Usage:  python scripts/bench_train.py [--dtype bfloat16] [--reps 20]

Prints one JSON line per (bucket, batch) with steps/s and complexes/s.
Timing hygiene per PERF.md: chain the state through the loop, block once
at the end; run on an idle host.
"""

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from diffdock_tpu.data.complexes import pad_to, synthetic_complex
    from diffdock_tpu.diffusion.so3 import get_so3_tables
    from diffdock_tpu.diffusion.torus import get_torus_tables
    from diffdock_tpu.models.config import PRESETS
    from diffdock_tpu.models.score_model import CGScoreModel
    from diffdock_tpu.train.trainer import (
        TrainConfig,
        create_train_state,
        make_train_step,
        training_model_config,
    )
    from diffdock_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    help="compute dtype (params stay f32)")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--buckets", default="32x320x16x16,48x704x16x8",
                    help="comma list of NLxNRxNBxB")
    args = ap.parse_args()

    so3, torus = get_so3_tables(), get_torus_tables()
    cfg = training_model_config(
        dataclasses.replace(
            PRESETS["diffdock_l"],
            lm_embedding_dim=1280,
            compute_dtype=args.dtype,
        ),
        data_parallel=False,
    )
    model = CGScoreModel(cfg)
    tc = TrainConfig()
    step = jax.jit(make_train_step(model, tc, so3, torus))
    rng = np.random.RandomState(0)
    state = None

    for spec in args.buckets.split(","):
        nl, nr, nb, bsz = (int(x) for x in spec.split("x"))
        datas = [
            pad_to(
                synthetic_complex(
                    rng, n_lig=nl, n_rec=nr, n_bonds=nb, lm_dim=1280
                ),
                nl, nr, nb,
            )
            for _ in range(bsz)
        ]
        if state is None:
            ex = jax.tree.map(jnp.asarray, datas[0])
            state = create_train_state(
                model, ex, so3, torus, tc, jax.random.PRNGKey(0)
            )
        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
        batch = jax.tree.map(jnp.asarray, batch)

        t0 = time.time()
        st, metrics = step(state, batch, jax.random.PRNGKey(1))
        loss0 = float(metrics["loss"])
        compile_s = time.time() - t0

        t0 = time.time()
        for i in range(args.reps):
            st, metrics = step(st, batch, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(st.params)
        dt = (time.time() - t0) / args.reps
        assert np.isfinite(loss0), loss0
        print(
            json.dumps(
                {
                    "bucket": {"nl": nl, "nr": nr, "nb": nb},
                    "batch_complexes": bsz,
                    "dtype": args.dtype,
                    "compile_s": round(compile_s, 1),
                    "s_per_step": round(dt, 4),
                    "steps_per_sec": round(1.0 / dt, 3),
                    "complexes_per_sec": round(bsz / dt, 2),
                    "loss0": round(loss0, 4),
                }
            )
        )


if __name__ == "__main__":
    main()
