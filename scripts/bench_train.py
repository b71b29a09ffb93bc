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

Prints one JSON line per (bucket, batch) with steps/s and complexes/s,
and banks the rows under ``train_throughput`` in BENCH_DETAILS.json
(merge-preserving, same artifact bench.py writes — VERDICT r3 ask #7).
Timing hygiene per PERF.md: chain the state through the loop, block once
at the end; run on an idle host.

``--dp_virtual N`` (run separately, on CPU) instead measures the
data-parallel sharding overhead on an N-virtual-device host mesh: the
same global batch stepped on 1 device vs sharded over N devices via
``parallel.mesh.shard_train_step``. Virtual devices share the host
cores, so the interesting number is the overhead ratio (sharded time /
single time ~ 1.0 means the psum machinery costs nothing beyond
compute), not a speedup.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bank_rows(rows, key="train_throughput"):
    """Merge rows into BENCH_DETAILS.json via bench.py's single
    read-merge-atomic-write helper (one implementation for the shared
    artifact)."""
    import bench

    bench._write_details({key: rows})


def run_dp_virtual(n_devices, reps):
    """DP sharding overhead on an n-device virtual CPU mesh (see module
    docstring). Must run in a fresh process (forces the CPU platform)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from diffdock_tpu.data.complexes import pad_to, synthetic_complex
    from diffdock_tpu.diffusion.so3 import SO3Config, get_so3_tables
    from diffdock_tpu.diffusion.torus import TorusConfig, get_torus_tables
    from diffdock_tpu.models.config import ScoreModelConfig
    from diffdock_tpu.models.score_model import CGScoreModel
    from diffdock_tpu.parallel.mesh import make_mesh, shard_train_step
    from diffdock_tpu.train.trainer import (
        TrainConfig,
        create_train_state,
        make_train_step,
        training_model_config,
    )

    so3 = get_so3_tables(SO3Config(n_eps=64, x_n=256, l_max=512))
    torus = get_torus_tables(TorusConfig(x_n=256, sigma_n=128,
                                         mc_samples=2000))
    nl, nr, nb, bsz = 16, 96, 4, n_devices * 2
    base = ScoreModelConfig(ns=16, nv=4, num_conv_layers=2,
                            num_prot_emb_layers=1)
    rng = np.random.RandomState(0)
    datas = [
        pad_to(synthetic_complex(rng, n_lig=nl, n_rec=nr, n_bonds=nb),
               nl, nr, nb)
        for _ in range(bsz)
    ]
    batch = jax.tree.map(jnp.asarray,
                         jax.tree.map(lambda *xs: jnp.stack(xs), *datas))
    tc = TrainConfig()
    out = {"n_devices": n_devices, "global_batch": bsz,
           "bucket": {"nl": nl, "nr": nr, "nb": nb}}
    for mode in ("single", "sharded"):
        dp = mode == "sharded"
        cfg = training_model_config(base, data_parallel=dp)
        model = CGScoreModel(cfg)
        ex = jax.tree.map(jnp.asarray, datas[0])
        state = create_train_state(model, ex, so3, torus, tc,
                                   jax.random.PRNGKey(0))
        if dp:
            from diffdock_tpu.train.trainer import DP_AXIS

            mesh = make_mesh(n_devices)
            step = shard_train_step(
                make_train_step(model, tc, so3, torus, dp_axis=DP_AXIS),
                mesh,
            )
        else:
            step = jax.jit(make_train_step(model, tc, so3, torus))
        st, m = step(state, batch, jax.random.PRNGKey(1))  # compile
        t0 = time.time()
        for i in range(reps):
            st, m = step(st, batch, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(st.params)
        out[f"{mode}_s_per_step"] = round((time.time() - t0) / reps, 4)
        assert np.isfinite(float(m["loss"]))
    out["overhead_ratio"] = round(
        out["sharded_s_per_step"] / out["single_s_per_step"], 3
    )
    print(json.dumps(out))
    bank_rows(out, key="train_dp_virtual")


def main():
    # parse BEFORE any jax import: --dp_virtual must set XLA_FLAGS and
    # force the CPU platform before a backend exists (and must NOT enable
    # the persistent cache, which is TPU-gated)
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    help="compute dtype (params stay f32)")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--buckets", default="32x320x16x16,48x704x16x8",
                    help="comma list of NLxNRxNBxB")
    ap.add_argument("--dp_virtual", type=int, default=0,
                    help="measure DP sharding overhead on an N-virtual-"
                         "device CPU mesh instead of chip throughput")
    args = ap.parse_args()
    if args.dp_virtual:
        run_dp_virtual(args.dp_virtual, max(3, args.reps // 4))
        return

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
    rows = {}

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
        row = {
            "bucket": {"nl": nl, "nr": nr, "nb": nb},
            "batch_complexes": bsz,
            "dtype": args.dtype,
            "compile_s": round(compile_s, 1),
            "s_per_step": round(dt, 4),
            "steps_per_sec": round(1.0 / dt, 3),
            "complexes_per_sec": round(bsz / dt, 2),
            "loss0": round(loss0, 4),
        }
        rows[f"{nl}x{nr}_b{bsz}"] = row
        print(json.dumps(row))
    bank_rows(rows)


if __name__ == "__main__":
    main()
