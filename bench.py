"""Benchmark: DiffDock-L-scale docking throughput on one TPU chip.

Default mode measures steady-state reverse-diffusion throughput (poses/sec)
for the flagship score model at the paper-eval recipe (20 denoising steps
per pose, 40 poses in flight) on a realistic complex size (32 ligand atoms /
320 residues with ESM-width features) and prints ONE JSON line:

  {"metric": "poses_per_sec", "value": N, "unit": "poses/s",
   "vs_baseline": N / A100_BASELINE_POSES_PER_SEC}

Baseline: the reference (torch/PyG DiffDock-L) samples roughly 1.6 poses/sec
on an A100 at 40 poses x 20 steps (~25 s per 40-pose complex; derived from
published runtimes of the reference pipeline — the repo itself publishes no
numbers, BASELINE.md). vs_baseline is the multiple of that A100 figure; the
north-star target is >= 5.

Extra modes (VERDICT round-1 #4 — realistic sizes):

  python bench.py --buckets   also measure medium (64 lig/1024 res) and
                              large (96 lig/2048 res) buckets; rows go to
                              stderr + BENCH_DETAILS.json
  python bench.py --churn     bucket-churn accounting for a realistic
                              complex-size distribution (distinct compiled
                              programs + measured compile cost per bucket)
"""

import argparse
import json
import sys
import time

import numpy as np

A100_BASELINE_POSES_PER_SEC = 1.6


def _setup(n_lig, n_rec, n_bonds):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from diffdock_tpu.data.complexes import bucket_sizes, pad_to, synthetic_complex
    from diffdock_tpu.models.config import PRESETS
    from diffdock_tpu.models.score_model import CGScoreModel

    cfg = dataclasses.replace(PRESETS["diffdock_l"], compute_dtype="bfloat16")
    model = CGScoreModel(cfg)
    rng = np.random.RandomState(0)
    data = synthetic_complex(
        rng, n_lig=n_lig, n_rec=n_rec, n_bonds=n_bonds, lm_dim=1280
    )
    nl, nr, nb = bucket_sizes(data.n_lig, data.n_rec, data.n_bonds)
    data = jax.tree.map(jnp.asarray, pad_to(data, nl, nr, nb))
    return cfg, model, data, (nl, nr, nb)


def _measure(cfg, model, data, num_poses, steps, n_rep=3):
    import jax
    import jax.numpy as jnp

    from diffdock_tpu.diffusion.so3 import get_so3_tables
    from diffdock_tpu.diffusion.torus import get_torus_tables
    from diffdock_tpu.inference.sampler import (
        SamplerConfig,
        randomize_position,
        reverse_diffusion,
    )

    so3 = get_so3_tables()
    torus = get_torus_tables()
    sampler_cfg = SamplerConfig(inference_steps=steps, actual_steps=steps)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), data, data.lig_pos, jnp.asarray(0.5), so3, torus
    )

    def program(key, data):
        k1, k2 = jax.random.split(key)
        cache = model.apply(params, data, method="embed_receptor")
        init = randomize_position(
            k1, data, num_poses, cfg.sigma.tr_sigma_max,
            sampler_cfg.initial_noise_std_proportion,
        )

        def score_fn(poses, t):
            sc = model.apply(params, data, t, cache, method="step_cache")
            return jax.vmap(
                lambda p: model.apply(
                    params, data, p, t, so3, torus, rec_cache=cache,
                    step_cache=sc,
                )
            )(poses)

        return reverse_diffusion(
            k2, score_fn, data, init, sampler_cfg, cfg.sigma, so3, torus
        )

    fn = jax.jit(program)
    t0 = time.time()
    out = fn(jax.random.PRNGKey(0), data)
    jax.block_until_ready(out)
    compile_time = time.time() - t0

    t0 = time.time()
    for i in range(n_rep):
        out = fn(jax.random.PRNGKey(i + 1), data)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n_rep
    return num_poses / dt, dt, compile_time


def churn_sizes(n=150, seed=7):
    """A realistic PDBBind-test-like complex-size draw (ligand heavy atoms,
    receptor residues): ligands ~8-60 heavy atoms; receptor residues
    log-spread over ~100-3000 with the mass around 200-600 (the reference
    caps receptors at 3000, datasets/process_mols.py:169-170)."""
    rng = np.random.RandomState(seed)
    nl = np.clip(rng.normal(30, 12, n).astype(int), 8, 120)
    nr = np.clip(np.exp(rng.normal(5.9, 0.7, n)).astype(int), 90, 3000)
    return list(zip(nl.tolist(), nr.tolist()))


def run_churn():
    from diffdock_tpu.data.complexes import bucket_sizes

    sizes = churn_sizes()
    buckets = {}
    pad_ratio = []
    for nl, nr in sizes:
        b = bucket_sizes(nl, nr, max(1, nl // 4))
        buckets.setdefault(b, 0)
        buckets[b] += 1
        pad_ratio.append((b[0] * b[1]) / (nl * nr))
    rows = sorted(buckets.items())
    mean_pad = float(np.mean(pad_ratio))
    print(
        f"# churn: {len(sizes)} complexes -> {len(rows)} distinct buckets "
        f"(compiled programs); mean cross-block padding x{mean_pad:.2f}",
        file=sys.stderr,
    )
    for b, n in rows:
        print(f"#   bucket nl={b[0]} nr={b[1]} nb={b[2]}: {n} complexes",
              file=sys.stderr)
    return {
        "complexes": len(sizes),
        "distinct_buckets": len(rows),
        "mean_cross_padding": round(mean_pad, 3),
        "buckets": [{"nl": b[0], "nr": b[1], "nb": b[2], "count": n}
                    for b, n in rows],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", action="store_true",
                    help="also bench medium/large buckets")
    ap.add_argument("--churn", action="store_true",
                    help="bucket-churn accounting for a realistic size mix")
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    details = {}
    if args.churn:
        details["churn"] = run_churn()

    # (name, n_lig, n_rec, poses-in-flight). Large receptors run fewer poses
    # per batch (HBM), like the reference's batch-halving (evaluate.py:523).
    cases = [("small", 32, 320, 40)]
    if args.buckets:
        cases += [("medium", 64, 1024, 16), ("large", 96, 2048, 8)]

    primary = None
    for name, n_lig, n_rec, poses in cases:
        cfg, model, data, bucket = _setup(n_lig, n_rec, max(1, n_lig // 4))
        pps, dt, compile_time = _measure(cfg, model, data, poses, args.steps)
        print(
            f"# {name} bucket nl={bucket[0]} nr={bucket[1]}: "
            f"compile {compile_time:.1f}s, steady {dt:.2f}s per "
            f"{poses}-pose complex ({args.steps} steps) -> "
            f"{pps:.2f} poses/s", file=sys.stderr,
        )
        details[name] = {
            "bucket": {"nl": bucket[0], "nr": bucket[1], "nb": bucket[2]},
            "poses_in_flight": poses,
            "steps": args.steps,
            "compile_s": round(compile_time, 1),
            "steady_s_per_batch": round(dt, 3),
            "poses_per_sec": round(pps, 3),
        }
        if name == "small":
            primary = pps

    if args.buckets or args.churn:
        with open("BENCH_DETAILS.json", "w") as f:
            json.dump(details, f, indent=2)
        print("# wrote BENCH_DETAILS.json", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "poses_per_sec",
                "value": round(primary, 3),
                "unit": "poses/s",
                "vs_baseline": round(primary / A100_BASELINE_POSES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
