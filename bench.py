"""Benchmark: DiffDock-L-scale docking throughput on one TPU chip.

Measures steady-state reverse-diffusion throughput (poses/sec) for the
flagship score model at the paper-eval recipe (20 denoising steps per pose,
40 poses in flight) on a realistic complex size (32 ligand atoms / 320
residues with ESM-width features).

Prints ONE JSON line:
  {"metric": "poses_per_sec", "value": N, "unit": "poses/s",
   "vs_baseline": N / A100_BASELINE_POSES_PER_SEC}

Baseline: the reference (torch/PyG DiffDock-L) samples roughly 1.6 poses/sec
on an A100 at 40 poses x 20 steps (~25 s per 40-pose complex; derived from
published runtimes of the reference pipeline — the repo itself publishes no
numbers, BASELINE.md). vs_baseline is the multiple of that A100 figure; the
north-star target is >= 5.
"""

import json
import sys
import time

import numpy as np

A100_BASELINE_POSES_PER_SEC = 1.6


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from diffdock_tpu.data.complexes import bucket_sizes, pad_to, synthetic_complex
    from diffdock_tpu.diffusion.so3 import get_so3_tables
    from diffdock_tpu.diffusion.torus import get_torus_tables
    from diffdock_tpu.inference.sampler import (
        SamplerConfig,
        randomize_position,
        reverse_diffusion,
    )
    from diffdock_tpu.models.config import PRESETS
    from diffdock_tpu.models.score_model import CGScoreModel

    num_poses = 40
    steps = 20

    # bf16 conv-layer compute: 1.43x over fp32 on v5e with pose statistics
    # and docking RMSDs matching fp32 (validated end-to-end; params, batch
    # norm and accumulations stay float32)
    cfg = dataclasses.replace(PRESETS["diffdock_l"], compute_dtype="bfloat16")
    model = CGScoreModel(cfg)
    rng = np.random.RandomState(0)
    data = synthetic_complex(rng, n_lig=32, n_rec=320, n_bonds=8, lm_dim=1280)
    nl, nr, nb = bucket_sizes(data.n_lig, data.n_rec, data.n_bonds)
    data = jax.tree.map(jnp.asarray, pad_to(data, nl, nr, nb))

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
            return jax.vmap(
                lambda p: model.apply(
                    params, data, p, t, so3, torus, rec_cache=cache
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
    print(f"# compile+first run: {compile_time:.1f}s", file=sys.stderr)

    n_rep = 3
    t0 = time.time()
    for i in range(n_rep):
        out = fn(jax.random.PRNGKey(i + 1), data)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n_rep
    poses_per_sec = num_poses / dt
    print(
        f"# steady: {dt:.2f}s per {num_poses}-pose complex "
        f"({steps} steps)", file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "poses_per_sec",
                "value": round(poses_per_sec, 3),
                "unit": "poses/s",
                "vs_baseline": round(
                    poses_per_sec / A100_BASELINE_POSES_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
