"""Phase-level profile of the bench workload on the real chip.

Breaks the 40-pose x 20-step reverse diffusion into its compute phases and
times each as its own jitted function at bench scale, then reports XLA's
cost analysis (FLOPs / bytes) so utilization and roofline position are
visible per phase. Used to direct kernel work (VERDICT round-1 weak #3).
"""

import dataclasses
import json
import sys
import time

import numpy as np


def timeit(fn, *args, n=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n


def cost(fn, *args):
    import jax

    try:
        an = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return {
            "gflops": an.get("flops", 0) / 1e9,
            "gbytes": an.get("bytes accessed", 0) / 1e9,
        }
    except Exception as e:  # noqa: BLE001
        return {"err": str(e)}


def main():
    import jax
    import jax.numpy as jnp

    from diffdock_tpu.data.complexes import bucket_sizes, pad_to, synthetic_complex
    from diffdock_tpu.diffusion.so3 import get_so3_tables
    from diffdock_tpu.diffusion.torus import get_torus_tables
    from diffdock_tpu.inference.sampler import (
        SamplerConfig, randomize_position, reverse_diffusion,
    )
    from diffdock_tpu.models.config import PRESETS
    from diffdock_tpu.models.score_model import CGScoreModel

    num_poses = 40
    cfg = dataclasses.replace(PRESETS["diffdock_l"], compute_dtype="bfloat16")
    model = CGScoreModel(cfg)
    rng = np.random.RandomState(0)
    data = synthetic_complex(rng, n_lig=32, n_rec=320, n_bonds=8, lm_dim=1280)
    nl, nr, nb = bucket_sizes(data.n_lig, data.n_rec, data.n_bonds)
    data = jax.tree.map(jnp.asarray, pad_to(data, nl, nr, nb))
    print(f"bucket: nl={nl} nr={nr} nb={nb}", file=sys.stderr)

    so3 = get_so3_tables()
    torus = get_torus_tables()
    sampler_cfg = SamplerConfig(inference_steps=20, actual_steps=20)

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), data, data.lig_pos, jnp.asarray(0.5), so3, torus
    )

    # phase: receptor embedding (once per complex)
    embed = jax.jit(lambda d: model.apply(params, d, method="embed_receptor"))
    t_embed = timeit(embed, data)
    cache = embed(data)

    # phase: score forward, 40 poses vmapped (the sampler body's meat)
    poses0 = randomize_position(
        jax.random.PRNGKey(1), data, num_poses, cfg.sigma.tr_sigma_max,
        sampler_cfg.initial_noise_std_proportion,
    )

    def fwd(poses, t):
        return jax.vmap(
            lambda p: model.apply(params, data, p, t, so3, torus,
                                  rec_cache=cache)
        )(poses)

    fwd_j = jax.jit(fwd)
    t_fwd = timeit(fwd_j, poses0, jnp.asarray(0.5))
    c_fwd = cost(fwd, poses0, jnp.asarray(0.5))

    # phase: full sampler (includes 20x fwd + geometry updates)
    def program(key):
        k1, k2 = jax.random.split(key)
        init = randomize_position(
            k1, data, num_poses, cfg.sigma.tr_sigma_max,
            sampler_cfg.initial_noise_std_proportion,
        )

        def score_fn(poses, t):
            return jax.vmap(
                lambda p: model.apply(params, data, p, t, so3, torus,
                                      rec_cache=cache)
            )(poses)

        return reverse_diffusion(
            k2, score_fn, data, init, sampler_cfg, cfg.sigma, so3, torus
        )

    prog_j = jax.jit(program)
    t_prog = timeit(prog_j, jax.random.PRNGKey(0), n=3)

    report = {
        "embed_receptor_ms": round(t_embed * 1e3, 2),
        "fwd40_ms": round(t_fwd * 1e3, 2),
        "fwd40_cost": c_fwd,
        "sampler20_ms": round(t_prog * 1e3, 2),
        "fwd_fraction": round(20 * t_fwd / t_prog, 3),
        "poses_per_sec": round(num_poses / (t_prog + t_embed), 2),
    }
    if "gflops" in c_fwd:
        # v5e: ~197 bf16 TFLOP/s, 819 GB/s HBM
        report["fwd_tflops_util_pct"] = round(
            100 * c_fwd["gflops"] / 1e3 / (t_fwd * 197), 2
        )
        report["fwd_hbm_util_pct"] = round(
            100 * c_fwd["gbytes"] / (t_fwd * 819), 2
        )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
