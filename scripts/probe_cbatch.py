"""Probe: multi-complex batching inside ONE device program (VERDICT r3
ask #8).

PERF.md's residual analysis says the forward is pipeline-overhead-bound:
thousands of tiny batched-matmul elements at small hidden sizes. The one
unmeasured algorithmic lever is batching C same-bucket COMPLEXES x P
poses into one dispatch stream (fewer, fatter dispatches; would also
fill partial pose batches in sweeps). This script A/Bs, at the 32x320
cover bucket:

  A: the production program, C=1 complex x P=40 poses     (40 in flight)
  B: jit(vmap(program)) over C=4 complexes x P=40 poses  (160 in flight)
  C: C=4 complexes x P=10 poses                           (40 in flight)

B tests whether 4x more in-flight work amortizes per-element pipeline
overhead; C tests whether the same in-flight total split across
complexes costs anything (it shouldn't: identical op shapes after vmap
flattening). Reference contrast: the reference processes complexes
strictly sequentially through eager PyG (evaluate.py:355-408).

Run on an IDLE chip:  python scripts/probe_cbatch.py
Banks results under ``cbatch_probe`` in BENCH_DETAILS.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import _make_pipeline
from scripts.bench_train import bank_rows

REPS = int(os.environ.get("CBATCH_REPS", 3))
NL, NR, NB = 32, 320, 16


def main():
    from diffdock_tpu.data.complexes import (
        bucket_sizes,
        pad_to,
        synthetic_complex,
    )

    pipeline = _make_pipeline()
    rng = np.random.RandomState(1)
    datas = []
    for i in range(4):
        d = synthetic_complex(rng, n_lig=NL, n_rec=NR, n_bonds=NB,
                              lm_dim=1280)
        assert bucket_sizes(d.n_lig, d.n_rec, d.n_bonds) == (NL, NR, NB)
        datas.append(jax.tree.map(jnp.asarray, pad_to(d, NL, NR, NB)))
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *datas)
    params = (pipeline.score_params, None)
    pocket = jnp.zeros((4,), jnp.float32)
    pockets = jnp.zeros((4, 4), jnp.float32)
    rows = {}

    def measure(label, fn, args, poses_total):
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        compile_s = time.time() - t0
        t0 = time.time()
        for _ in range(REPS):
            jax.block_until_ready(fn(*args))
        dt = (time.time() - t0) / REPS
        pps = poses_total / dt
        rows[label] = {
            "compile_s": round(compile_s, 1),
            "s_per_batch": round(dt, 3),
            "poses_in_flight": poses_total,
            "poses_per_sec": round(pps, 2),
        }
        print(f"# {label}: compile {compile_s:.1f}s, {dt:.3f}s/batch, "
              f"{pps:.2f} poses/s", file=sys.stderr, flush=True)
        return pps

    # A: production single-complex program, P=40
    fn_a = jax.jit(pipeline._program(40, False, False))
    key = jax.random.PRNGKey(0)
    tables = (pipeline.so3, pipeline.torus)
    pps_a = measure("c1_p40", fn_a, (tables, params, key, datas[0], None, pocket), 40)

    # B: C=4 complexes x P=40 in one program (4x in-flight work)
    def cbatch(num_poses):
        base = pipeline._program(num_poses, False, False)

        def run(tables, all_params, keys, batch, aa, pks):
            return jax.vmap(
                lambda k, d, p: base(tables, all_params, k, d, None, p),
                in_axes=(0, 0, 0),
            )(keys, batch, pks)

        return jax.jit(run)

    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    pps_b = measure("c4_p40", cbatch(40),
                    (tables, params, keys, stacked, None, pockets), 160)

    # C: C=4 x P=10 (same 40 in flight as A, split across complexes)
    pps_c = measure("c4_p10", cbatch(10),
                    (tables, params, keys, stacked, None, pockets), 40)

    rows["speedup_c4_p40_vs_c1_p40"] = round(pps_b / pps_a, 3)
    rows["speedup_c4_p10_vs_c1_p40"] = round(pps_c / pps_a, 3)
    print(json.dumps(rows))
    bank_rows(rows, key="cbatch_probe")


if __name__ == "__main__":
    main()
