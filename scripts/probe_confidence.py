"""Probe: per-batch cost of the DEFAULT confidence-stage forward on chip.

The reference's measured ``run_times`` include the confidence-model
forward on the final poses (reference ``utils/sampling.py:208-227``
inside the timed region at ``evaluate.py:384,410``); bench.py's headline
has so far charged only the score trajectory (VERDICT r4 missing #1).
The shipped default confidence architecture is the OLD all-atom model
(reference ``inference.py:84`` --old_confidence_model default True) at
the published scale (ns=24, nv=6, 5 conv layers, ESM embeddings — paper
appendix; confidence/confidence_train.py defaults are smaller but the
released checkpoint used these).

This probe times exactly the pipeline's confidence branch — a jitted
vmap of the confidence forward over the P final poses at a cover-ladder
bucket's padded shapes — so the marginal per-batch cost can be folded
into the weighted plan additively.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_confidence.py
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import _enable_cache_logging  # noqa: E402

ATOMS_PER_RES = 8  # ~7.8 heavy atoms/residue in PDBBind receptors

# (nl, nr, nb, P) cover entries to probe: the top-weight mid bucket, a
# small bucket, and the largest (18k-atom) bucket
PROBES = [
    (32, 384, 16, 40),
    (16, 640, 16, 40),
    (96, 2304, 32, 8),
]


def main():
    import jax
    import jax.numpy as jnp

    from diffdock_tpu.data.complexes import pad_aa_to, synthetic_aa_complex
    from diffdock_tpu.diffusion.so3 import get_so3_tables
    from diffdock_tpu.diffusion.torus import get_torus_tables
    from diffdock_tpu.models.config import PRESETS
    from diffdock_tpu.models.factory import build_model
    from diffdock_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    _enable_cache_logging()

    conf_cfg = dataclasses.replace(
        PRESETS["diffdock_s"],
        ns=24, nv=6, num_conv_layers=5,
        confidence_mode=True, old_architecture=True, all_atoms=True,
        lm_embedding_dim=1280, compute_dtype="bfloat16",
    )
    model = build_model(conf_cfg)
    so3 = get_so3_tables()
    torus = get_torus_tables()

    rng = np.random.RandomState(0)
    small = jax.tree.map(
        jnp.asarray,
        synthetic_aa_complex(rng, n_lig=16, n_rec=64, n_bonds=4,
                             atoms_per_res=ATOMS_PER_RES, lm_dim=1280),
    )
    t0 = time.time()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), small, small.base.lig_pos,
        jnp.asarray(0.0), so3, torus,
    )
    print(f"# init: {time.time() - t0:.1f}s", file=sys.stderr)

    from diffdock_tpu.inference.pipeline import _auto_confidence_chunk

    @jax.jit
    def conf_forward(params, aa, poses):
        # mirror the pipeline's confidence branch exactly: HBM-auto pose
        # chunk, lax.map over chunks (pipeline.py _make_run)
        P, nl = poses.shape[0], poses.shape[1]
        na = aa.atom_pos.shape[0]
        c = _auto_confidence_chunk(nl, na, P)
        fwd = lambda p: model.apply(params, aa, p, jnp.asarray(0.0), so3,
                                    torus)
        if c >= P:
            return jax.vmap(fwd)(poses)
        pad = (-P) % c
        pp = jnp.concatenate([poses, poses[:pad]]) if pad else poses
        out = jax.lax.map(jax.vmap(fwd), pp.reshape((-1, c) + poses.shape[1:]))
        return out.reshape((-1,) + out.shape[2:])[:P]

    rows = {}
    for nl, nr, nb, P in PROBES:
        na = nr * ATOMS_PER_RES
        data = synthetic_aa_complex(
            rng, n_lig=nl, n_rec=nr, n_bonds=nb,
            atoms_per_res=ATOMS_PER_RES, lm_dim=1280,
        )
        padded = jax.tree.map(jnp.asarray,
                              pad_aa_to(data, nl, nr, nb, na))
        poses = jnp.asarray(
            np.asarray(padded.base.lig_pos)[None]
            + rng.randn(P, nl, 3).astype(np.float32)
        )
        try:
            t0 = time.time()
            jax.block_until_ready(conf_forward(params, padded, poses))
            compile_s = time.time() - t0
            reps = []
            for _ in range(3):
                t0 = time.time()
                jax.block_until_ready(conf_forward(params, padded, poses))
                reps.append(time.time() - t0)
            steady = float(np.mean(reps))
            rows[f"{nl}x{nr}"] = {
                "na": na, "poses": P,
                "chunk": _auto_confidence_chunk(nl, na, P),
                "compile_s": round(compile_s, 1),
                "steady_s_per_batch": round(steady, 4),
                "s_per_pose": round(steady / P, 5),
            }
            print(f"# conf {nl}x{nr} na={na} P={P}: compile "
                  f"{compile_s:.1f}s steady {steady:.3f}s/batch "
                  f"({steady / P * 1e3:.1f} ms/pose)", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — probe records failures
            rows[f"{nl}x{nr}"] = {"na": na, "poses": P,
                                  "error": f"{type(e).__name__}: {e}"[:300]}
            print(f"# conf {nl}x{nr} FAILED: {e}", file=sys.stderr)
    print(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
