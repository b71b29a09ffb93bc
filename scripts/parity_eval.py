"""Released-checkpoint parity harness: dock the reference examples and
report symmetry RMSDs + confidence ordering.

Given converted checkpoint dirs (``cli.import_weights`` output for the
reference score + confidence .pt files), docks every protein/ligand pair in
``/root/reference/examples`` (or --examples_dir) and prints, per complex,
the symmetry-corrected RMSD of each confidence-ranked pose against the
bundled crystal ligand, plus the aggregate %top1<2A / %top5<2A the
reference reports (evaluate.py:474-484).

Usage::

    PYTHONPATH=/root/repo python scripts/parity_eval.py \
        --score_model_dir workdir/tpu_score_model \
        --confidence_model_dir workdir/tpu_confidence_model \
        [--examples_dir /root/reference/examples] [--samples 10]

Without checkpoint dirs it runs random weights (pipeline smoke only) —
RMSD numbers are then meaningless and flagged as such.

DiffDock-L expects ESM2 embeddings; if the score config requires them and
no live ESM is available, zero embeddings are substituted with a warning
(parity numbers then measure the zero-LM operating point only).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_pairs(examples_dir):
    pairs = []
    for lig in sorted(glob.glob(os.path.join(examples_dir, "*_ligand.sdf"))):
        stem = os.path.basename(lig)[: -len("_ligand.sdf")]
        for suffix in ("_protein_processed.pdb", "_protein.pdb"):
            prot = os.path.join(examples_dir, stem + suffix)
            if os.path.exists(prot):
                pairs.append((stem, prot, lig))
                break
    return pairs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--score_model_dir", default=None)
    p.add_argument("--confidence_model_dir", default=None)
    p.add_argument("--examples_dir", default="/root/reference/examples")
    p.add_argument("--samples", type=int, default=10)
    p.add_argument("--inference_steps", type=int, default=20)
    p.add_argument("--actual_steps", type=int, default=19)
    p.add_argument("--out_dir", default="results/parity_eval")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from diffdock_tpu.data.chem import read_molecule_file, read_pdb_file
    from diffdock_tpu.data.esm import compute_esm_embeddings_if_available
    from diffdock_tpu.eval.rmsd import molecular_automorphisms, symmetry_rmsd
    from diffdock_tpu.inference.pipeline import DockingPipeline
    from diffdock_tpu.inference.sampler import SamplerConfig
    from diffdock_tpu.models.config import PRESETS
    from diffdock_tpu.train.checkpoints import load_checkpoint

    sampler_cfg = SamplerConfig(
        inference_steps=args.inference_steps, actual_steps=args.actual_steps
    )

    random_weights = args.score_model_dir is None
    if random_weights:
        print("WARNING: no --score_model_dir; docking with RANDOM weights — "
              "RMSDs below are NOT parity numbers.", file=sys.stderr)
        import dataclasses

        from diffdock_tpu.data.complexes import synthetic_complex
        from diffdock_tpu.diffusion.so3 import get_so3_tables
        from diffdock_tpu.diffusion.torus import get_torus_tables
        from diffdock_tpu.models.score_model import CGScoreModel

        cfg = dataclasses.replace(
            PRESETS["diffdock_s"], num_prot_emb_layers=1
        )
        model = CGScoreModel(cfg)
        d = synthetic_complex(np.random.RandomState(0))
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jax.tree.map(jnp.asarray, d),
            jnp.asarray(d.lig_pos), jnp.asarray(0.5),
            get_so3_tables(), get_torus_tables(),
        )
    else:
        params, cfg, _ = load_checkpoint(args.score_model_dir)

    conf_cfg = conf_params = None
    if args.confidence_model_dir:
        conf_params, conf_cfg, _ = load_checkpoint(args.confidence_model_dir)

    pipeline = DockingPipeline(
        score_cfg=cfg, score_params=params, sampler_cfg=sampler_cfg,
        confidence_cfg=conf_cfg, confidence_params=conf_params,
    )

    pairs = find_pairs(args.examples_dir)
    if not pairs:
        print(f"no examples found in {args.examples_dir}", file=sys.stderr)
        return 2
    print(f"{len(pairs)} complexes from {args.examples_dir}")

    need_lm = cfg.lm_embedding_dim > 0 or (
        conf_cfg is not None and conf_cfg.lm_embedding_dim > 0
    )

    rows = []
    for name, prot_path, lig_path in pairs:
        t0 = time.time()
        try:
            mol = read_molecule_file(lig_path)
            protein = read_pdb_file(prot_path)
            lm = None
            if need_lm:
                lm = compute_esm_embeddings_if_available(protein)
                if lm is None:
                    print(f"[{name}] WARNING: ESM unavailable; zero LM "
                          "embeddings substituted", file=sys.stderr)
                    lm = np.zeros(
                        (len(protein.residues_with_ca()), 1280), np.float32
                    )
            result = pipeline.dock_mol_protein(
                mol, protein, os.path.join(args.out_dir, name),
                num_poses=args.samples, seed=args.seed, lm_embeddings=lm,
            )
            # ground truth = the bundled crystal ligand heavy atoms
            heavy = [i for i, el in enumerate(mol.elements) if el != "H"]
            ref_pos = mol.coords[heavy]
            hmap = {a: k for k, a in enumerate(heavy)}
            bonds = [
                (hmap[i], hmap[j]) for i, j, _ in mol.bonds
                if i in hmap and j in hmap
            ]
            elements = [mol.elements[i] for i in heavy]
            perms = molecular_automorphisms(elements, bonds)
            rmsds = symmetry_rmsd(
                ref_pos, result.poses, elements, bonds, perms=perms
            )
            ranked = rmsds[result.order]
            rows.append((name, ranked, result.confidence, time.time() - t0))
            conf_str = (
                " ".join(f"{c:+.2f}" for c in np.asarray(
                    result.confidence)[result.order])
                if result.confidence is not None else "n/a"
            )
            print(f"[{name}] rmsd(ranked): "
                  + " ".join(f"{r:.2f}" for r in ranked)
                  + f" | confidence: {conf_str}"
                  + f" | {time.time() - t0:.1f}s")
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"[{name}] FAILED: {type(e).__name__}: {e}", file=sys.stderr)

    if rows:
        top1 = np.array([r[1][0] for r in rows])
        top5 = np.array([r[1][: min(5, len(r[1]))].min() for r in rows])
        best = np.array([r[1].min() for r in rows])
        tag = " (RANDOM WEIGHTS — not parity)" if random_weights else ""
        print(f"\n== aggregate over {len(rows)} complexes{tag} ==")
        print(f"top1 <2A: {100.0 * (top1 < 2).mean():.1f}%  "
              f"(median {np.median(top1):.2f}A)")
        print(f"top5 <2A: {100.0 * (top5 < 2).mean():.1f}%  "
              f"(median {np.median(top5):.2f}A)")
        print(f"best-of-{args.samples} <2A: {100.0 * (best < 2).mean():.1f}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
