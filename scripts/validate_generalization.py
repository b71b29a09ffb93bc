"""Leave-one-out generalization gate (VERDICT r3 ask #3).

Six folds over the reference example complexes: train ONE score model on
five of them, dock the HELD-OUT one (never seen in training), and report
per-fold best/median RMSD. Then train a confidence classifier on poses
generated for the five TRAINING complexes only and measure its ranking
lift on the held-out complex's poses — the unseen-complex analogue of the
reference's timesplit evaluation contract (the test complexes of
``evaluate.py:347-527`` are unseen at training time).

This extends scripts/validate_multicomplex.py (which trains and evaluates
on the same six complexes — a memorization gate). With no released
checkpoints, no PDBBind, and no network in this image, 5-complex training
is far below the generalization data regime of the real model (17k+
complexes); the gate's value is an HONEST measurement of what a small
model learns that transfers across complexes, with the same manifold,
losses, sampler, and ranking machinery as production.

Run on the real TPU:

    PYTHONPATH=.:/root/.axon_site python scripts/validate_generalization.py

Writes results/generalization_gate.json. All folds share one padded
bucket, so the train step, dock program, and confidence programs each
compile ONCE and are reused across folds (and across runs via the
persistent cache).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from diffdock_tpu.data.chem import read_molecule_file, read_pdb_file
from diffdock_tpu.data.complexes import bucket_sizes, pad_to
from diffdock_tpu.data.featurize import build_complex_data, pocket_crop_complex
from diffdock_tpu.diffusion.so3 import get_so3_tables
from diffdock_tpu.diffusion.torus import get_torus_tables
from diffdock_tpu.eval.rmsd import molecular_automorphisms, symmetry_rmsd
from diffdock_tpu.inference.pipeline import DockingPipeline
from diffdock_tpu.inference.sampler import SamplerConfig
from diffdock_tpu.models.config import ScoreModelConfig
from diffdock_tpu.models.factory import build_model
from diffdock_tpu.train.confidence import (
    ConfidenceTrainConfig, make_confidence_train_step,
)
from diffdock_tpu.train.trainer import (
    TrainConfig, create_train_state, make_train_step, training_model_config,
)
from diffdock_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

EX = "/root/reference/examples"
NAMES = ["1a46", "1cbr", "6ahs", "6moa", "6o5u", "6w70"]
PROT = {"1cbr": "1cbr_protein.pdb", "6w70": "6w70.pdb"}
POCKET = 128
N_TRAIN_STEPS = int(os.environ.get("GEN_TRAIN_STEPS", 5000))
N_POSES = int(os.environ.get("GEN_POSES", 16))      # per dock call
HELD_POSE_SETS = int(os.environ.get("GEN_HELD_SETS", 3))   # 48 held poses
TRAIN_POSE_SETS = int(os.environ.get("GEN_TRAIN_SETS", 2))  # 32 per train cx
CONF_EPOCHS = int(os.environ.get("GEN_CONF_EPOCHS", 150))
FOLDS = os.environ.get("GEN_FOLDS")  # e.g. "6w70,1a46" to run a subset

# Van-der-Mers augmentation (VERDICT r4 ask #3; reference
# ``datasets/pdb.py:150-537`` + combined training ``loader.py:30-122``):
# mint GEN_VDM sidechain pseudo-ligand complexes per fold from the
# TRAINING receptors only (held-out receptor excluded — no pocket
# leakage) and mix GEN_VDM_PER_BATCH of them into every 5-complex train
# batch. 0 (default) reproduces the unaugmented gate exactly.
N_VDM = int(os.environ.get("GEN_VDM", 0))
VDM_PER_BATCH = int(os.environ.get("GEN_VDM_PER_BATCH", 2))
GATE_OUT = os.environ.get(
    "GEN_OUT",
    "results/generalization_gate_vdm.json" if N_VDM
    else "results/generalization_gate.json",
)

# ---------------------------------------------------------------- load
datas, mols = {}, {}
for n in NAMES:
    mol = read_molecule_file(f"{EX}/{n}_ligand.sdf")
    prot = read_pdb_file(f"{EX}/{PROT.get(n, n + '_protein_processed.pdb')}")
    data, heavy = build_complex_data(mol, prot)
    datas[n] = pocket_crop_complex(data, POCKET)
    mols[n] = heavy

buckets = [bucket_sizes(d.n_lig, d.n_rec, d.n_bonds) for d in datas.values()]
NL, NR, NB = (max(b[i] for b in buckets) for i in range(3))
print(f"shared bucket: lig {NL} rec {NR} bonds {NB}", flush=True)
padded = {n: pad_to(d, NL, NR, NB) for n, d in datas.items()}

so3 = get_so3_tables()
torus = get_torus_tables()

cfg = training_model_config(
    ScoreModelConfig(ns=24, nv=6, num_conv_layers=3, num_prot_emb_layers=1,
                     dynamic_max_cross=True, cross_max_distance=250.0),
    data_parallel=False)
model = build_model(cfg)
tc = TrainConfig(lr=1e-3)
_train_step_fn = make_train_step(model, tc, so3, torus)
step = jax.jit(_train_step_fn)


@jax.jit
def aug_step(state, pool, idx, key):
    """Van-der-Mers combined-training step: gather a 5-complex batch from
    the device-resident candidate pool (traced, so the pool never leaves
    HBM and no per-leaf eager dispatch pays the axon round-trip)."""
    sel = jax.tree.map(lambda x: x[idx], pool)
    return _train_step_fn(state, sel, key)


infer_cfg = dataclasses.replace(cfg, bn_axis_names=())

tcfg = ConfidenceTrainConfig(rmsd_classification_cutoff=(2.0,), lr=1e-3)
conf_cfg = training_model_config(
    ScoreModelConfig(ns=24, nv=6, num_conv_layers=3, num_prot_emb_layers=1,
                     confidence_mode=True,
                     num_confidence_outputs=tcfg.num_outputs),
    data_parallel=False)
conf_model = build_model(conf_cfg)
ctrain_fn, ctx = make_confidence_train_step(conf_model, tcfg, so3, torus)
ctrain = jax.jit(ctrain_fn)


def conf_scores_fn(cparams, cstats, data, poses):
    def one(pos):
        out = conf_model.apply(
            {"params": cparams, "batch_stats": cstats},
            data, pos, jnp.asarray(0.0), so3, torus, train=False)
        return out[..., 0]
    return jax.vmap(one)(poses)


conf_scores_fn = jax.jit(conf_scores_fn)


def mint_vdm_complexes(train_names, seed, count):
    """Sidechain pseudo-ligand complexes from the training receptors,
    pocket-cropped and padded to the fold's shared bucket so the SAME
    compiled train step serves them (no new programs)."""
    import shutil
    import tempfile

    from diffdock_tpu.data.pdb_sidechain import (
        PDBSidechainConfig,
        PDBSidechainDataset,
    )

    tmp = tempfile.mkdtemp(prefix="vdm_")
    try:
        for n in train_names:
            shutil.copy(
                f"{EX}/{PROT.get(n, n + '_protein_processed.pdb')}",
                os.path.join(tmp, n + ".pdb"),
            )
        ds = PDBSidechainDataset(PDBSidechainConfig(
            data_dir=tmp, cache_dir=os.path.join(tmp, "cache"),
            remove_second_segment=True,
        ))
        ds.preprocess(verbose=False)
        rng = np.random.RandomState(seed)
        out, tries = [], 0
        while len(out) < count and tries < count * 8:
            tries += 1
            item = ds.get(int(rng.randint(1 << 30)), rng)
            if item is None:
                continue
            _, d = item
            d = pocket_crop_complex(d, POCKET)
            if d.n_lig > NL or d.n_rec > NR or d.n_bonds > NB:
                continue
            out.append(pad_to(d, NL, NR, NB))
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def true_pocket_center(data_real):
    """Reference ``utils/sampling.py:20-29``: mean of receptor residues
    within 5 A of any true ligand atom (centered frame)."""
    rec = np.asarray(data_real.rec_pos)[np.asarray(data_real.rec_mask, bool)]
    lig = np.asarray(data_real.lig_pos)[np.asarray(data_real.lig_mask, bool)]
    d = np.linalg.norm(rec[:, None] - lig[None], axis=-1)
    label = (d < 5.0).any(axis=1)
    if label.any():
        return rec[label].mean(axis=0)
    return rec[d.min(axis=1).argmin()]


def dock_and_rmsd(pipe, n, n_sets, seed0, pocket_center=None):
    """Dock complex ``n`` n_sets x N_POSES times; returns (poses, rmsds)
    in the original frame with symmetry-corrected RMSD to the crystal."""
    data = padded[n]
    heavy = mols[n]
    bonds = [(i, j) for i, j, _ in heavy.bonds]
    perms = molecular_automorphisms(heavy.elements, bonds)
    ref = (np.asarray(data.lig_pos) + np.asarray(data.original_center))[
        : datas[n].n_lig]
    all_poses, all_rmsds = [], []
    for s in range(n_sets):
        res = pipe.dock_complex(data, num_poses=N_POSES, seed=seed0 + 17 * s,
                                pocket_center=pocket_center)
        real = res.poses[:, : datas[n].n_lig]
        r = symmetry_rmsd(ref, real, heavy.elements, bonds, perms=perms)
        all_poses.append(res.poses)
        all_rmsds.append(np.asarray(r))
    return np.concatenate(all_poses), np.concatenate(all_rmsds)


fold_names = FOLDS.split(",") if FOLDS else NAMES
gate = {"folds": {}, "config": {
    "train_steps": N_TRAIN_STEPS, "held_poses": HELD_POSE_SETS * N_POSES,
    "train_poses_per_complex": TRAIN_POSE_SETS * N_POSES,
    "pocket_residues": POCKET, "conf_epochs": CONF_EPOCHS,
    "vdm_per_fold": N_VDM, "vdm_per_batch": VDM_PER_BATCH if N_VDM else 0,
}}

for fold_i, held in enumerate(fold_names):
    train_names = [n for n in NAMES if n != held]
    print(f"\n===== fold {fold_i}: hold out {held}, train on "
          f"{train_names} =====", flush=True)

    # ---- score-model training on the 5 training complexes
    ex = jax.tree.map(jnp.asarray, padded[train_names[0]])
    state = create_train_state(model, ex, so3, torus, tc,
                               jax.random.PRNGKey(fold_i))
    batch = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[jax.tree.map(jnp.asarray, padded[n]) for n in train_names])

    vdm_pool = (
        mint_vdm_complexes(train_names, 1000 + fold_i, N_VDM)
        if N_VDM else []
    )
    if N_VDM:
        print(f"  van-der-Mers pool: {len(vdm_pool)} pseudo-complexes "
              f"({VDM_PER_BATCH}/batch)", flush=True)
        # device-resident candidate pool (5 real + minted, all the same
        # padded bucket); per-step batch selection is a traced gather
        # INSIDE the jitted aug_step — no eager per-leaf dispatches over
        # the axon tunnel
        pool = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *([jax.tree.map(jnp.asarray, padded[n]) for n in train_names]
              + [jax.tree.map(jnp.asarray, p) for p in vdm_pool]))
        rng_vdm = np.random.RandomState(500 + fold_i)

    stages = [(1.0, int(N_TRAIN_STEPS * 0.5)),
              (0.3, int(N_TRAIN_STEPS * 0.3)),
              (0.1, N_TRAIN_STEPS - int(N_TRAIN_STEPS * 0.5)
               - int(N_TRAIN_STEPS * 0.3))]
    t_all = time.time()
    i_global = 0
    for scale, n_steps in stages:
        state = state.replace(lr_scale=jnp.asarray(scale, jnp.float32))
        for _ in range(n_steps):
            key = jax.random.PRNGKey(fold_i * 10 ** 6 + i_global)
            if N_VDM and vdm_pool:
                k = min(VDM_PER_BATCH, len(vdm_pool))
                idx = np.concatenate([
                    rng_vdm.choice(5, 5 - k, replace=False),
                    5 + rng_vdm.choice(len(vdm_pool), k, replace=False),
                ])
                state, m = aug_step(
                    state, pool, jnp.asarray(idx, jnp.int32), key
                )
            else:
                state, m = step(state, batch, key)
            i_global += 1
            if i_global % 1000 == 0:
                print(f"  step {i_global}: loss {float(m['loss']):.4f}",
                      flush=True)
    print(f"  {i_global} steps in {time.time() - t_all:.0f}s, final loss "
          f"{float(m['loss']):.4f}", flush=True)

    params_tree = {"params": state.params, "batch_stats": state.batch_stats}
    pipe = DockingPipeline(
        infer_cfg, params_tree,
        SamplerConfig(), so3_tables=so3, torus_tables=torus)

    # ---- dock the HELD-OUT complex (never seen in training)
    held_poses, held_rmsds = dock_and_rmsd(
        pipe, held, HELD_POSE_SETS, seed0=3)
    row = {
        "held_out": held,
        "best_rmsd": float(held_rmsds.min()),
        "median_rmsd": float(np.median(held_rmsds)),
        "frac_lt2": float((held_rmsds < 2).mean()),
        "frac_lt5": float((held_rmsds < 5).mean()),
        "n_poses": int(len(held_rmsds)),
    }
    print(f"  [{held}] HELD-OUT best {row['best_rmsd']:.2f} A median "
          f"{row['median_rmsd']:.2f} A frac<2 {row['frac_lt2']:.2f} "
          f"frac<5 {row['frac_lt5']:.2f}", flush=True)

    # ---- pocket-knowledge variant (reference evaluate.py:364-368):
    # initial placement at the true pocket center with pocket_tr_max=3 —
    # decomposes blind-search transfer from local-refinement transfer
    pk_pipe = DockingPipeline(
        infer_cfg, params_tree,
        SamplerConfig(pocket_tr_max=3.0),
        so3_tables=so3, torus_tables=torus)
    pk_center = true_pocket_center(datas[held])
    pk_poses, pk_rmsds = dock_and_rmsd(
        pk_pipe, held, HELD_POSE_SETS, seed0=7, pocket_center=pk_center)
    row["pocket_knowledge"] = {
        "best_rmsd": float(pk_rmsds.min()),
        "median_rmsd": float(np.median(pk_rmsds)),
        "frac_lt2": float((pk_rmsds < 2).mean()),
        "frac_lt5": float((pk_rmsds < 5).mean()),
    }
    print(f"  [{held}] POCKET-GIVEN best {pk_rmsds.min():.2f} A median "
          f"{np.median(pk_rmsds):.2f} A frac<2 {(pk_rmsds < 2).mean():.2f} "
          f"frac<5 {(pk_rmsds < 5).mean():.2f}", flush=True)

    # ---- confidence: train on TRAIN-complex poses, rank HELD-OUT poses
    bank0 = {n: dock_and_rmsd(pipe, n, TRAIN_POSE_SETS, seed0=101)
             for n in train_names}
    # divergence filter (as in validate_multicomplex): overfit small
    # models can run away on OOD positions; not a ranking regime
    bank = {n: (p[r < 100.0], r[r < 100.0]) for n, (p, r) in bank0.items()}
    # a fully-diverged member would leave an empty pose bank (randint(0)
    # crash after the expensive score training) — keep its best pose so
    # the sampling below stays well-defined
    bank = {
        n: (p, r) if len(r)
        else (p0[[int(np.argmin(r0))]], r0[[int(np.argmin(r0))]])
        for (n, (p, r)), (p0, r0) in zip(bank.items(), bank0.values())
    }
    keep_held = held_rmsds < 100.0
    if not keep_held.any():
        keep_held = np.ones_like(keep_held)  # rank all rather than crash
    train_rmsds_flat = np.concatenate([bank[n][1] for n in train_names])
    cutoff = 2.0
    frac_pos = float((train_rmsds_flat < cutoff).mean())
    if frac_pos < 0.05 or frac_pos > 0.95:
        cutoff = float(np.quantile(train_rmsds_flat, 0.3))
        print(f"  labels degenerate -> adaptive cutoff {cutoff:.2f} A",
              flush=True)
    fold_tcfg = dataclasses.replace(
        tcfg, rmsd_classification_cutoff=(cutoff,))

    d0 = jax.tree.map(jnp.asarray, padded[train_names[0]])
    variables = jax.jit(conf_model.init)(
        jax.random.PRNGKey(7 + fold_i), d0,
        jnp.asarray(bank[train_names[0]][0][0]) - d0.original_center,
        jnp.asarray(0.0), so3, torus)
    cparams, cstats = variables["params"], variables.get("batch_stats", {})
    copt = ctx.init(cparams)
    rng_np = np.random.RandomState(fold_i)
    BATCH = 5
    for epoch in range(CONF_EPOCHS):
        order = [train_names[i % 5] for i in rng_np.permutation(5 * 4)]
        for start in range(0, len(order) - BATCH + 1, BATCH):
            bn = order[start:start + BATCH]
            stacked = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[jax.tree.map(jnp.asarray, padded[n]) for n in bn])
            ks = [rng_np.randint(len(bank[n][1])) for n in bn]
            poses = jnp.stack([
                jnp.asarray(bank[n][0][k])
                - jnp.asarray(padded[n].original_center)
                for n, k in zip(bn, ks)])
            labels = jnp.asarray(fold_tcfg.labels_from_rmsds(
                [bank[n][1][k] for n, k in zip(bn, ks)]))
            cparams, cstats, copt, cm = ctrain(
                cparams, cstats, copt, (stacked, poses, labels),
                jax.random.PRNGKey(epoch * 1000 + start + fold_i))

    hp = (jnp.asarray(held_poses[keep_held])
          - jnp.asarray(padded[held].original_center))
    scores = np.asarray(conf_scores_fn(
        cparams, cstats, jax.tree.map(jnp.asarray, padded[held]), hp))
    hr = held_rmsds[keep_held]
    pick = int(np.argmax(scores))
    row["confidence"] = {
        "cutoff": cutoff,
        "top1_rmsd": float(hr[pick]),
        "top1_below_cutoff": bool(hr[pick] < cutoff),
        "random_below_cutoff": float((hr < cutoff).mean()),
        "n_ranked": int(len(hr)),
    }
    print(f"  [{held}] conf top-1 {hr[pick]:.2f} A vs random-pick "
          f"<{cutoff:.2f}A prob {(hr < cutoff).mean():.2f}", flush=True)

    gate["folds"][held] = row
    os.makedirs("results", exist_ok=True)
    with open(GATE_OUT, "w") as f:
        json.dump(gate, f, indent=2)

rows = list(gate["folds"].values())
if rows:
    gate["median_best_rmsd_heldout"] = float(
        np.median([r["best_rmsd"] for r in rows]))
    gate["median_of_median_rmsd_heldout"] = float(
        np.median([r["median_rmsd"] for r in rows]))
    gate["mean_frac_lt5_heldout"] = float(
        np.mean([r["frac_lt5"] for r in rows]))
    pk = [r["pocket_knowledge"] for r in rows if "pocket_knowledge" in r]
    if pk:
        gate["median_best_rmsd_heldout_pocket"] = float(
            np.median([p["best_rmsd"] for p in pk]))
        gate["mean_frac_lt5_heldout_pocket"] = float(
            np.mean([p["frac_lt5"] for p in pk]))
    conf_rows = [r["confidence"] for r in rows if "confidence" in r]
    gate["confidence_top1_success"] = float(
        np.mean([c["top1_below_cutoff"] for c in conf_rows]))
    gate["confidence_random_success"] = float(
        np.mean([c["random_below_cutoff"] for c in conf_rows]))
    print(f"\nGENERALIZATION GATE: median best-pose RMSD on held-out "
          f"complexes = {gate['median_best_rmsd_heldout']:.2f} A; "
          f"confidence top-1 {gate['confidence_top1_success']:.2f} vs "
          f"random {gate['confidence_random_success']:.2f}", flush=True)

with open(GATE_OUT, "w") as f:
    json.dump(gate, f, indent=2)
print(json.dumps({k: v for k, v in gate.items() if k != "folds"}, indent=2))
