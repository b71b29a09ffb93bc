"""End-to-end learning sanity: overfit the score model on 6w70, dock it back.

Run on the real TPU:

    PYTHONPATH=.:/root/.axon_site python scripts/validate_learning.py

Expected: ~2 min total, final loss ~0.48, best pose < 1.5 A, median < 2.5 A
(validated 2026-08-16: best 0.80 A, median 1.59 A, 13/16 poses <= 2.1 A).
Uses RAW params (not EMA — 600 steps is far inside the 0.999-EMA horizon)
and a real pocket-cropped complex; synthetic random geometry does not dock.
"""
import time, numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
from diffdock_tpu.data.chem import read_molecule_file, read_pdb_file
from diffdock_tpu.data.featurize import build_complex_data
from diffdock_tpu.data.complexes import ComplexData, bucket_sizes, pad_to
from diffdock_tpu.diffusion.so3 import get_so3_tables, SO3Config
from diffdock_tpu.diffusion.torus import get_torus_tables, TorusConfig
from diffdock_tpu.models.config import ScoreModelConfig
from diffdock_tpu.models.factory import build_model
from diffdock_tpu.train.trainer import TrainConfig, create_train_state, make_train_step, training_model_config
from diffdock_tpu.inference.pipeline import DockingPipeline
from diffdock_tpu.inference.sampler import SamplerConfig
from diffdock_tpu.eval.rmsd import symmetry_rmsd, molecular_automorphisms

mol = read_molecule_file('/root/reference/examples/6w70_ligand.sdf')
prot = read_pdb_file('/root/reference/examples/6w70.pdb')
data, heavy = build_complex_data(mol, prot)
# crop receptor to 128 residues nearest the ligand (pocket) to keep it small
lig_c = np.asarray(data.lig_pos).mean(0)
d = np.linalg.norm(np.asarray(data.rec_pos) - lig_c, axis=1)
keep = np.argsort(d)[:128]
keep.sort()
remap = -np.ones(data.rec_pos.shape[0], np.int64); remap[keep] = np.arange(len(keep))
from diffdock_tpu.data.complexes import build_knn_neighbors
rec_pos = np.asarray(data.rec_pos)[keep]
rec_nbr, rec_nbr_mask = build_knn_neighbors(rec_pos, 10)
data = data._replace(
    rec_cat=np.asarray(data.rec_cat)[keep], rec_lm=np.asarray(data.rec_lm)[keep],
    rec_mask=np.asarray(data.rec_mask)[keep], rec_pos=rec_pos,
    rec_nbr=rec_nbr, rec_nbr_mask=rec_nbr_mask)
nl, nr, nb = bucket_sizes(data.n_lig, data.n_rec, data.n_bonds)
n_real = data.n_lig
padded = pad_to(data, nl, nr, nb)
print(f"complex: lig {data.n_lig} rec {data.n_rec} bonds {data.n_bonds} -> bucket {nl},{nr},{nb}", flush=True)

so3 = get_so3_tables(); torus = get_torus_tables()
cfg = training_model_config(
    ScoreModelConfig(ns=24, nv=6, num_conv_layers=3, num_prot_emb_layers=1,
                     dynamic_max_cross=True, cross_max_distance=250.0),
    data_parallel=False)
model = build_model(cfg)
tc = TrainConfig(lr=1e-3)
ex = jax.tree.map(jnp.asarray, padded)
state = create_train_state(model, ex, so3, torus, tc, jax.random.PRNGKey(0))
step = jax.jit(make_train_step(model, tc, so3, torus))
batch = jax.tree.map(lambda x: jnp.asarray(x)[None].repeat(8, 0), padded)

t0=time.time(); state, m = step(state, batch, jax.random.PRNGKey(1))
print(f"train step compile: {time.time()-t0:.0f}s loss {float(m['loss']):.3f}", flush=True)
t0=time.time()
N_STEPS = 600
for i in range(N_STEPS):
    state, m = step(state, batch, jax.random.PRNGKey(1))
    if i % 100 == 0:
        print(f"step {i}: loss {float(m['loss']):.4f} tr {float(m['tr_loss']):.3f} rot {float(m['rot_loss']):.3f} tor {float(m['tor_loss']):.3f}", flush=True)
print(f"{N_STEPS} steps in {time.time()-t0:.0f}s, final loss {float(m['loss']):.4f}", flush=True)

# dock with trained weights (EMA too noisy for short run; use raw params)
import dataclasses
infer_cfg = dataclasses.replace(cfg, bn_axis_names=())
pipe = DockingPipeline(infer_cfg, {"params": state.params, "batch_stats": state.batch_stats},
                       SamplerConfig(), so3_tables=so3, torus_tables=torus)
res = pipe.dock_complex(data, num_poses=16, seed=3)
ref = np.asarray(data.lig_pos) + np.asarray(data.original_center)
bonds = [(i,j) for i,j,_ in heavy.bonds]
perms = molecular_automorphisms(heavy.elements, bonds)
rmsds = symmetry_rmsd(ref, res.poses, heavy.elements, bonds, perms=perms)
print("pose rmsds:", np.round(np.sort(rmsds), 2), flush=True)
print(f"best {rmsds.min():.2f} A, median {np.median(rmsds):.2f} A")
