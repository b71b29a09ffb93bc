"""Confidence-model training: pose generation sweep + BCE classification.

Reference flow (``confidence/dataset.py:212-273`` +
``confidence/confidence_train.py:111-320``): run the trained score model
over the training split to generate ``samples_per_complex`` poses each,
label them with RMSD vs the crystal pose, then train the confidence
network to classify RMSD < cutoff. The pose-generation sweep is the
workload that most benefits from pose-parallel TPU fan-out.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffdock_tpu.data.complexes import ComplexData
from diffdock_tpu.eval.rmsd import molecular_automorphisms, symmetry_rmsd


@dataclasses.dataclass(frozen=True)
class ConfidenceTrainConfig:
    # one cutoff -> BCE; several -> multi-class CE over RMSD bins
    # (reference confidence_train.py:119-135 list-valued cutoff)
    rmsd_classification_cutoff: Tuple[float, ...] = (2.0,)
    # regress RMSD directly instead of classifying (reference
    # --rmsd_prediction, confidence_train.py:137-142)
    rmsd_prediction: bool = False
    samples_per_complex: int = 8
    lr: float = 3e-4
    w_decay: float = 0.0

    @property
    def num_outputs(self) -> int:
        if self.rmsd_prediction:
            return 1
        n = len(self.rmsd_classification_cutoff)
        return 1 if n == 1 else n + 1

    def labels_from_rmsds(self, rmsds) -> "np.ndarray":
        """BCE: float(rmsd < cutoff); multi-cutoff: bin index
        sum(rmsd > cutoffs); regression: the rmsd itself."""
        rmsds = np.asarray(rmsds, np.float32)
        if self.rmsd_prediction:
            return rmsds
        cuts = np.asarray(self.rmsd_classification_cutoff, np.float32)
        if cuts.size == 1:
            return (rmsds < cuts[0]).astype(np.float32)
        return (rmsds[..., None] > cuts).sum(axis=-1).astype(np.float32)


def generate_poses_for_complex(
    pipeline, data: ComplexData, samples: int, seed: int,
    elements=None, bonds=None, aa_data=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sample poses with the score model and label with (symmetry-corrected
    when topology given) RMSD vs the reference pose."""
    result = pipeline.dock_complex(
        data, num_poses=samples, seed=seed, aa_data=aa_data
    )
    # label RMSD over REAL atoms only (the input may be padded; padding rows
    # ride along with the rigid moves and would contaminate labels)
    n = int(np.asarray(data.lig_mask).sum())
    ref = (np.asarray(data.lig_pos) + np.asarray(data.original_center))[:n]
    poses_real = result.poses[:, :n]
    if elements is not None and bonds is not None:
        perms = molecular_automorphisms(elements, bonds)
        rmsds = symmetry_rmsd(ref, poses_real, elements, bonds, perms=perms)
    else:
        rmsds = np.sqrt(
            np.mean(np.sum((poses_real - ref) ** 2, axis=-1), axis=-1)
        )
    # return poses at the input's (possibly padded) width for training
    poses = np.zeros(
        (poses_real.shape[0],) + np.asarray(data.lig_pos).shape, np.float32
    )
    poses[:, :n] = poses_real
    return poses, np.asarray(rmsds)


def pose_cache_file(pose_cache_dir, name: str, cache_id=None) -> Path:
    """Path of one complex's generated-pose cache file; ``cache_id``
    suffixes the file so independent generation runs don't collide."""
    suffix = f".id{cache_id}" if cache_id is not None else ""
    return Path(pose_cache_dir) / f"{name}{suffix}.npz"


def load_pose_cache(
    pose_cache_dir, name: str, cache_ids: Optional[List[int]] = None
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Load (poses, rmsds) for one complex, optionally accumulating across
    generation runs.

    ``cache_ids=None`` reads the plain ``{name}.npz``. A list of ids
    concatenates ``{name}.id{i}.npz`` over every id where the complex was
    generated (the reference's ``cache_creation_id`` /
    ``cache_ids_to_combine`` accumulation, ``confidence/dataset.py:82-155``)
    — pose generation is the longest preprocessing job, so partial sweeps
    from several runs merge into one training cache. Returns None when no
    file exists.
    """
    if cache_ids is None:
        f = pose_cache_file(pose_cache_dir, name)
        if not f.exists():
            return None
        z = np.load(f)
        return z["poses"], z["rmsds"]
    poses, rmsds = [], []
    for cid in cache_ids:
        f = pose_cache_file(pose_cache_dir, name, cid)
        if f.exists():
            z = np.load(f)
            poses.append(z["poses"])
            rmsds.append(z["rmsds"])
    if not poses:
        return None
    return np.concatenate(poses), np.concatenate(rmsds)


def make_confidence_train_step(
    model, cfg: ConfidenceTrainConfig, so3, torus, dp_axis=None
):
    """Confidence training step over a batch of (complex, pose, label):
    BCE for a single cutoff, softmax CE over RMSD bins for several, MSE for
    rmsd_prediction (reference ``confidence_train.py:111-142``).

    ``batch``: (datas stacked, poses (B, NL, 3), labels (B,)).

    ``dp_axis``: name of a mesh axis this step runs under (via
    ``parallel.mesh.shard_confidence_train_step``) — gradients and metrics
    are ``pmean``-ed over it and each shard folds its mesh index into the
    dropout rng. The model's ``bn_axis_names`` must include the axis so
    batch-norm statistics aggregate globally (device-count-invariant
    training, same contract as the score trainer).
    """
    import optax

    tx = optax.adam(cfg.lr)
    n_out = cfg.num_outputs

    def train_step(params, batch_stats, opt_state, batch, rng):
        datas, poses, labels = batch
        if dp_axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(dp_axis))

        def loss_fn(p):
            def one(data, pos, dkey):
                out, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    data, pos, jnp.asarray(0.0), so3, torus,
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": dkey},
                )
                return out[..., :n_out], mut["batch_stats"]

            keys = jax.random.split(rng, labels.shape[0])
            logits, new_stats = jax.vmap(one, axis_name="batch")(
                datas, poses, keys
            )
            if cfg.rmsd_prediction:
                pred = logits[..., 0]
                loss = jnp.mean((pred - labels) ** 2)
                acc = jnp.mean(jnp.abs(pred - labels))  # MAE as 'accuracy'
            elif n_out == 1:
                loss = jnp.mean(
                    optax.sigmoid_binary_cross_entropy(
                        logits[..., 0], labels
                    )
                )
                acc = jnp.mean((logits[..., 0] > 0) == (labels > 0.5))
            else:
                idx = labels.astype(jnp.int32)
                loss = jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(
                        logits, idx
                    )
                )
                acc = jnp.mean(jnp.argmax(logits, -1) == idx)
            new_stats = jax.tree.map(lambda x: x[0], new_stats)
            return loss, (acc, new_stats)

        (loss, (acc, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        if dp_axis is not None:
            grads = jax.lax.pmean(grads, dp_axis)
            loss = jax.lax.pmean(loss, dp_axis)
            acc = jax.lax.pmean(acc, dp_axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, {"loss": loss, "accuracy": acc}

    return train_step, tx
