"""Score-matching loss (reference ``utils/training.py:15-124``).

Per-component weighted MSE normalized by score norms:
  tr:  (pred - target)^2 * tr_sigma^2
  rot: ((pred - target) / so3.score_norm(rot_sigma))^2
  tor: (pred - target)^2 / torus.score_norm(tor_sigma), averaged over valid
       rotatable bonds across the whole batch (reference flat edge mean).

Score-norm lookups are device tables (the reference does host numpy inside
the loss, ``training.py:30,39`` — a per-step sync we eliminate).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from diffdock_tpu.diffusion.schedules import SigmaConfig, t_to_sigma
from diffdock_tpu.diffusion.so3 import SO3Tables
from diffdock_tpu.diffusion.torus import TorusTables
from diffdock_tpu.models.score_model import ScoreOutput
from diffdock_tpu.train.noise import NoisySample


class LossParts(NamedTuple):
    tr: jnp.ndarray
    rot: jnp.ndarray
    tor_sum: jnp.ndarray  # per-complex sum over valid bonds
    tor_count: jnp.ndarray  # per-complex valid-bond count
    tr_base: jnp.ndarray
    rot_base: jnp.ndarray
    tor_base_sum: jnp.ndarray
    t: jnp.ndarray  # diffusion time, for sigma-interval logging
    # sidechain/backbone auxiliary sums (reference utils/training.py:61-124);
    # zeros when the model has no sidechain head or the data no targets
    bb_sq_sum: jnp.ndarray = jnp.zeros(())  # sum_r mean_d (pred - vec)^2
    bb_base_sum: jnp.ndarray = jnp.zeros(())  # sum_r (vec^2 mean + 1e-4)
    sc_sq_sum: jnp.ndarray = jnp.zeros(())  # sum_r mean_chi circular diff^2
    sc_base_sum: jnp.ndarray = jnp.zeros(())
    rec_count: jnp.ndarray = jnp.zeros(())


def aux_sidechain_parts(sidechain_pred, rec_scv, rec_mask):
    """Per-complex sums for the backbone-vector and sidechain-chi losses
    (reference formulas, ``utils/training.py:61-77`` backbone,
    ``:88-101`` chi: circular |diff| folded at 0.5, NaN chis zeroed)."""
    m = rec_mask.astype(jnp.float32)
    vecs = rec_scv[:, 4:]
    vecs = jnp.where(jnp.isnan(vecs), 0.0, vecs)
    bpred = sidechain_pred[:, 4:]
    bb_sq = jnp.mean((bpred - vecs) ** 2, axis=-1)
    bb_base = jnp.mean(vecs**2, axis=-1) + 1e-4

    chi = rec_scv[:, :4]
    valid = ~jnp.isnan(chi)
    chi0 = jnp.where(valid, chi, 0.0)
    cpred = jnp.where(valid, sidechain_pred[:, :4], 0.0)
    diff = jnp.abs(cpred - chi0)
    diff = jnp.minimum(diff, 1.0 - diff)  # angles are circular, 360 deg = 1
    sc_sq = jnp.mean(diff**2, axis=-1)
    sc_base = jnp.mean(chi0**2, axis=-1) + 1e-4
    return dict(
        bb_sq_sum=jnp.sum(bb_sq * m),
        bb_base_sum=jnp.sum(bb_base * m),
        sc_sq_sum=jnp.sum(sc_sq * m),
        sc_base_sum=jnp.sum(sc_base * m),
        rec_count=jnp.sum(m),
    )


def per_complex_losses(
    pred: ScoreOutput,
    sample: NoisySample,
    rot_mask: jnp.ndarray,
    sigma_cfg: SigmaConfig,
    so3_tables: SO3Tables,
    torus_tables: TorusTables,
    rec_scv=None,
    rec_mask=None,
) -> LossParts:
    t = sample.t
    tr_sigma, rot_sigma, tor_sigma = t_to_sigma(t, t, t, sigma_cfg)

    tr = jnp.mean((pred.tr - sample.tr_score) ** 2) * tr_sigma**2
    tr_base = jnp.mean(sample.tr_score**2) * tr_sigma**2

    rot_norm = so3_tables.score_norm(rot_sigma)
    rot = jnp.mean(((pred.rot - sample.rot_score) / rot_norm) ** 2)
    rot_base = jnp.mean((sample.rot_score / rot_norm) ** 2)

    tor_norm = torus_tables.score_norm(
        jnp.broadcast_to(tor_sigma, pred.tor.shape)
    )
    tor_sq = (pred.tor - sample.tor_score) ** 2 / tor_norm
    tor_base_sq = sample.tor_score**2 / tor_norm
    m = rot_mask.astype(tor_sq.dtype)
    aux = {}
    if getattr(pred, "sidechain", None) is not None and rec_scv is not None:
        aux = aux_sidechain_parts(pred.sidechain, rec_scv, rec_mask)
    return LossParts(
        tr=tr,
        rot=rot,
        tor_sum=jnp.sum(tor_sq * m),
        tor_count=jnp.sum(m),
        tr_base=tr_base,
        rot_base=rot_base,
        tor_base_sum=jnp.sum(tor_base_sq * m),
        t=t,
        **aux,
    )


def total_loss(
    parts: LossParts,
    tr_weight: float = 0.33,
    rot_weight: float = 0.33,
    tor_weight: float = 0.33,
    backbone_weight: float = 0.0,
    sidechain_weight: float = 0.0,
):
    """Aggregate batched per-complex parts into the scalar training loss.

    ``parts`` leaves have a leading batch dim; torsion uses the reference's
    flat mean over all rotatable bonds in the batch; the auxiliary losses
    normalize by the batch-mean base like the reference
    (``training.py:69,102``: loss.mean() / base.mean() == sum(sq)/sum(base))."""
    tr = jnp.mean(parts.tr)
    rot = jnp.mean(parts.rot)
    tor = jnp.sum(parts.tor_sum) / jnp.maximum(jnp.sum(parts.tor_count), 1e-4)
    loss = tr_weight * tr + rot_weight * rot + tor_weight * tor
    metrics = {
        "loss": loss,
        "tr_loss": tr,
        "rot_loss": rot,
        "tor_loss": tor,
        "tr_base_loss": jnp.mean(parts.tr_base),
        "rot_base_loss": jnp.mean(parts.rot_base),
        "tor_base_loss": jnp.sum(parts.tor_base_sum)
        / jnp.maximum(jnp.sum(parts.tor_count), 1e-4),
    }
    if backbone_weight > 0.0 or sidechain_weight > 0.0:
        bb = jnp.sum(parts.bb_sq_sum) / jnp.maximum(
            jnp.sum(parts.bb_base_sum), 1e-8
        )
        sc = jnp.sum(parts.sc_sq_sum) / jnp.maximum(
            jnp.sum(parts.sc_base_sum), 1e-8
        )
        loss = loss + backbone_weight * bb + sidechain_weight * sc
        metrics["loss"] = loss
        metrics["backbone_loss"] = bb
        metrics["sidechain_loss"] = sc
    return loss, metrics


def sigma_interval_metrics(parts: LossParts, n_buckets: int = 10):
    """Per-sigma-interval component losses (reference 10-bucket AverageMeter
    logging, ``utils/training.py:216-238``): each metric is an (n_buckets,)
    array over t in [i/n, (i+1)/n); empty buckets report NaN."""
    bucket = jnp.clip(
        jnp.floor(parts.t * n_buckets).astype(jnp.int32), 0, n_buckets - 1
    )
    onehot = jax.nn.one_hot(bucket, n_buckets, dtype=parts.tr.dtype)  # (B, n)
    counts = onehot.sum(0)
    safe = jnp.maximum(counts, 1.0)
    out = {
        "tr_loss_by_sigma": (onehot * parts.tr[:, None]).sum(0) / safe,
        "rot_loss_by_sigma": (onehot * parts.rot[:, None]).sum(0) / safe,
        "tor_loss_by_sigma": (onehot * parts.tor_sum[:, None]).sum(0)
        / jnp.maximum((onehot * parts.tor_count[:, None]).sum(0), 1e-4),
        "sigma_bucket_counts": counts,
    }
    nan = jnp.nan * counts
    return {
        k: jnp.where(counts > 0, v, nan) if k != "sigma_bucket_counts" else v
        for k, v in out.items()
    }
