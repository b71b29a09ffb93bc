"""Training step: noising + forward + score-matching loss + Adam + EMA.

The reference trains with single-node PyG DataParallel (``utils/utils.py:278``)
and host-side noising in dataloader workers. Here one jitted train step does
everything on device: per-complex noising (jax.random), pose forward under a
``vmap`` with a named batch axis (so batch-norm statistics aggregate across
complexes exactly like the reference's flattened batch), loss, gradients —
and under a device mesh the same step runs data-parallel with a ``pmean``
over the 'dp' axis (see ``diffdock_tpu.parallel.mesh``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from diffdock_tpu.data.complexes import ComplexData
from diffdock_tpu.diffusion.so3 import SO3Tables
from diffdock_tpu.diffusion.torus import TorusTables
from diffdock_tpu.models.config import ScoreModelConfig
from diffdock_tpu.models.score_model import CGScoreModel
from diffdock_tpu.train.losses import per_complex_losses, total_loss
from diffdock_tpu.train.noise import apply_noise

BATCH_AXIS = "batch"
DP_AXIS = "dp"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-3
    w_decay: float = 0.0
    ema_rate: float = 0.999
    tr_weight: float = 0.33
    rot_weight: float = 0.33
    tor_weight: float = 0.33
    # auxiliary flexible-sidechain losses (reference train.py
    # backbone_loss_weight / sidechain_loss_weight; requires
    # model.cfg.sidechain_pred and rec_scv targets in the data)
    backbone_weight: float = 0.0
    sidechain_weight: float = 0.0
    sampling_alpha: float = 1.0
    sampling_beta: float = 1.0
    grad_clip: Optional[float] = None
    warmup_steps: int = 0
    # per-sigma-interval loss breakdown (reference 10-bucket logging,
    # utils/training.py:216-238); adds (10,) arrays to the step metrics
    log_sigma_intervals: bool = False


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    # host-controlled LR multiplier (reduce-on-plateau, reference
    # utils/utils.py:131-169). A traced scalar: updating it between epochs
    # does NOT retrigger compilation. Adam updates are linear in lr, so
    # scaling the update is exactly scaling the learning rate.
    lr_scale: jnp.ndarray = flax.struct.field(
        default_factory=lambda: jnp.ones((), jnp.float32)
    )
    # optional 0/1 scalar-per-leaf pytree gating Adam updates — the
    # layer_linear_warmup progressive unfreezing (see train/schedulers.py;
    # reference utils/utils.py:131-169). None = everything trains.
    param_mask: Any = None


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    sched: Any = cfg.lr
    if cfg.warmup_steps > 0:
        sched = optax.linear_schedule(
            cfg.lr * 1e-3, cfg.lr, cfg.warmup_steps
        )
    chain = []
    if cfg.grad_clip:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    if cfg.w_decay > 0:
        chain.append(optax.adamw(sched, weight_decay=cfg.w_decay))
    else:
        chain.append(optax.adam(sched))
    return optax.chain(*chain)


def training_model_config(cfg: ScoreModelConfig, data_parallel: bool) -> ScoreModelConfig:
    axes = (BATCH_AXIS, DP_AXIS) if data_parallel else (BATCH_AXIS,)
    return dataclasses.replace(cfg, bn_axis_names=axes)


def create_train_state(
    model: CGScoreModel,
    example: ComplexData,
    so3: SO3Tables,
    torus: TorusTables,
    train_cfg: TrainConfig,
    rng: jax.Array,
) -> TrainState:
    variables = jax.jit(model.init)(
        rng, example, example.lig_pos, jnp.asarray(0.5), so3, torus
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = make_optimizer(train_cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=params,
    )


def make_eval_step(
    model: CGScoreModel,
    train_cfg: TrainConfig,
    so3: SO3Tables,
    torus: TorusTables,
) -> Callable:
    """Validation loss over a stacked batch: same noising + loss as training
    but eval-mode (running BN stats, no dropout, no gradients) — the
    reference's ``test_epoch`` (``utils/training.py:157-214``)."""
    sigma_cfg = model.cfg.sigma

    def eval_step(state: TrainState, batch: ComplexData, rng: jax.Array):
        batch_size = batch.lig_cat.shape[0]
        noise_keys = jax.random.split(rng, batch_size)

        def one(data, nkey):
            sample = apply_noise(
                nkey, data, sigma_cfg, so3, torus,
                alpha=train_cfg.sampling_alpha,
                beta=train_cfg.sampling_beta,
                no_torsion=model.cfg.no_torsion,
            )
            out = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                data, sample.pos, sample.t, so3, torus, train=False,
            )
            return per_complex_losses(
                out, sample, data.rot_mask, sigma_cfg, so3, torus
            )

        parts = jax.vmap(one)(batch, noise_keys)
        _, metrics = total_loss(
            parts, train_cfg.tr_weight, train_cfg.rot_weight,
            train_cfg.tor_weight,
        )
        return metrics

    return eval_step


def make_train_step(
    model: CGScoreModel,
    train_cfg: TrainConfig,
    so3: SO3Tables,
    torus: TorusTables,
    dp_axis: Optional[str] = None,
) -> Callable:
    """Build the per-device train step over a stacked batch of complexes.

    ``batch`` is a ComplexData pytree with a leading batch axis (same bucket
    sizes). The model's cfg must carry the matching ``bn_axis_names``.
    """
    sigma_cfg = model.cfg.sigma
    tx = make_optimizer(train_cfg)

    def train_step(state: TrainState, batch: ComplexData, rng: jax.Array):
        batch_size = batch.lig_cat.shape[0]
        rng = jax.random.fold_in(rng, state.step)
        if dp_axis is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(dp_axis))
        noise_keys = jax.random.split(jax.random.fold_in(rng, 0), batch_size)
        drop_keys = jax.random.split(jax.random.fold_in(rng, 1), batch_size)

        def loss_fn(params):
            def one(data, nkey, dkey):
                sample = apply_noise(
                    nkey, data, sigma_cfg, so3, torus,
                    alpha=train_cfg.sampling_alpha,
                    beta=train_cfg.sampling_beta,
                    no_torsion=model.cfg.no_torsion,
                )
                kw = {}
                if model.cfg.crop_beyond is not None:
                    # reference trains with per-sample sigma-dependent crops
                    # (datasets/pdbbind.py:112-114); realized here as an
                    # in-jit receptor mask at 3*tr_sigma + crop_beyond
                    from diffdock_tpu.data.complexes import rec_keep_mask
                    from diffdock_tpu.diffusion.schedules import t_to_sigma

                    tr_sigma, _, _ = t_to_sigma(
                        sample.t, sample.t, sample.t, sigma_cfg
                    )
                    kw["rec_keep"] = rec_keep_mask(
                        data.rec_pos, data.rec_mask, sample.pos[None],
                        data.lig_mask,
                        3.0 * tr_sigma + model.cfg.crop_beyond,
                    )
                out, mutated = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    data, sample.pos, sample.t, so3, torus,
                    train=True, mutable=["batch_stats"],
                    rngs={"dropout": dkey}, **kw,
                )
                parts = per_complex_losses(
                    out, sample, data.rot_mask, sigma_cfg, so3, torus,
                    rec_scv=data.rec_scv, rec_mask=data.rec_mask,
                )
                return parts, mutated["batch_stats"]

            parts, new_stats = jax.vmap(one, axis_name=BATCH_AXIS)(
                batch, noise_keys, drop_keys
            )
            loss, metrics = total_loss(
                parts, train_cfg.tr_weight, train_cfg.rot_weight,
                train_cfg.tor_weight,
                backbone_weight=train_cfg.backbone_weight,
                sidechain_weight=train_cfg.sidechain_weight,
            )
            if train_cfg.log_sigma_intervals:
                from diffdock_tpu.train.losses import sigma_interval_metrics

                metrics.update(sigma_interval_metrics(parts))
            # stats were aggregated across the named axes inside BN, so all
            # vmapped copies are identical — keep one.
            new_stats = jax.tree.map(lambda x: x[0], new_stats)
            return loss, (metrics, new_stats)

        grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        if dp_axis is not None:
            grads = jax.lax.pmean(grads, dp_axis)
            metrics = jax.lax.pmean(metrics, dp_axis)

        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params
        )
        updates = jax.tree.map(lambda u: u * state.lr_scale, updates)
        if state.param_mask is not None:
            updates = jax.tree.map(
                lambda u, m: u * m, updates, state.param_mask
            )
        new_params = optax.apply_updates(state.params, updates)
        rate = train_cfg.ema_rate
        new_ema = jax.tree.map(
            lambda e, p: rate * e + (1.0 - rate) * p,
            state.ema_params, new_params,
        )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        return new_state, metrics

    return train_step
