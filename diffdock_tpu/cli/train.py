"""Score-model training CLI (the reference ``train.py`` equivalent).

Epoch loop over bucket-grouped batches with a jitted (optionally
data-parallel) train step, validation loss, EMA weights, and the reference's
checkpoint flavors (last / best-val / EMA variants, ``train.py:105-146``).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np


def get_parser():
    p = argparse.ArgumentParser(description="diffdock_tpu training")
    p.add_argument("--config", default=None)
    p.add_argument("--log_dir", default="workdir/score_model")
    p.add_argument("--data_dir", default=None,
                   help="PDBBind-layout root (name/name_protein_processed.pdb)")
    p.add_argument("--split_train", default=None)
    p.add_argument("--split_val", default=None)
    p.add_argument("--esm_embeddings_dir", default=None)
    p.add_argument("--cache_path", default="data/cache_tpu")
    p.add_argument("--n_epochs", type=int, default=400)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--w_decay", type=float, default=0.0)
    p.add_argument("--ema_rate", type=float, default=0.999)
    p.add_argument("--tr_weight", type=float, default=0.33)
    p.add_argument("--rot_weight", type=float, default=0.33)
    p.add_argument("--tor_weight", type=float, default=0.33)
    # flexible-sidechain auxiliary losses (reference --backbone_loss_weight/
    # --sidechain_loss_weight; nonzero enables the sidechain head)
    p.add_argument("--backbone_loss_weight", type=float, default=0.0)
    p.add_argument("--sidechain_loss_weight", type=float, default=0.0)
    p.add_argument("--num_workers", type=int, default=1)
    p.add_argument("--limit_complexes", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--data_parallel", action="store_true", default=False)
    p.add_argument("--model_preset", default="diffdock_s")
    p.add_argument("--ns", type=int, default=None)
    p.add_argument("--nv", type=int, default=None)
    p.add_argument("--num_conv_layers", type=int, default=None)
    p.add_argument("--num_prot_emb_layers", type=int, default=None)
    p.add_argument("--restart_dir", default=None,
                   help="resume full train state (params+EMA+optimizer+step)")
    p.add_argument("--pretrain_dir", default=None,
                   help="initialize weights only (reference --pretrain_dir, "
                        "train.py:201-204)")
    p.add_argument("--val_inference_freq", type=int, default=0,
                   help="every N epochs run reverse diffusion on val complexes")
    p.add_argument("--num_inference_complexes", type=int, default=20)
    p.add_argument("--inference_samples", type=int, default=4)
    p.add_argument("--inference_steps", type=int, default=8)
    p.add_argument("--scheduler", default=None,
                   choices=[None, "plateau", "layer_linear_warmup"])
    p.add_argument("--scheduler_patience", type=int, default=20)
    # progressive layer unfreezing (reference utils/utils.py:131-169)
    p.add_argument("--warmup_dur", type=int, default=4)
    p.add_argument("--lr_start_factor", type=float, default=0.001)
    p.add_argument("--inference_secondary_metric", default=None,
                   help="extra valinf metric tracked by its own checkpoint "
                        "flavor (reference train.py:117-122)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic complexes (smoke/benchmark)")
    # multi-dataset training (reference --dataset/--combined_training/
    # --triple_training, datasets/loader.py:30-122)
    p.add_argument("--dataset", default="pdbbind",
                   choices=["pdbbind", "moad", "pdbsidechain"])
    p.add_argument("--combined_training", action="store_true", default=False,
                   help="pdbbind + moad")
    p.add_argument("--triple_training", action="store_true", default=False,
                   help="pdbbind + moad + pdbsidechain")
    p.add_argument("--moad_dir", default=None)
    p.add_argument("--pdbsidechain_dir", default=None)
    p.add_argument("--chain_cutoff", type=float, default=None)
    p.add_argument("--unroll_clusters", action="store_true", default=False)
    p.add_argument("--remove_second_segment", action="store_true",
                   default=False)
    return p


def build_dataset(args):
    from diffdock_tpu.data.datasets import (
        ComplexDataset, DatasetConfig, pdbbind_specs,
    )

    specs = pdbbind_specs(
        args.data_dir, args.split_train,
        esm_embeddings_dir=args.esm_embeddings_dir,
    )
    if args.limit_complexes:
        specs = specs[: args.limit_complexes]
    ds = ComplexDataset(specs, DatasetConfig(cache_dir=args.cache_path))
    ds.preprocess(num_workers=args.num_workers)
    return ds


def main(argv=None):
    args = get_parser().parse_args(argv)
    from diffdock_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    if args.config:
        import yaml

        with open(args.config) as f:
            for k, v in (yaml.safe_load(f) or {}).items():
                if hasattr(args, k):
                    setattr(args, k, v)

    import jax
    import jax.numpy as jnp

    from diffdock_tpu.diffusion.so3 import get_so3_tables
    from diffdock_tpu.diffusion.torus import get_torus_tables
    from diffdock_tpu.models.config import PRESETS
    from diffdock_tpu.models.score_model import CGScoreModel
    from diffdock_tpu.parallel.mesh import make_mesh, shard_train_step
    from diffdock_tpu.train.checkpoints import (
        load_train_state, save_checkpoint, save_train_state,
    )
    from diffdock_tpu.train.trainer import (
        DP_AXIS, TrainConfig, create_train_state, make_eval_step,
        make_train_step, training_model_config,
    )
    from diffdock_tpu.train.validation import PlateauScheduler, inference_epoch

    cfg = PRESETS[args.model_preset]
    overrides = {}
    for k in ("ns", "nv", "num_conv_layers", "num_prot_emb_layers"):
        if getattr(args, k) is not None:
            overrides[k] = getattr(args, k)
    if args.backbone_loss_weight > 0 or args.sidechain_loss_weight > 0:
        # reference enables the head whenever either weight is nonzero
        # (utils/utils.py:274-275)
        overrides["sidechain_pred"] = True
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    cfg = training_model_config(cfg, data_parallel=args.data_parallel)

    tc = TrainConfig(
        lr=args.lr, w_decay=args.w_decay, ema_rate=args.ema_rate,
        tr_weight=args.tr_weight, rot_weight=args.rot_weight,
        tor_weight=args.tor_weight,
        backbone_weight=args.backbone_loss_weight,
        sidechain_weight=args.sidechain_loss_weight,
    )

    so3 = get_so3_tables()
    torus = get_torus_tables()
    model = CGScoreModel(cfg)

    if args.synthetic:
        from diffdock_tpu.data.complexes import (
            bucket_sizes, pad_to, synthetic_complex,
        )

        rng = np.random.RandomState(args.seed)
        lm = cfg.lm_embedding_dim
        raw = [
            synthetic_complex(rng, n_lig=16, n_rec=64, n_bonds=4, lm_dim=lm)
            for _ in range(args.synthetic)
        ]
        nl, nr, nb = 16, 64, 8
        datas = [pad_to(d, nl, nr, nb) for d in raw]

        def batches(epoch):
            order = np.random.RandomState(epoch).permutation(len(datas))
            for i in range(0, len(order), args.batch_size):
                idx = order[i : i + args.batch_size]
                yield [str(j) for j in idx], jax.tree.map(
                    lambda *xs: np.stack(xs), *[datas[j] for j in idx]
                )

        example = datas[0]
    elif (
        args.dataset != "pdbbind" or args.combined_training
        or args.triple_training
    ):
        if args.triple_training:
            args.combined_training = True
        from diffdock_tpu.data.loaders import (
            build_train_source, iter_bucketed_batches,
        )

        source = build_train_source(args)
        print(f"dataset({args.dataset}"
              f"{'+combined' if args.combined_training else ''}): "
              f"{len(source)} complexes/epoch")

        def batches(epoch):
            yield from iter_bucketed_batches(
                source.epoch_items(epoch), args.batch_size
            )

        from diffdock_tpu.data.complexes import bucket_sizes, pad_to

        example = next(source.epoch_items(0))[1]
        example = pad_to(
            example,
            *bucket_sizes(example.n_lig, example.n_rec, example.n_bonds),
        )
    else:
        assert args.data_dir, "need --data_dir or --synthetic"
        ds = build_dataset(args)
        print(f"dataset: {len(ds)} complexes ready")

        def batches(epoch):
            yield from ds.bucketed_batches(args.batch_size, shuffle_seed=epoch)

        example = ds.get(ds.names[0])

        if args.split_val:
            from diffdock_tpu.data.datasets import (
                ComplexDataset, DatasetConfig, pdbbind_specs,
            )

            val_specs = pdbbind_specs(args.data_dir, args.split_val)
            val_ds = ComplexDataset(
                val_specs, DatasetConfig(cache_dir=args.cache_path)
            )
            val_ds.preprocess(num_workers=args.num_workers)
            print(f"val dataset: {len(val_ds)} complexes ready")

    example = jax.tree.map(jnp.asarray, example)
    state = create_train_state(
        model, example, so3, torus, tc, jax.random.PRNGKey(args.seed)
    )
    if args.restart_dir:
        try:
            state = load_train_state(args.restart_dir, state)
            print(f"restarted from {args.restart_dir} "
                  f"at step {int(state.step)}")
        except Exception as e:  # noqa: BLE001 — reference fallback to
            # weights-only when the full state fails (train.py:187-200)
            from diffdock_tpu.train.checkpoints import load_checkpoint

            print(f"full train state unavailable ({e}); "
                  "falling back to weights-only restart")
            variables, _, _ = load_checkpoint(args.restart_dir)
            state = state.replace(
                params=variables["params"],
                ema_params=variables["params"],
                batch_stats=variables.get("batch_stats", state.batch_stats),
            )
    elif args.pretrain_dir:
        from diffdock_tpu.train.checkpoints import load_checkpoint

        variables, _, _ = load_checkpoint(args.pretrain_dir)
        state = state.replace(
            params=variables["params"],
            ema_params=variables["params"],
            batch_stats=variables.get("batch_stats", state.batch_stats),
        )
        print(f"pretrained weights loaded from {args.pretrain_dir}")

    if args.data_parallel:
        mesh = make_mesh()
        step = shard_train_step(
            make_train_step(model, tc, so3, torus, dp_axis=DP_AXIS), mesh
        )
    else:
        step = jax.jit(make_train_step(model, tc, so3, torus))
    eval_step = jax.jit(make_eval_step(model, tc, so3, torus))

    os.makedirs(args.log_dir, exist_ok=True)
    from diffdock_tpu.utils.logging import MetricsWriter

    metrics_log = MetricsWriter(os.path.join(args.log_dir, "metrics.jsonl"))
    best_loss = float("inf")
    best_inf_metric = -1.0
    best_secondary = -1.0
    rng = jax.random.PRNGKey(args.seed + 1)
    history = []
    plateau = PlateauScheduler(patience=args.scheduler_patience) \
        if args.scheduler in ("plateau", "layer_linear_warmup") else None
    layer_warmup = None
    if args.scheduler == "layer_linear_warmup":
        from diffdock_tpu.train.schedulers import (
            LayerWarmupScheduler, layer_warmup_mask,
        )
        from diffdock_tpu.train.trainer import make_optimizer

        layer_warmup = LayerWarmupScheduler(
            num_conv_layers=cfg.num_conv_layers,
            warmup_dur=args.warmup_dur,
            lr_start_factor=args.lr_start_factor,
        )
        warmup_tx = make_optimizer(tc)
        print(f"layer_linear_warmup: frozen stages until epoch "
              f"{layer_warmup.total_warmup_epochs}")
    for epoch in range(args.n_epochs):
        t0 = time.time()
        if layer_warmup is not None:
            stage, scale, changed = layer_warmup.epoch_update(epoch)
            if changed:
                # stage transition recreates the optimizer
                # (reference utils/utils.py:152-153)
                state = state.replace(
                    param_mask=layer_warmup_mask(
                        state.params, stage, cfg.num_conv_layers
                    ),
                    opt_state=warmup_tx.init(state.params),
                )
                print(f"  warmup stage {stage}")
            if epoch == layer_warmup.total_warmup_epochs:
                # warmup -> plateau handoff: the reference recreates the
                # optimizer at FULL lr and re-initializes the EMA so it
                # tracks only post-warmup weights (train.py:51-53)
                state = state.replace(
                    opt_state=warmup_tx.init(state.params),
                    ema_params=state.params,
                )
                print("  warmup complete: lr restored, EMA re-initialized")
            if epoch <= layer_warmup.total_warmup_epochs:
                # epoch_update returns 1.0 at the handoff epoch, so the
                # ramp's last value never sticks past warmup
                state = state.replace(
                    lr_scale=jnp.asarray(scale, jnp.float32)
                )
        losses = []
        for names, batch in batches(epoch):
            try:
                batch = jax.tree.map(jnp.asarray, batch)
                state, metrics = step(state, batch, rng)
                losses.append(float(metrics["loss"]))
            except Exception as e:  # noqa: BLE001 — skip-and-continue like
                # the reference's OOM recovery (utils/training.py:187-205);
                # on TPU this catches compile/transfer failures per bucket
                print(f"  batch {names[:2]}... failed: "
                      f"{type(e).__name__}: {e}")
                continue
        mean_loss = float(np.mean(losses)) if losses else float("nan")
        history.append(mean_loss)
        print(
            f"epoch {epoch}: loss {mean_loss:.4f} "
            f"({len(losses)} steps, {time.time() - t0:.1f}s)"
        )
        metrics_log.log(epoch, "train", loss=mean_loss, steps=len(losses),
                        wall_s=time.time() - t0,
                        lr_scale=float(state.lr_scale))

        # held-out validation loss (reference test_epoch + best-by-val-loss
        # selection, train.py:99-127)
        if "val_ds" in locals() and len(val_ds):
            val_losses = []
            vrng = jax.random.PRNGKey(args.seed + 100 + epoch)
            for _, vbatch in val_ds.bucketed_batches(args.batch_size):
                vbatch = jax.tree.map(jnp.asarray, vbatch)
                vm = eval_step(state, vbatch, vrng)
                val_losses.append(float(vm["loss"]))
            if val_losses:
                mean_loss = float(np.mean(val_losses))
                print(f"  val loss {mean_loss:.4f} "
                      f"({len(val_losses)} batches)")
                metrics_log.log(epoch, "val", loss=mean_loss,
                                batches=len(val_losses))

        in_warmup = (layer_warmup is not None
                     and epoch < layer_warmup.total_warmup_epochs)
        if plateau is not None and not in_warmup:
            # plateau control takes over only after the warmup stages
            # (reference train.py:134-139)
            prev_scale = plateau.scale
            plateau.step(mean_loss)
            if plateau.scale != prev_scale:
                state = state.replace(
                    lr_scale=jnp.asarray(plateau.scale, jnp.float32)
                )
                print(f"  plateau lr scale -> {plateau.scale:.4f}")

        if args.val_inference_freq and (epoch + 1) % args.val_inference_freq == 0:
            import dataclasses as _dc

            from diffdock_tpu.inference.pipeline import DockingPipeline
            from diffdock_tpu.inference.sampler import SamplerConfig as _SC

            infer_cfg = _dc.replace(cfg, bn_axis_names=())
            pipe = DockingPipeline(
                infer_cfg,
                {"params": state.ema_params, "batch_stats": state.batch_stats},
                _SC(inference_steps=args.inference_steps,
                    actual_steps=args.inference_steps),
                so3_tables=so3, torus_tables=torus,
            )
            if args.synthetic:
                n_val = min(args.num_inference_complexes, len(datas))
                val_items = [(str(i), datas[i]) for i in range(n_val)]
            elif "ds" in locals():
                val_items = [
                    (nm, ds.get(nm))
                    for nm in ds.names[: args.num_inference_complexes]
                ]
            else:
                val_items = [
                    it for _, it in zip(
                        range(args.num_inference_complexes),
                        source.epoch_items(10_000 + epoch),
                    )
                ]
            val_datas = {
                n: jax.tree.map(np.asarray, d) for n, d in val_items
            }
            metrics_inf = inference_epoch(
                pipe, val_datas, args.num_inference_complexes,
                args.inference_samples, seed=epoch,
            )
            print(f"  val inference: {metrics_inf}")
            metrics_log.log(epoch, "val_inference", **metrics_inf)
            m = metrics_inf.get("valinf_min_rmsds_lt2", -1.0)
            if m > best_inf_metric:
                best_inf_metric = m
                save_checkpoint(
                    args.log_dir,
                    {"params": state.ema_params, "batch_stats": state.batch_stats},
                    cfg, extra={"epoch": epoch, "valinf_min_rmsds_lt2": m},
                    weights_name="best_ema_inference_epoch_model.msgpack",
                )
                # non-EMA flavor (reference train.py:108-112)
                save_checkpoint(
                    args.log_dir,
                    {"params": state.params, "batch_stats": state.batch_stats},
                    cfg, extra={"epoch": epoch, "valinf_min_rmsds_lt2": m},
                    weights_name="best_inference_epoch_model.msgpack",
                )
            if args.inference_secondary_metric:
                # secondary-metric flavor (reference train.py:117-122)
                m2 = metrics_inf.get(args.inference_secondary_metric, -1.0)
                if m2 > best_secondary:
                    best_secondary = m2
                    save_checkpoint(
                        args.log_dir,
                        {"params": state.ema_params,
                         "batch_stats": state.batch_stats},
                        cfg,
                        extra={"epoch": epoch,
                               args.inference_secondary_metric: m2},
                        weights_name="best_ema_secondary_epoch_model.msgpack",
                    )

        save_train_state(args.log_dir, state, cfg, extra={"epoch": epoch})
        save_checkpoint(
            args.log_dir, {"params": state.params, "batch_stats": state.batch_stats},
            cfg, extra={"epoch": epoch}, weights_name="last_model.msgpack",
        )
        save_checkpoint(
            args.log_dir,
            {"params": state.ema_params, "batch_stats": state.batch_stats},
            cfg, extra={"epoch": epoch}, weights_name="last_ema_model.msgpack",
        )
        if mean_loss < best_loss:
            best_loss = mean_loss
            save_checkpoint(
                args.log_dir,
                {"params": state.ema_params, "batch_stats": state.batch_stats},
                cfg, extra={"epoch": epoch, "loss": mean_loss},
                weights_name="best_ema_model.msgpack",
            )
            # non-EMA best-by-val-loss (reference train.py:124-128)
            save_checkpoint(
                args.log_dir,
                {"params": state.params, "batch_stats": state.batch_stats},
                cfg, extra={"epoch": epoch, "loss": mean_loss},
                weights_name="best_model.msgpack",
            )
    with open(os.path.join(args.log_dir, "history.json"), "w") as f:
        json.dump(history, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
