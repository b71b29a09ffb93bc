"""Import a reference PyTorch checkpoint into a diffdock_tpu run dir.

Usage::

    python -m diffdock_tpu.cli.import_weights \
        --torch_checkpoint workdir/v1.1/score_model/best_ema_inference_epoch_model.pt \
        --preset diffdock_l --out_dir workdir/tpu_score_model

Produces ``model_parameters.yml`` + ``model.msgpack`` loadable by
``--model_dir`` everywhere (dock/evaluate/app).
"""

from __future__ import annotations

import argparse
import dataclasses


def get_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="torch -> diffdock_tpu weights")
    p.add_argument("--torch_checkpoint", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--ref_config", default=None,
                   help="reference run's model_parameters.yml; derives the "
                        "full config like the reference factory "
                        "(utils/utils.py:172-281). If absent and the "
                        "checkpoint dir contains model_parameters.yml, it "
                        "is used automatically.")
    p.add_argument("--old", action="store_true", default=False,
                   help="checkpoint uses the v1.0 architecture (the shipped "
                        "default confidence model does, inference.py:84)")
    p.add_argument("--preset", default="diffdock_l")
    p.add_argument("--ns", type=int, default=None)
    p.add_argument("--nv", type=int, default=None)
    p.add_argument("--num_conv_layers", type=int, default=None)
    p.add_argument("--num_prot_emb_layers", type=int, default=None)
    p.add_argument("--confidence_mode", action="store_true", default=False)
    return p


def main(argv=None) -> int:
    import os

    args = get_parser().parse_args(argv)

    from diffdock_tpu.models.config import PRESETS
    from diffdock_tpu.train.checkpoints import save_checkpoint
    from diffdock_tpu.utils.torch_import import (
        config_from_reference_args,
        load_torch_checkpoint,
    )

    ref_config = args.ref_config
    if ref_config is None:
        sibling = os.path.join(
            os.path.dirname(os.path.abspath(args.torch_checkpoint)),
            "model_parameters.yml",
        )
        if os.path.exists(sibling):
            ref_config = sibling
    if ref_config:
        import yaml

        with open(ref_config) as f:
            ref_args = yaml.safe_load(f) or {}
        cfg = config_from_reference_args(
            ref_args, confidence_mode=args.confidence_mode, old=args.old
        )
        print(f"config derived from {ref_config}")
    else:
        cfg = PRESETS[args.preset]
        if args.old:
            cfg = dataclasses.replace(
                cfg, old_architecture=True, num_prot_emb_layers=0,
                reduce_pseudoscalars=False, embed_also_ligand=False,
            )
    overrides = {}
    for k in ("ns", "nv", "num_conv_layers", "num_prot_emb_layers"):
        if getattr(args, k) is not None:
            overrides[k] = getattr(args, k)
    if args.confidence_mode:
        overrides["confidence_mode"] = True
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)

    params, stats, report = load_torch_checkpoint(args.torch_checkpoint, cfg)
    if report["unconsumed"]:
        print(f"WARNING: {len(report['unconsumed'])} unconsumed reference "
              f"keys (first 10): {report['unconsumed'][:10]}")
    save_checkpoint(
        args.out_dir, {"params": params, "batch_stats": stats}, cfg,
        extra={"imported_from": args.torch_checkpoint},
    )
    print(f"imported -> {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
