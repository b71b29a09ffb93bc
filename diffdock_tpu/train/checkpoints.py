"""Checkpoint save/load with a YAML config sidecar.

Mirrors the reference's run-dir contract: a weights file plus a
``model_parameters.yml`` holding the full config, from which downstream
consumers re-hydrate the model (``train.py:213-215``, ``inference.py:146-150``).
Weights are stored with flax msgpack serialization (orbax-compatible pytree
layout; orbax is used for training state with optimizer/EMA, this module
covers the light-weight inference contract).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import yaml

from diffdock_tpu.diffusion.schedules import SigmaConfig
from diffdock_tpu.models.config import ScoreModelConfig

CONFIG_FILE = "model_parameters.yml"
WEIGHTS_FILE = "model.msgpack"
TRAIN_STATE_FILE = "train_state.msgpack"


def _cfg_to_dict(cfg: ScoreModelConfig) -> Dict[str, Any]:
    d = dataclasses.asdict(cfg)
    return d


def _cfg_from_dict(d: Dict[str, Any]) -> ScoreModelConfig:
    d = dict(d)
    sigma = d.pop("sigma", None)
    if isinstance(sigma, dict):
        d["sigma"] = SigmaConfig(**sigma)
    known = {f.name for f in dataclasses.fields(ScoreModelConfig)}
    # YAML round-trips tuples as lists; the config must stay hashable
    # (flax modules are jit-static, and an unhashable cfg breaks every
    # jit of a checkpoint-loaded model)
    return ScoreModelConfig(**{
        k: tuple(v) if isinstance(v, list) else v
        for k, v in d.items() if k in known
    })


def save_checkpoint(
    run_dir: str,
    params,
    cfg: ScoreModelConfig,
    extra: Optional[Dict[str, Any]] = None,
    weights_name: str = WEIGHTS_FILE,
) -> None:
    from flax import serialization

    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, CONFIG_FILE), "w") as f:
        yaml.safe_dump(
            {"model": _cfg_to_dict(cfg), **(extra or {})}, f, sort_keys=True
        )
    with open(os.path.join(run_dir, weights_name), "wb") as f:
        f.write(serialization.to_bytes(params))


_WEIGHT_PREFERENCE = (
    WEIGHTS_FILE,
    "best_ema_model.msgpack",
    "best_model.msgpack",
    "last_ema_model.msgpack",
    "last_model.msgpack",
)


def resolve_weights_name(run_dir: str, name: str) -> str:
    """Map a reference checkpoint filename (``--ckpt`` values like
    ``best_ema_inference_epoch_model.pt``, inference.py:74-76) to the
    equivalent converted ``.msgpack`` flavor when the literal file is
    absent from ``run_dir``. Literal existing files always win."""
    if os.path.exists(os.path.join(run_dir, name)):
        return name
    if name.endswith(".pt"):
        stem = name[:-3]
        if "ema" in stem:
            flavor = "last_ema_model" if "last" in stem else "best_ema_model"
        elif "last" in stem:
            flavor = "last_model"
        else:
            flavor = "best_model"
        mapped = flavor + ".msgpack"
        if os.path.exists(os.path.join(run_dir, mapped)):
            return mapped
    return name  # let load_checkpoint raise with the tried candidates


def load_checkpoint(
    run_dir: str, weights_name: Optional[str] = None
) -> Tuple[Any, ScoreModelConfig, Dict[str, Any]]:
    """Returns (params, config, extra). ``params`` is a raw pytree of dicts;
    pass it straight to ``model.apply``. When ``weights_name`` is omitted the
    best available flavor is picked (EMA preferred, mirroring the reference's
    default of ``best_ema_inference_epoch_model.pt``)."""
    from flax import serialization

    with open(os.path.join(run_dir, CONFIG_FILE)) as f:
        meta = yaml.safe_load(f)
    cfg = _cfg_from_dict(meta.pop("model"))
    candidates = (
        (resolve_weights_name(run_dir, weights_name),)
        if weights_name else _WEIGHT_PREFERENCE
    )
    for name in candidates:
        path = os.path.join(run_dir, name)
        if os.path.exists(path):
            with open(path, "rb") as f:
                params = serialization.msgpack_restore(f.read())
            return params, cfg, meta
    raise FileNotFoundError(f"no weights found in {run_dir} (tried {candidates})")


def save_train_state(run_dir: str, state, cfg: ScoreModelConfig,
                     extra: Optional[Dict[str, Any]] = None) -> None:
    """Persist the FULL training state (params, EMA, optimizer, batch stats,
    step) for restart — the reference's last_model.pt with optimizer
    (``train.py:141-146``)."""
    from flax import serialization

    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, CONFIG_FILE), "w") as f:
        yaml.safe_dump({"model": _cfg_to_dict(cfg), **(extra or {})}, f)
    payload = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "ema_params": state.ema_params,
        "lr_scale": state.lr_scale,
    }
    with open(os.path.join(run_dir, TRAIN_STATE_FILE), "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_train_state(run_dir: str, template_state):
    """Restore a training state saved by :func:`save_train_state` into the
    structure of ``template_state`` (created via create_train_state)."""
    from flax import serialization

    payload = {
        "step": template_state.step,
        "params": template_state.params,
        "batch_stats": template_state.batch_stats,
        "opt_state": template_state.opt_state,
        "ema_params": template_state.ema_params,
        "lr_scale": template_state.lr_scale,
    }
    with open(os.path.join(run_dir, TRAIN_STATE_FILE), "rb") as f:
        restored = serialization.from_bytes(payload, f.read())
    return template_state.replace(**restored)
