"""Noise schedules for the tr/rot/tor diffusion components.

Replicates the reference formulas:
  * geometric sigma interpolation ``sigma_min**(1-t) * sigma_max**t``
    (``utils/diffusion_utils.py:21-32``),
  * sigmoid schedule variant (``utils/diffusion_utils.py:12-18``),
  * inference time grid via Beta-distribution ppf
    (``utils/diffusion_utils.py:138-143``) — host-side, static per run.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SigmaConfig:
    """Sigma ranges for the three manifold components.

    Defaults mirror the reference training args (``utils/parsing.py:361-366``).
    """

    tr_sigma_min: float = 0.1
    tr_sigma_max: float = 30.0
    rot_sigma_min: float = 0.1
    rot_sigma_max: float = 1.65
    tor_sigma_min: float = 0.0314
    tor_sigma_max: float = 3.14
    schedule_type: str = "exponential"
    schedule_k: float = 10.0
    schedule_m: float = 0.4


def _sigmoid(t):
    return 1.0 / (1.0 + jnp.exp(-t))


def sigmoid_schedule(t, k: float = 10.0, m: float = 0.5):
    s = lambda x: _sigmoid(k * (x - m))
    return (s(t) - s(0.0)) / (s(1.0) - s(0.0))


def t_to_sigma_individual(
    t, schedule_type: str, sigma_min: float, sigma_max: float,
    schedule_k: float = 10.0, schedule_m: float = 0.4,
):
    if schedule_type == "exponential":
        return sigma_min ** (1.0 - t) * sigma_max ** t
    if schedule_type == "sigmoid":
        return sigmoid_schedule(t, k=schedule_k, m=schedule_m) * (
            sigma_max - sigma_min
        ) + sigma_min
    raise ValueError(f"unknown schedule_type {schedule_type!r}")


def t_to_sigma(t_tr, t_rot, t_tor, cfg: SigmaConfig) -> Tuple:
    """Map diffusion times in [0, 1] to (tr, rot, tor) sigmas."""
    tr = cfg.tr_sigma_min ** (1.0 - t_tr) * cfg.tr_sigma_max ** t_tr
    rot = cfg.rot_sigma_min ** (1.0 - t_rot) * cfg.rot_sigma_max ** t_rot
    tor = cfg.tor_sigma_min ** (1.0 - t_tor) * cfg.tor_sigma_max ** t_tor
    return tr, rot, tor


def get_t_schedule(
    sigma_schedule: str,
    inference_steps: int,
    inf_sched_alpha: float = 1.0,
    inf_sched_beta: float = 1.0,
    t_max: float = 1.0,
) -> np.ndarray:
    """Inference time grid (host-side; the grid is static per run)."""
    if sigma_schedule == "expbeta":
        from scipy.stats import beta as beta_dist

        lin_max = beta_dist.cdf(t_max, a=inf_sched_alpha, b=inf_sched_beta)
        c = np.linspace(lin_max, 0, inference_steps + 1)[:-1]
        return beta_dist.ppf(c, a=inf_sched_alpha, b=inf_sched_beta)
    raise ValueError(f"unknown sigma_schedule {sigma_schedule!r}")
