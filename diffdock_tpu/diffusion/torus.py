"""Wrapped Gaussian on the torus SO(2)^m: device-resident score tables.

Density p(x; sigma) = sum_i N(x + 2 pi i; 0, sigma^2) on log-spaced (sigma, x)
grids, with the score table score_ = p'/p (reference ``utils/torus.py:11-40``).
Lookups replicate the reference's nearest-index rounding so the two
implementations agree bit-for-bit on grid values; everything lives on device.

The reference truncates the sum at |i| <= 100; terms beyond |i| ~ 15 are
below float64 epsilon for sigma <= 2*pi, so we use |i| <= 32 (verified
against a wider sum in tests).
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
import os
from pathlib import Path
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffdock_tpu.diffusion.so3 import default_cache_dir


@dataclasses.dataclass(frozen=True)
class TorusConfig:
    """Grid parameters; defaults match reference ``utils/torus.py:24-26``."""

    x_min: float = 1e-5  # relative to pi
    x_n: int = 5000
    sigma_min: float = 3e-3  # relative to pi
    sigma_max: float = 2.0  # relative to pi
    sigma_n: int = 5000
    wrap_terms: int = 32
    mc_samples: int = 10000
    mc_seed: int = 0


def _generate_tables(cfg: TorusConfig) -> Tuple[np.ndarray, ...]:
    x = 10 ** np.linspace(np.log10(cfg.x_min), 0, cfg.x_n + 1) * np.pi
    sigma = (
        10 ** np.linspace(np.log10(cfg.sigma_min), np.log10(cfg.sigma_max),
                          cfg.sigma_n + 1) * np.pi
    )

    p = np.zeros((sigma.shape[0], x.shape[0]))
    grad = np.zeros_like(p)
    s2 = sigma[:, None] ** 2
    for i in range(-cfg.wrap_terms, cfg.wrap_terms + 1):
        xi = x[None, :] + 2 * np.pi * i
        e = np.exp(-(xi**2) / 2 / s2)
        p += e
        grad += xi / s2 * e
    eps = np.finfo(p.dtype).eps
    score = grad / (p + eps)

    # Monte-Carlo E[score^2] per sigma (reference ``utils/torus.py:72-76``,
    # which uses an unseeded global RNG; we fix the seed for reproducibility).
    rng = np.random.RandomState(cfg.mc_seed)
    samples = sigma[None, :] * rng.randn(cfg.mc_samples, sigma.shape[0])
    samples = (samples + np.pi) % (2 * np.pi) - np.pi
    sgn = np.sign(samples)
    xi_idx = np.log(np.abs(samples) / np.pi)
    xi_idx = (xi_idx - np.log(cfg.x_min)) / (0 - np.log(cfg.x_min)) * cfg.x_n
    xi_idx = np.round(np.clip(xi_idx, 0, cfg.x_n)).astype(int)
    si_idx = np.broadcast_to(np.arange(sigma.shape[0]), samples.shape)
    sc = -sgn * score[si_idx, xi_idx]
    score_norm = (sc**2).mean(0)

    return x, sigma, p, score, score_norm


@dataclasses.dataclass(frozen=True)
class TorusTables:
    cfg: TorusConfig
    p_table: jnp.ndarray  # (SIGMA_N+1, X_N+1)
    score_table: jnp.ndarray  # (SIGMA_N+1, X_N+1)
    score_norm_table: jnp.ndarray  # (SIGMA_N+1,)

    def _x_idx(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        x = (x + jnp.pi) % (2 * jnp.pi) - jnp.pi
        sign = jnp.sign(x)
        xi = jnp.log(jnp.abs(x) / jnp.pi)
        xi = (xi - np.log(c.x_min)) / (0 - np.log(c.x_min)) * c.x_n
        xi = jnp.round(jnp.clip(xi, 0, c.x_n)).astype(jnp.int32)
        return sign, xi

    def _sigma_idx(self, sigma: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        si = jnp.log(sigma / jnp.pi)
        si = (si - np.log(c.sigma_min)) / (
            np.log(c.sigma_max) - np.log(c.sigma_min)
        ) * c.sigma_n
        return jnp.round(jnp.clip(si, 0, c.sigma_n)).astype(jnp.int32)

    def score(self, x: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
        """d/dx log p(x; sigma) (reference ``utils/torus.py:43-54``)."""
        sign, xi = self._x_idx(x)
        si = self._sigma_idx(sigma)
        return -sign * self.score_table[si, xi]

    def p(self, x: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
        _, xi = self._x_idx(x)
        si = self._sigma_idx(sigma)
        return self.p_table[si, xi]

    def score_norm(self, sigma: jnp.ndarray) -> jnp.ndarray:
        """MC estimate of E[score^2] (reference ``utils/torus.py:79-83``)."""
        return self.score_norm_table[self._sigma_idx(sigma)]

    @staticmethod
    def sample(key: jax.Array, sigma: jnp.ndarray) -> jnp.ndarray:
        """Wrapped Gaussian sample (reference ``utils/torus.py:66-69``)."""
        out = sigma * jax.random.normal(key, sigma.shape)
        return (out + jnp.pi) % (2 * jnp.pi) - jnp.pi


jax.tree_util.register_dataclass(
    TorusTables,
    data_fields=["p_table", "score_table", "score_norm_table"],
    meta_fields=["cfg"],
)


@functools.lru_cache(maxsize=2)
def get_torus_tables(cfg: TorusConfig = TorusConfig()) -> TorusTables:
    cache_dir = default_cache_dir()
    cache_dir.mkdir(parents=True, exist_ok=True)
    key = hashlib.md5(repr(cfg).encode()).hexdigest()[:12]
    path = cache_dir / f"torus_tables_{key}.npz"
    if path.exists():
        data = np.load(path)
        p, score, sn = data["p"], data["score"], data["score_norm"]
    else:
        _, _, p, score, sn = _generate_tables(cfg)
        tmp = path.with_suffix(".tmp.npz")
        np.savez(tmp, p=p, score=score, score_norm=sn)
        os.replace(tmp, path)
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return TorusTables(cfg, f32(p), f32(score), f32(sn))
