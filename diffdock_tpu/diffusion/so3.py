"""Isotropic Gaussian on SO(3): device-resident sampling & score tables.

The IGSO3 density over rotation angle omega is the truncated series
  f(omega; eps) = sum_l (2l+1) exp(-l(l+1) eps^2/2) sin((l+1/2) omega)/sin(omega/2)
(reference ``utils/so3.py:21-42``). The reference precomputes pdf/cdf/score
grids with per-eps Python loops and caches ``.npy`` files in the CWD, then
does *host* numpy lookups inside the model forward
(``models/cg_model.py:395`` calls ``so3.score_norm(rot_sigma.cpu())``).

Here the whole generation collapses into two (N_EPS, L) @ (L, X_N) matmuls,
and all lookups are pure jnp gathers/interp on device-resident tables — the
sampler never leaves the TPU.
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


def default_cache_dir() -> Path:
    env = os.environ.get("DIFFDOCK_TPU_CACHE")
    if env:
        return Path(env)
    return Path.home() / ".cache" / "diffdock_tpu"


@dataclasses.dataclass(frozen=True)
class SO3Config:
    """Grid parameters; defaults match reference ``utils/so3.py:6-7``."""

    min_eps: float = 0.0005
    max_eps: float = 4.0
    n_eps: int = 2000
    x_n: int = 2000
    l_max: int = 2000  # series truncation L


def _generate_tables(cfg: SO3Config) -> Tuple[np.ndarray, ...]:
    """Compute (omegas, cdf_vals, score_norms, exp_score_norms) in float64."""
    omegas = np.linspace(0, np.pi, cfg.x_n + 1)[1:]
    eps_grid = 10 ** np.linspace(
        np.log10(cfg.min_eps), np.log10(cfg.max_eps), cfg.n_eps
    )

    l_vec = np.arange(cfg.l_max, dtype=np.float64)
    # coeff[e, l] = (2l+1) exp(-l(l+1) eps^2 / 2)
    coeff = (2 * l_vec + 1) * np.exp(
        -l_vec * (l_vec + 1) * (eps_grid[:, None] ** 2) / 2
    )
    hi = np.sin(np.outer(l_vec + 0.5, omegas))  # (L, X)
    lo = np.sin(omegas / 2)  # (X,)
    sinterm = hi / lo  # (L, X)

    exp_vals = coeff @ sinterm  # (N_EPS, X)
    pdf_vals = exp_vals * (1 - np.cos(omegas)) / np.pi
    cdf_vals = np.cumsum(pdf_vals, axis=1) / cfg.x_n * np.pi

    dhi = (l_vec[:, None] + 0.5) * np.cos(np.outer(l_vec + 0.5, omegas))
    dlo = 0.5 * np.cos(omegas / 2)
    dterm = (lo * dhi - hi * dlo) / lo**2  # (L, X)
    dsigma = coeff @ dterm
    score_norms = dsigma / exp_vals

    with np.errstate(invalid="ignore"):
        exp_score_norms = np.sqrt(
            np.sum(score_norms**2 * pdf_vals, axis=1)
            / np.sum(pdf_vals, axis=1)
            / np.pi
        )

    # The truncated series cannot resolve eps < ~10/L (the reference ships
    # garbage rows there, utils/so3.py:52-58). Replace those rows with the
    # exact small-eps limit: IGSO3 -> 3D Gaussian, omega ~ Maxwell(eps),
    # score = -omega/eps^2, E-norm sqrt(3/pi)/eps (the /pi replicates the
    # reference's extra normalization at utils/so3.py:59).
    bad = eps_grid < 10.0 / cfg.l_max
    if bad.any():
        eps_b = eps_grid[bad][:, None]
        pdf_b = omegas**2 / eps_b**3 * np.exp(-(omegas**2) / (2 * eps_b**2))
        cdf_b = np.cumsum(pdf_b, axis=1)
        cdf_b /= cdf_b[:, -1:]
        cdf_vals[bad] = cdf_b
        score_norms[bad] = -omegas / eps_b**2
        exp_score_norms[bad] = np.sqrt(3.0 / np.pi) / eps_b[:, 0]

    return omegas, cdf_vals, score_norms, exp_score_norms


@dataclasses.dataclass(frozen=True)
class SO3Tables:
    cfg: SO3Config
    omegas: jnp.ndarray  # (X,)
    cdf_vals: jnp.ndarray  # (N_EPS, X)
    score_norms: jnp.ndarray  # (N_EPS, X)
    exp_score_norms: jnp.ndarray  # (N_EPS,)

    def _eps_idx(self, eps: jnp.ndarray) -> jnp.ndarray:
        """Nearest log-grid index, replicating reference rounding
        (``utils/so3.py:76-78``)."""
        c = self.cfg
        idx = (
            (jnp.log10(eps) - np.log10(c.min_eps))
            / (np.log10(c.max_eps) - np.log10(c.min_eps))
            * c.n_eps
        )
        return jnp.clip(jnp.round(idx), 0, c.n_eps - 1).astype(jnp.int32)

    def sample_vec(self, key: jax.Array, eps: jnp.ndarray) -> jnp.ndarray:
        """Sample IGSO3 rotations as axis-angle vectors.

        eps: (...,) sigmas -> returns (..., 3). Inverse-cdf in omega times a
        uniform axis (reference ``utils/so3.py:67-78``).
        """
        k_u, k_dir = jax.random.split(key)
        idx = self._eps_idx(eps)
        u = jax.random.uniform(k_u, eps.shape)
        cdf_rows = self.cdf_vals[idx]  # (..., X)
        omega = jax.vmap(jnp.interp)(
            u.reshape(-1), cdf_rows.reshape(-1, cdf_rows.shape[-1]),
            jnp.broadcast_to(self.omegas, (u.size, self.omegas.shape[0])),
        ).reshape(eps.shape)
        direction = jax.random.normal(k_dir, eps.shape + (3,))
        direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
        return direction * omega[..., None]

    def score_vec(self, eps: jnp.ndarray, vec: jnp.ndarray) -> jnp.ndarray:
        """Score of IGSO3 at rotation ``vec`` (axis-angle), (...,3)->(...,3).
        Reference ``utils/so3.py:81-86``."""
        idx = self._eps_idx(eps)
        om = jnp.linalg.norm(vec, axis=-1)
        rows = self.score_norms[idx]
        score = jax.vmap(jnp.interp)(
            om.reshape(-1),
            jnp.broadcast_to(self.omegas, (om.size, self.omegas.shape[0])),
            rows.reshape(-1, rows.shape[-1]),
        ).reshape(om.shape)
        return score[..., None] * vec / jnp.maximum(om[..., None], 1e-12)

    def score_norm(self, eps: jnp.ndarray) -> jnp.ndarray:
        """E[||score||^2]^{1/2} lookup (reference ``utils/so3.py:89-93``)."""
        return self.exp_score_norms[self._eps_idx(eps)]


jax.tree_util.register_dataclass(
    SO3Tables,
    data_fields=["omegas", "cdf_vals", "score_norms", "exp_score_norms"],
    meta_fields=["cfg"],
)


@functools.lru_cache(maxsize=2)
def get_so3_tables(cfg: SO3Config = SO3Config()) -> SO3Tables:
    """Build (or load cached) tables and put them on device as float32."""
    cache_dir = default_cache_dir()
    cache_dir.mkdir(parents=True, exist_ok=True)
    key = hashlib.md5(repr(cfg).encode()).hexdigest()[:12]
    path = cache_dir / f"so3_tables_{key}.npz"
    if path.exists():
        data = np.load(path)
        omegas, cdf, sn, esn = (
            data["omegas"], data["cdf_vals"], data["score_norms"],
            data["exp_score_norms"],
        )
    else:
        omegas, cdf, sn, esn = _generate_tables(cfg)
        tmp = path.with_suffix(".tmp.npz")
        np.savez(tmp, omegas=omegas, cdf_vals=cdf, score_norms=sn,
                 exp_score_norms=esn)
        os.replace(tmp, path)
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return SO3Tables(cfg, f32(omegas), f32(cdf), f32(sn), f32(esn))
