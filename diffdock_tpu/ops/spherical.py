"""Closed-form real spherical harmonics, lmax <= 2, component-normalized.

Replaces ``o3.spherical_harmonics(..., normalize=True,
normalization='component')`` (called at reference ``models/cg_model.py:494``
etc.) with explicit polynomials — no codegen, fuses into surrounding XLA ops.

Basis convention: components ordered m = -l..l with the real SH mapping
l=1 -> (y, z, x) (the e3nn convention), consistent with the real Wigner-3j
tensors in ``ops/wigner.py``. 'component' normalization means each component
has unit mean square over the sphere, i.e. ||Y_l(u)||^2 = 2l+1 for unit u.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from diffdock_tpu.ops.irreps import Irreps

SH_IRREPS = {
    0: Irreps("0e"),
    1: Irreps("0e + 1o"),
    2: Irreps("0e + 1o + 2e"),
}

_SQRT3 = math.sqrt(3.0)
_SQRT15 = math.sqrt(15.0)
_SQRT5_2 = math.sqrt(5.0) / 2.0
_SQRT15_2 = math.sqrt(15.0) / 2.0


def spherical_harmonics(
    vec: jnp.ndarray, lmax: int, normalize: bool = True, eps: float = 1e-12
) -> jnp.ndarray:
    """(..., 3) vectors -> (..., (lmax+1)^2) concatenated Y_0..Y_lmax.

    Zero vectors (padded edges) map to a safe direction; callers mask the
    results anyway.
    """
    if normalize:
        n = jnp.linalg.norm(vec, axis=-1, keepdims=True)
        vec = vec / jnp.maximum(n, eps)
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]

    out = [jnp.ones_like(x)]
    if lmax >= 1:
        out += [_SQRT3 * y, _SQRT3 * z, _SQRT3 * x]
    if lmax >= 2:
        out += [
            _SQRT15 * x * y,
            _SQRT15 * y * z,
            _SQRT5_2 * (3.0 * z * z - 1.0),
            _SQRT15 * x * z,
            _SQRT15_2 * (x * x - y * y),
        ]
    if lmax >= 3:
        raise NotImplementedError("lmax <= 2 covers the model family")
    return jnp.stack(out, axis=-1)


def irrep1_to_vector(u: jnp.ndarray) -> jnp.ndarray:
    """l=1 irrep components (y, z, x) -> ambient vector (x, y, z).

    Needed wherever an equivariant feature leaves irrep space and becomes a
    geometric update (the score model's tr/rot heads).
    """
    return u[..., jnp.array([2, 0, 1])]


def vector_to_irrep1(v: jnp.ndarray) -> jnp.ndarray:
    """Ambient vector (x, y, z) -> l=1 irrep components (y, z, x)."""
    return v[..., jnp.array([1, 2, 0])]
