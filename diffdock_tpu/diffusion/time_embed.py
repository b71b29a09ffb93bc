"""Diffusion-time embeddings (reference ``utils/diffusion_utils.py:99-135``)."""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp


def sinusoidal_embedding(
    timesteps: jnp.ndarray, embedding_dim: int, max_positions: int = 10000
) -> jnp.ndarray:
    """(N,) -> (N, embedding_dim) transformer-style sinusoidal embedding."""
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def gaussian_fourier_embedding(
    timesteps: jnp.ndarray, w: jnp.ndarray
) -> jnp.ndarray:
    """Gaussian Fourier features; ``w`` is a fixed (embedding_size//2,) draw."""
    x_proj = timesteps[:, None] * w[None, :] * 2 * jnp.pi
    return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


def get_timestep_embedding(
    embedding_type: str, embedding_dim: int, embedding_scale: float = 10000.0
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Return t -> embedding fn (reference ``get_timestep_embedding``).

    The training default is ``sinusoidal`` with scale 1000
    (``utils/parsing.py:390-392``).
    """
    if embedding_type == "sinusoidal":
        return lambda x: sinusoidal_embedding(embedding_scale * x, embedding_dim)
    if embedding_type == "fourier":
        w = jax.random.normal(
            jax.random.PRNGKey(0), (embedding_dim // 2,)
        ) * embedding_scale
        return lambda x: gaussian_fourier_embedding(x, w)
    raise ValueError(f"unknown embedding_type {embedding_type!r}")
