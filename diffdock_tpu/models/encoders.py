"""Feature encoders (reference ``models/layers.py``)."""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class FCBlock(nn.Module):
    """MLP emitting tensor-product weights (reference ``models/layers.py:10``).

    The output layer's kernel/bias are direct parameters (not a Dense
    submodule) so the factored tensor-product path can contract them AFTER
    the neighbor reduction — see ``models/tpconv.py``. ``__call__`` is
    mathematically identical to the reference Sequential.
    """

    hidden_dim: int
    out_dim: int
    layers: int = 2
    dropout: float = 0.0
    activation: str = "relu"
    dtype: str = "float32"  # compute dtype; params stay float32

    def setup(self):
        assert self.layers >= 2
        self.hidden_layers = [
            nn.Dense(self.hidden_dim, name=f"Dense_{i}", dtype=self.dtype)
            for i in range(self.layers - 1)
        ]
        self.dropouts = [
            nn.Dropout(self.dropout, name=f"drop_{i}")
            for i in range(self.layers - 1)
        ]
        self.out_kernel = self.param(
            "out_kernel",
            nn.initializers.lecun_normal(),
            (self.hidden_dim, self.out_dim),
        )
        self.out_bias = self.param(
            "out_bias", nn.initializers.zeros, (self.out_dim,)
        )

    def hidden(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = {"relu": nn.relu, "silu": nn.silu}[self.activation]
        for layer, drop in zip(self.hidden_layers, self.dropouts):
            x = layer(x)
            x = act(x)
            x = drop(x, deterministic=not train)
        return x

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = self.hidden(x, train=train)
        return h @ self.out_kernel + self.out_bias


class GaussianSmearing(nn.Module):
    """RBF distance embedding (reference ``models/layers.py:20-30``)."""

    start: float = 0.0
    stop: float = 5.0
    num_gaussians: int = 50

    @nn.compact
    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        offset = np.linspace(self.start, self.stop, self.num_gaussians)
        coeff = -0.5 / float(offset[1] - offset[0]) ** 2
        d = dist[..., None] - jnp.asarray(offset, dist.dtype)
        return jnp.exp(coeff * d * d)


class AtomEncoder(nn.Module):
    """Sum of categorical embeddings + linear fuse of extra scalar features
    (reference ``models/layers.py:33-68``, the 'new' encoder).

    Input layout: ``x[..., :n_cat]`` integer-coded categorical features,
    ``x[..., n_cat:]`` scalar features (sigma embedding, LM embedding, ...).
    """

    emb_dim: int
    categorical_dims: Tuple[int, ...]
    scalar_dim: int = 0  # sigma_embed_dim + lm_embedding_dim + scalars

    @nn.compact
    def __call__(self, x_cat: jnp.ndarray, x_scalar: jnp.ndarray = None) -> jnp.ndarray:
        emb = 0.0
        for i, dim in enumerate(self.categorical_dims):
            table = nn.Embed(
                dim, self.emb_dim,
                embedding_init=nn.initializers.xavier_uniform(),
                name=f"cat_{i}",
            )
            emb = emb + table(x_cat[..., i])
        if self.scalar_dim > 0:
            assert x_scalar is not None and x_scalar.shape[-1] == self.scalar_dim
            emb = nn.Dense(self.emb_dim, name="fuse")(
                jnp.concatenate([emb, x_scalar], axis=-1)
            )
        return emb
