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


class OldAtomEncoder(nn.Module):
    """The v1.0 encoder (reference ``models/layers.py:70-116``): categorical
    embeddings and a linear map of the scalar features are SUMMED (the new
    encoder concatenates and fuses); a language-model embedding, if present,
    is concatenated afterwards and fused by ``lm_embedding_layer``. Used by
    the released old-architecture checkpoints (``use_old_atom_encoder``
    defaults to True, ``utils/utils.py:218``).

    ``x_tail`` is the full non-categorical tail of the reference node array
    IN REFERENCE ORDER — ``(lm_embedding, sigma_emb)`` for receptors with
    ESM, ``(sigma_emb,)`` otherwise (the old models build
    ``x = cat(preprocessed_x, node_sigma_emb)``, ``old_cg_model.py:381``,
    with lm already inside ``preprocessed_x``, ``process_mols.py:199``).
    The reference slices scalars as ``x_tail[:scalar_dim]`` and the LM block
    as ``x_tail[-lm_dim:]`` — with ESM these OVERLAP (the 'scalar' block is
    the first 32 LM dims; the 'lm' block is lm[32:] + sigma). The released
    weights were trained with that overlap, so it is reproduced verbatim.
    """

    emb_dim: int
    categorical_dims: Tuple[int, ...]
    scalar_dim: int = 0  # feature_dims[1] + sigma_embed_dim
    lm_dim: int = 0  # 1280 for ESM

    @nn.compact
    def __call__(
        self, x_cat: jnp.ndarray, x_tail: jnp.ndarray = None
    ) -> jnp.ndarray:
        emb = 0.0
        for i, dim in enumerate(self.categorical_dims):
            table = nn.Embed(
                dim, self.emb_dim,
                embedding_init=nn.initializers.xavier_uniform(),
                name=f"cat_{i}",
            )
            emb = emb + table(x_cat[..., i])
        if self.scalar_dim > 0:
            assert x_tail is not None
            assert x_tail.shape[-1] == self.scalar_dim + self.lm_dim
            emb = emb + nn.Dense(self.emb_dim, name="linear")(
                x_tail[..., : self.scalar_dim]
            )
        if self.lm_dim > 0:
            emb = nn.Dense(self.emb_dim, name="lm_embedding_layer")(
                jnp.concatenate([emb, x_tail[..., -self.lm_dim :]], axis=-1)
            )
        return emb


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
