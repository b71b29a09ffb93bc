"""Masked dense reductions replacing torch-scatter.

With fixed-capacity neighbor lists, every "scatter" in the reference
(``models/tensor_layers.py:144``, ``cg_model.py:365``) becomes a masked mean
over the neighbor axis — a dense, layout-friendly reduce on TPU.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp


def masked_mean_pool(
    x: jnp.ndarray, mask: jnp.ndarray, axis: int = -2, eps: float = 1e-16
) -> jnp.ndarray:
    """Mean of ``x`` over ``axis`` counting only ``mask``-valid entries.

    mask broadcasts against x without the trailing feature dim.
    """
    w = jnp.expand_dims(mask.astype(x.dtype), -1)
    num = jnp.sum(x * w, axis=axis)
    den = jnp.maximum(jnp.sum(w, axis=axis), eps)
    return num / den


def multi_group_mean(
    parts: Sequence[jnp.ndarray],
    masks: Sequence[jnp.ndarray],
    eps: float = 1e-16,
) -> jnp.ndarray:
    """Mean over several neighbor blocks targeting the same receivers.

    Equivalent to the reference's multi-edge-group scatter where the sum and
    the edge count are accumulated across groups before one division
    (``tp_scatter_multigroup``, ``models/tensor_layers.py:148-231``):
    receivers divide by their *total* valid degree over all groups.

    parts[g]: (..., K_g, F) messages; masks[g]: (..., K_g) validity.
    """
    num = None
    den = None
    for part, mask in zip(parts, masks):
        w = jnp.expand_dims(mask.astype(part.dtype), -1)
        s = jnp.sum(part * w, axis=-2)
        c = jnp.sum(w, axis=-2)
        num = s if num is None else num + s
        den = c if den is None else den + c
    return num / jnp.maximum(den, eps)
