"""Equivariant linear layer over irreps (e3nn ``o3.Linear`` equivalent).

The reference uses ``o3.Linear`` inside the depthwise conv variant
(``models/tensor_layers.py:285-292``) to mix multiplicities within each
irrep type after a 'uvu' tensor product. Semantics: channels of the same
(l, p) mix through a dense matrix applied identically to all m components;
different irrep types never mix (that would break equivariance). e3nn
normalization: weights scaled by 1 / sqrt(fan_in) at apply time.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from diffdock_tpu.ops.irreps import Irreps


class IrrepsLinear(nn.Module):
    """Dense mixing within each irrep type: (..., dim_in) -> (..., dim_out).

    Input entries of the same (l, p) are concatenated over multiplicity and
    mixed with one (mul_in_total, mul_out) kernel per type; output entries
    with no matching input type are zero (e3nn behavior for unreachable
    outputs)."""

    irreps_in: str
    irreps_out: str

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ir_in = Irreps(self.irreps_in)
        ir_out = Irreps(self.irreps_out)
        sl_in = ir_in.slices()

        # group input entries by irrep type
        by_type: Dict[Tuple[int, int], List[Tuple[slice, int, int]]] = {}
        for e, sl in zip(ir_in, sl_in):
            by_type.setdefault((e.ir.l, e.ir.p), []).append(
                (sl, e.mul, e.ir.dim)
            )

        outs = []
        for k, ek in enumerate(ir_out):
            key = (ek.ir.l, ek.ir.p)
            sources = by_type.get(key, [])
            if not sources:
                outs.append(
                    jnp.zeros(x.shape[:-1] + (ek.dim,), x.dtype)
                )
                continue
            d = ek.ir.dim
            stacked = jnp.concatenate(
                [
                    x[..., sl].reshape(x.shape[:-1] + (mul, d))
                    for sl, mul, d in sources
                ],
                axis=-2,
            )  # (..., mul_in_total, d)
            mul_in = stacked.shape[-2]
            w = self.param(
                f"w_{k}", nn.initializers.normal(1.0), (mul_in, ek.mul),
                jnp.float32,
            )
            out = jnp.einsum(
                "...ud,uw->...wd", stacked, w.astype(x.dtype)
            ) / np.sqrt(mul_in)
            outs.append(out.reshape(out.shape[:-2] + (ek.dim,)))
        return jnp.concatenate(outs, axis=-1)
