"""Per-irrep batch normalization (e3nn ``nn.BatchNorm`` semantics).

Scalars (0e) get mean subtraction and bias; every irrep is normalized by the
running mean of its component-wise mean square; affine scale per channel
(reference dependency used at ``models/tensor_layers.py:308``). Mask-aware:
padded nodes are excluded from batch statistics.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from diffdock_tpu.ops.irreps import Irreps


class IrrepsBatchNorm(nn.Module):
    """``axis_names``: vmap/shard_map axis names to aggregate batch statistics
    over (so a per-complex ``vmap`` still computes reference-equivalent
    whole-batch statistics during training)."""

    irreps: Irreps
    eps: float = 1e-5
    momentum: float = 0.1
    affine: bool = True
    axis_names: tuple = ()

    def _agg(self, num: jnp.ndarray, den) -> jnp.ndarray:
        for ax in self.axis_names:
            num = jax.lax.psum(num, ax)
            den = jax.lax.psum(den, ax)
        return num / den

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """x: (..., irreps.dim); mask: (...,) validity of each row."""
        irreps = Irreps(self.irreps)
        num_features = irreps.num_irreps
        num_scalar = sum(e.mul for e in irreps if e.ir.l == 0 and e.ir.p == 1)

        running_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(num_scalar)
        )
        running_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(num_features)
        )
        if self.affine:
            weight = self.param("weight", nn.initializers.ones, (num_features,))
            bias = self.param("bias", nn.initializers.zeros, (num_scalar,))

        flat = x.reshape(-1, x.shape[-1])
        if mask is None:
            m = jnp.ones(flat.shape[0], dtype=x.dtype)
        else:
            m = mask.reshape(-1).astype(x.dtype)
        denom = jnp.maximum(m.sum(), 1.0)

        out_parts = []
        new_means, new_vars = [], []
        i_mean = i_feat = 0
        for e, sl in zip(irreps, irreps.slices()):
            field = flat[:, sl].reshape(-1, e.mul, e.ir.dim)
            is_scalar = e.ir.l == 0 and e.ir.p == 1

            if is_scalar:
                if train:
                    fmean = self._agg((field[..., 0] * m[:, None]).sum(0), denom)
                    new_means.append(fmean)
                else:
                    fmean = running_mean.value[i_mean : i_mean + e.mul]
                field = field - fmean[None, :, None]

            if train:
                fnorm = (field**2).mean(-1)  # component normalization
                fnorm = self._agg((fnorm * m[:, None]).sum(0), denom)  # 'mean'
                new_vars.append(fnorm)
            else:
                fnorm = running_var.value[i_feat : i_feat + e.mul]

            scale = (fnorm + self.eps) ** (-0.5)
            if self.affine:
                scale = scale * weight[i_feat : i_feat + e.mul]
            field = field * scale[None, :, None]
            if self.affine and is_scalar:
                field = field + bias[i_mean : i_mean + e.mul, None]

            out_parts.append(field.reshape(-1, e.dim))
            if is_scalar:
                i_mean += e.mul
            i_feat += e.mul

        if train and not self.is_initializing():
            if new_means:
                bm = jnp.concatenate(new_means)
                running_mean.value = (
                    (1 - self.momentum) * running_mean.value + self.momentum * bm
                )
            bv = jnp.concatenate(new_vars)
            running_var.value = (
                (1 - self.momentum) * running_var.value + self.momentum * bv
            )

        out = jnp.concatenate(out_parts, axis=-1)
        return out.reshape(x.shape)
