"""Pallas TPU kernel: fused factored tensor-product message pass.

The hot op of the whole framework (reference per-edge e3nn TP + scatter,
``models/tensor_layers.py:125-231``; our einsum path in
``models/tpconv.py:_tp_message_reduced``). One kernel fuses, per block of
receivers, entirely in VMEM:

1. per-edge spherical-harmonic/Clebsch-Gordan coupling (``W = sh @ cgm`` +
   unrolled elementwise accumulation over the l1 components),
2. the neighbor reduction ``p_h = h^T C`` (contraction over K on the MXU),
3. the weight application ``out = reshape(p_h) @ tt + p_b @ bb`` with the
   (h, fan) axes merged and an identity expansion over the output-irrep
   components.

Versus the XLA einsum path this eliminates every HBM round-trip between the
steps — the profiled einsum path moved (R, K, fan, d3) and (R, H, fan*d3)
temporaries through HBM per class per layer (the dominant cost at DiffDock-L
scale even after layout merging).

The kernel is numerically identical to ``_tp_message_reduced`` (same
reassociation; f32 accumulation) and is cross-checked against it in
``tests/test_pallas_tp.py`` with ``interpret=True`` on CPU.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass(frozen=True)
class PathSpec:
    x_start: int  # slice start into F_in
    mul: int  # u (multiplicity of the in1 entry)
    d1: int  # in1 irrep dim (i)
    sh_start: int  # slice start into sh dim
    d2: int  # sh irrep dim (j)
    cgm: Tuple[float, ...]  # (d2, d1*d3) row-major static CG matrix
    cgm_shape: Tuple[int, int]


@dataclasses.dataclass(frozen=True)
class ClassSpec:
    fan: int
    d3: int
    mul_out: int
    paths: Tuple[PathSpec, ...]


def class_specs_from_tp(tp) -> Tuple[ClassSpec, ...]:
    """Build static kernel metadata from a FullyConnectedTensorProduct."""
    out = []
    for k, (pk, fan, ek) in enumerate(zip(tp.paths, tp.fan_in, tp.irreps_out)):
        d3 = ek.ir.dim
        paths = []
        for p in pk:
            e1 = tp.irreps_in1[p.i]
            cgm = p.cg.transpose(1, 0, 2).reshape(p.cg.shape[1], -1)
            paths.append(PathSpec(
                x_start=tp._sl1[p.i].start,
                mul=e1.mul,
                d1=e1.ir.dim,
                sh_start=tp._sl2[p.j].start,
                d2=p.cg.shape[1],
                cgm=tuple(cgm.reshape(-1).tolist()),
                cgm_shape=cgm.shape,
            ))
        out.append(ClassSpec(fan=fan, d3=d3, mul_out=ek.mul,
                             paths=tuple(paths)))
    return tuple(out)


def _kernel(specs: Tuple[ClassSpec, ...], H: int,
            x_ref, sh_ref, h_ref, mw_ref, tt_ref, bb_ref, out_ref):
    """One receiver block: all classes, all paths, fully in VMEM."""
    x = x_ref[:]  # (B, K, F_in)
    sh = sh_ref[:]  # (B, K, J)
    h = h_ref[:]  # (B, K, H) — already mask*weight scaled
    mw = mw_ref[:]  # (B, K)
    B, K, _ = x.shape

    tt_off = 0
    bb_off = 0
    out_off = 0
    for spec in specs:
        d3 = spec.d3
        segs = []
        for p in spec.paths:
            a = x[:, :, p.x_start : p.x_start + p.mul * p.d1]
            a = a.reshape(B, K, p.mul, p.d1)
            shp = sh[:, :, p.sh_start : p.sh_start + p.d2]
            cgm = jnp.asarray(
                np.asarray(p.cgm, np.float32).reshape(p.cgm_shape),
                dtype=x.dtype,
            )
            # W[b, k, i*d3] = sum_j sh_j cg[i, j, d]
            W = jax.lax.dot_general(
                shp.reshape(B * K, p.d2), cgm,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype).reshape(B, K, p.d1 * d3)
            C_p = None
            for i in range(p.d1):
                term = (
                    a[:, :, :, i][..., None]
                    * W[:, :, i * d3 : (i + 1) * d3][..., None, :]
                )
                C_p = term if C_p is None else C_p + term
            segs.append(C_p.reshape(B, K, p.mul * d3))
        C = segs[0] if len(segs) == 1 else jnp.concatenate(segs, axis=-1)
        Fk = spec.fan * d3

        # p_h[b, h, F] = sum_k h[b, k, h] * C[b, k, F]
        p_h = jax.lax.dot_general(
            h, C,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)  # (B, H, Fk)
        # p_b[b, F] = sum_k mw[b, k] * C[b, k, F]
        p_b = jnp.sum(mw[..., None] * C, axis=1).astype(x.dtype)

        Wk = spec.mul_out * d3
        tt = tt_ref[tt_off : tt_off + H * Fk, :Wk]
        bb = bb_ref[bb_off : bb_off + Fk, :Wk]
        out_k = (
            jax.lax.dot_general(
                p_h.reshape(B, H * Fk), tt,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                p_b, bb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ) / math.sqrt(spec.fan)
        out_ref[:, out_off : out_off + Wk] = out_k.astype(out_ref.dtype)
        tt_off += H * Fk
        bb_off += Fk
        out_off += Wk


def factored_tp_messages_pallas(
    tp,
    x_nbr: jnp.ndarray,  # (N, K, F_in)
    edge_sh: jnp.ndarray,  # (N, K, J)
    h: jnp.ndarray,  # (N, K, H) — pre-scaled by mask*edge_weight
    mw: jnp.ndarray,  # (N, K)
    out_kernel: jnp.ndarray,  # (H, weight_numel) FC final layer
    out_bias: jnp.ndarray,  # (weight_numel,)
    block_rows: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Summed messages (N, dim_out); drop-in for the einsum reduction."""
    from diffdock_tpu.ops.tensor_product import FullyConnectedTensorProduct

    specs = class_specs_from_tp(tp)
    N, K, F_in = x_nbr.shape
    H = h.shape[-1]
    dt = x_nbr.dtype

    # stacked weight matrices: tt rows = sum_k H*Fk, cols = max Wk
    Wk_max = max(s.mul_out * s.d3 for s in specs)
    tt_rows = sum(H * s.fan * s.d3 for s in specs)
    bb_rows = sum(s.fan * s.d3 for s in specs)
    tt_all = jnp.zeros((tt_rows, Wk_max), dt)
    bb_all = jnp.zeros((bb_rows, Wk_max), dt)
    tt_off = bb_off = off = 0
    for s in specs:
        fan, d3, mul = s.fan, s.d3, s.mul_out
        t_k = out_kernel[:, off : off + fan * mul].reshape(H, fan, mul)
        b_k = out_bias[off : off + fan * mul].reshape(fan, mul)
        tt = FullyConnectedTensorProduct.expand_weight_identity(
            t_k.astype(dt), d3
        )
        bb = FullyConnectedTensorProduct.expand_bias_identity(
            b_k.astype(dt), d3
        )
        tt_all = tt_all.at[tt_off : tt_off + H * fan * d3, : mul * d3].set(tt)
        bb_all = bb_all.at[bb_off : bb_off + fan * d3, : mul * d3].set(bb)
        tt_off += H * fan * d3
        bb_off += fan * d3
        off += fan * mul

    out_dim = sum(s.mul_out * s.d3 for s in specs)

    n_pad = (-N) % block_rows
    if n_pad:
        pad = lambda a: jnp.pad(a, [(0, n_pad)] + [(0, 0)] * (a.ndim - 1))
        x_nbr, edge_sh, h, mw = map(pad, (x_nbr, edge_sh, h, mw))
    Np = N + n_pad

    grid = (Np // block_rows,)
    kernel = functools.partial(_kernel, specs, H)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, K, F_in), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, K, edge_sh.shape[-1]),
                         lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, K, H), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tt_rows, Wk_max), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb_rows, Wk_max), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, out_dim), jnp.float32),
        interpret=interpret,
    )(x_nbr, edge_sh, h, mw, tt_all, bb_all)
    return out[:N]
