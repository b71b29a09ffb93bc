"""Pallas TPU kernel: fused factored tensor-product message pass.

The hot op of the whole framework (reference per-edge e3nn TP + scatter,
``models/tensor_layers.py:125-231``; our einsum path in
``models/tpconv.py:_tp_message_reduced``). One kernel fuses, per block of
receivers, entirely in VMEM:

1. per-edge spherical-harmonic/Clebsch-Gordan coupling,
2. the neighbor reduction ``p_h[b,h,:] = sum_k h[b,k,h] C[b,k,:]``
   (batched dot on the MXU),
3. the weight application ``out = sum_{h,u} p_h t`` (h-batched dot).

Why: profiled on v5e, the XLA einsum path materializes the (N, H, fan*d3)
``p_h`` tensor in HBM — ~1.7 GB per edge group per layer at DiffDock-L
bench scale — making the conv stack HBM-bound at ~4% FLOP utilization.
Here ``C`` and ``p_h`` never leave VMEM.

Mosaic constraints shape the design (probed on the real chip):
* batched ``dot_general`` (one leading batch dim) lowers; reshapes that
  merge/split *minor* dims do not — so the output-irrep component axis d
  is unrolled at trace time and every tensor stays 3D,
* inputs are pre-packed: per-path neighbor features transposed to
  ``[path][i][u]`` order so the kernel takes contiguous minor slices only,
* the kernel writes each class's output as (d-major, w-minor); the host
  wrapper reorders to the e3nn-conventional (w-major, d-minor).

Numerically identical to ``_tp_message_reduced`` (same reassociation, f32
accumulation); cross-checked in ``tests/test_pallas_tp.py`` with
``interpret=True`` on CPU and against the einsum path on TPU.
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
    x_start: int  # slice start into the ORIGINAL F_in
    xp_start: int  # slice start into the packed [path][i][u] input
    mul: int  # u
    d1: int  # i
    sh_start: int
    d2: int  # j
    cg_col: int  # column offset into packed cg input


@dataclasses.dataclass(frozen=True)
class ClassSpec:
    fan: int
    d3: int
    mul_out: int
    out_off: int  # offset into the kernel output (d-major layout)
    paths: Tuple[PathSpec, ...]


def build_specs(tp):
    """Static metadata + packed CG matrix for a FullyConnectedTensorProduct."""
    specs: List[ClassSpec] = []
    col = 0
    xp_off = 0
    out_off = 0
    blocks = []
    max_d2 = 1
    for k, (pk, fan, ek) in enumerate(zip(tp.paths, tp.fan_in, tp.irreps_out)):
        d3 = ek.ir.dim
        paths = []
        for p in pk:
            e1 = tp.irreps_in1[p.i]
            cgm = p.cg.transpose(1, 0, 2).reshape(p.cg.shape[1], -1)
            max_d2 = max(max_d2, cgm.shape[0])
            paths.append(PathSpec(
                x_start=tp._sl1[p.i].start,
                xp_start=xp_off,
                mul=e1.mul,
                d1=e1.ir.dim,
                sh_start=tp._sl2[p.j].start,
                d2=cgm.shape[0],
                cg_col=col,
            ))
            blocks.append(cgm)
            col += cgm.shape[1]
            xp_off += e1.ir.dim * e1.mul
        specs.append(ClassSpec(fan=fan, d3=d3, mul_out=ek.mul,
                               out_off=out_off, paths=tuple(paths)))
        out_off += ek.mul * d3
    cg_all = np.zeros((max_d2, max(col, 1)), np.float32)
    c = 0
    for b in blocks:
        cg_all[: b.shape[0], c : c + b.shape[1]] = b
        c += b.shape[1]
    return tuple(specs), cg_all, xp_off, out_off


def pack_neighbors(tp, specs, x_nbr: jnp.ndarray) -> jnp.ndarray:
    """(N, K, F_in) -> (N, K, sum_p d1*u) with each path's features in
    [i][u] order (i outer), so the kernel slices (N, K, u) contiguously."""
    parts = []
    for spec in specs:
        for p in spec.paths:
            a = x_nbr[:, :, p.x_start : p.x_start + p.mul * p.d1]
            a = a.reshape(a.shape[:2] + (p.mul, p.d1))
            parts.append(jnp.swapaxes(a, -1, -2).reshape(
                a.shape[:2] + (p.d1 * p.mul,)
            ))
    return jnp.concatenate(parts, axis=-1)


def _kernel(specs, H, n_t,
            *refs):
    (xp_ref, sh_ref, h_ref, mw_ref, cg_ref), t_refs, b_refs, (out_ref,) = (
        refs[:5], refs[5 : 5 + n_t], refs[5 + n_t : 5 + 2 * n_t], refs[-1:]
    )
    xp = xp_ref[:]  # (B, K, XP)
    sh = sh_ref[:]  # (B, K, J)
    h = h_ref[:]  # (B, K, H), pre-scaled by mask*edge_weight
    mw = mw_ref[:]  # (B, 1, K)
    B, K, _ = xp.shape

    for ci, spec in enumerate(specs):
        d3 = spec.d3
        t_k = t_refs[ci][:]  # (H, fan, mul)
        b_k = b_refs[ci][:]  # (fan, mul)
        inv = 1.0 / math.sqrt(spec.fan)
        # per-edge CG weights for every path of this class
        Ws = []
        for p in spec.paths:
            shp = sh[:, :, p.sh_start : p.sh_start + p.d2]
            cgm = cg_ref[: p.d2, p.cg_col : p.cg_col + p.d1 * d3]
            W = jax.lax.dot_general(
                shp.reshape(B * K, p.d2), cgm.astype(xp.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(xp.dtype).reshape(B, K, p.d1 * d3)
            Ws.append(W)

        # coupled features for ALL d components at once, d-major on the
        # minor axis: C_all[b, k, dd*fan + u]
        d_segs = []
        for dd in range(d3):
            segs = []
            for p, W in zip(spec.paths, Ws):
                C_p = None
                for i in range(p.d1):
                    a_i = xp[:, :, p.xp_start + i * p.mul
                             : p.xp_start + (i + 1) * p.mul]  # (B, K, u)
                    w_id = W[:, :, i * d3 + dd]  # (B, K)
                    term = a_i * w_id[..., None]
                    C_p = term if C_p is None else C_p + term
                segs.append(C_p)
            d_segs.append(
                segs[0] if len(segs) == 1 else jnp.concatenate(segs, -1)
            )
        C_all = (
            d_segs[0] if d3 == 1 else jnp.concatenate(d_segs, -1)
        )  # (B, K, d3*fan)
        fan = spec.fan

        # one k-contraction for all d: p_h[b, h, dd*fan+u]
        p_h = jax.lax.dot_general(
            h, C_all,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(xp.dtype)  # (B, H, d3*fan)
        p_b = jax.lax.dot_general(
            mw, C_all,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(xp.dtype)  # (B, 1, d3*fan)

        for dd in range(d3):
            ph_d = p_h[:, :, dd * fan : (dd + 1) * fan]
            # out_h[b, w] = sum_{h,u} p_h[b, h, u] t[h, u, w]
            p_h_t = jnp.transpose(ph_d, (1, 0, 2))  # (H, B, fan)
            r = jax.lax.dot_general(
                p_h_t, t_k,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (H, B, mul)
            out_h = jnp.sum(r, axis=0)  # (B, mul)
            out_b = jax.lax.dot_general(
                p_b[:, 0, dd * fan : (dd + 1) * fan], b_k,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (B, mul)
            off = spec.out_off + dd * spec.mul_out
            out_ref[:, off : off + spec.mul_out] = (
                (out_h + out_b) * inv
            ).astype(out_ref.dtype)


def factored_tp_messages_pallas(
    tp,
    x_nbr: jnp.ndarray,  # (N, K, F_in)
    edge_sh: jnp.ndarray,  # (N, K, J)
    h: jnp.ndarray,  # (N, K, H), pre-scaled by mask*edge_weight
    mw: jnp.ndarray,  # (N, K)
    out_kernel: jnp.ndarray,  # (H, weight_numel)
    out_bias: jnp.ndarray,  # (weight_numel,)
    block_rows: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Summed messages (N, dim_out), drop-in for the einsum reduction."""
    specs, cg_all, xp_dim, out_dim = build_specs(tp)
    N, K, _ = x_nbr.shape
    H = h.shape[-1]
    dt = x_nbr.dtype

    xp = pack_neighbors(tp, specs, x_nbr)

    t_list, b_list = [], []
    off = 0
    for s in specs:
        fan, mul = s.fan, s.mul_out
        t_list.append(
            out_kernel[:, off : off + fan * mul]
            .reshape(H, fan, mul).astype(dt)
        )
        b_list.append(
            out_bias[off : off + fan * mul].reshape(fan, mul).astype(dt)
        )
        off += fan * mul

    n_pad = (-N) % block_rows
    if n_pad:
        pad = lambda a: jnp.pad(a, [(0, n_pad)] + [(0, 0)] * (a.ndim - 1))
        xp, edge_sh, h, mw = map(pad, (xp, edge_sh, h, mw))
    Np = N + n_pad
    mw3 = mw[:, None, :]  # (Np, 1, K)

    grid = (Np // block_rows,)
    B = block_rows
    in_specs = [
        pl.BlockSpec((B, K, xp_dim), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, K, edge_sh.shape[-1]), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, K, H), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, 1, K), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(cg_all.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for t_k in t_list:
        in_specs.append(pl.BlockSpec(t_k.shape, lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    for b_k in b_list:
        in_specs.append(pl.BlockSpec(b_k.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(_kernel, specs, H, len(t_list))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, out_dim), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, edge_sh, h, mw3, jnp.asarray(cg_all), *t_list, *b_list)
    out = out[:N]

    # kernel emits each class as (d-major, w-minor); reorder to the e3nn
    # (w-major, d-minor) convention
    parts = []
    for s in specs:
        seg = out[:, s.out_off : s.out_off + s.mul_out * s.d3]
        if s.d3 > 1:
            seg = seg.reshape(N, s.d3, s.mul_out)
            seg = jnp.swapaxes(seg, -1, -2).reshape(N, s.mul_out * s.d3)
        parts.append(seg)
    return jnp.concatenate(parts, axis=-1)
