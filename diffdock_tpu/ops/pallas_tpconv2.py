"""Pallas TPU kernel, generation 2: fused factored tensor-product messages.

The round-1 profile (scripts/profile_bench.py) showed the bench forward is
94% HBM-bandwidth-bound at 2.4% FLOP utilization, and that the dominant
traffic is the factored path's ``p_h`` intermediate — the (R, H, fan*d3)
f32 tensor between the neighbor reduction and the weight application
(~8.7 GB of a rec-cross block's 15.2 GB at bench scale). This kernel keeps
``p_h`` (and the coupled tensor) entirely in VMEM per tile of receivers,
cutting the block's HBM traffic to its inputs + outputs.

Design rules, from Mosaic lowering probes on the real v5e chip
(/tmp/mosaic_probe.py) and ablation of the first cut:

* every dot_general is in its natural layout — one leading batch dim,
  contraction over the lhs minor / rhs sublane dim — so Mosaic inserts no
  internal transposes. The hidden activations arrive pre-transposed
  ``(R, He, K)`` from the host (an XLA relayout, cheap in HBM).
* the FC bias is folded in as an extra hidden row whose activation is the
  mask*edge_weight vector, so the bias needs no separate contractions.
* per-class, all d3 components run in ONE batched dot by stacking the
  coupled segments along the (free) leading axis; coupled segments are
  never concatenated across d, keeping all lane offsets aligned.
* all spherical-harmonic/CG couplings for every (class, path) are one
  matmul against a single (J, cols) CG matrix.
* minor-dim merges and 2-contracting-dim dots do not lower; leading-dim
  merges/splits and (1,0,2) transposes do.

Reference hot op: ``models/tensor_layers.py:125-231`` (tp + scatter).
Gradients: ``make_factored_tp_messages`` carries a custom VJP whose
backward differentiates the XLA einsum path
(``models/tpconv.py:_tp_message_reduced`` semantics — the identical
reassociation), so training and inference share one entry point.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass(frozen=True)
class PathSpec2:
    xp_start: int  # slice start into the packed [path][i][u] input
    mul: int  # u
    d1: int  # i
    cg_col: int  # column offset into the (J, cols) CG matrix


@dataclasses.dataclass(frozen=True)
class ClassSpec2:
    fan: int
    d3: int
    mul_out: int
    out_off: int  # offset into the kernel output (d-major layout)
    paths: Tuple[PathSpec2, ...]


def build_specs2(tp):
    """Static metadata + one (J, cols) CG matrix covering every path: row j
    is the absolute spherical-harmonic index, so a single ``sh @ cg`` matmul
    produces all couplings."""
    J = tp.irreps_in2.dim
    specs: List[ClassSpec2] = []
    col = 0
    xp_off = 0
    out_off = 0
    blocks = []  # (row_start, cg_cols_matrix)
    for k, (pk, fan, ek) in enumerate(zip(tp.paths, tp.fan_in, tp.irreps_out)):
        d3 = ek.ir.dim
        paths = []
        for p in pk:
            e1 = tp.irreps_in1[p.i]
            cgm = p.cg.transpose(1, 0, 2).reshape(p.cg.shape[1], -1)
            paths.append(PathSpec2(
                xp_start=xp_off, mul=e1.mul, d1=e1.ir.dim, cg_col=col,
            ))
            blocks.append((tp._sl2[p.j].start, cgm))
            col += cgm.shape[1]
            xp_off += e1.ir.dim * e1.mul
        specs.append(ClassSpec2(fan=fan, d3=d3, mul_out=ek.mul,
                                out_off=out_off, paths=tuple(paths)))
        out_off += ek.mul * d3
    cg_full = np.zeros((J, max(col, 1)), np.float32)
    c = 0
    for row, b in blocks:
        cg_full[row : row + b.shape[0], c : c + b.shape[1]] = b
        c += b.shape[1]
    return tuple(specs), cg_full, xp_off, out_off


def pack_neighbors2(specs, sl1, x_nbr: jnp.ndarray) -> jnp.ndarray:
    """(..., K, F_in) -> (..., K, sum_p d1*u) with each path's features in
    [i][u] order (i outer), so the kernel slices (B, K, u) contiguously.
    ``sl1`` gives each path's slice into F_in (aligned with spec order)."""
    parts = []
    i = 0
    for spec in specs:
        for p in spec.paths:
            s = sl1[i]
            i += 1
            a = x_nbr[..., s]
            a = a.reshape(a.shape[:-1] + (p.mul, p.d1))
            parts.append(jnp.swapaxes(a, -1, -2).reshape(
                a.shape[:-2] + (p.d1 * p.mul,)
            ))
    return jnp.concatenate(parts, axis=-1)


def _input_slices(tp):
    out = []
    for pk in tp.paths:
        for p in pk:
            out.append(tp._sl1[p.i])
    return out


def _kernel(specs, n_t, *refs):
    (xp_ref, sh_ref, ht_ref, cg_ref), t_refs, (out_ref,) = (
        refs[:4], refs[4 : 4 + n_t], refs[-1:]
    )
    xp = xp_ref[:]  # (B, K, XP) bf16, pre-packed [path][i][u]
    sh = sh_ref[:]  # (B, K, J)
    ht = ht_ref[:]  # (B, He, K): hidden rows (mask-scaled) + bias(mask) row
    B, K, _ = xp.shape
    dt = xp.dtype

    # all CG couplings at once: (B*K, J) @ (J, cols)
    W_all = jax.lax.dot_general(
        sh.reshape(B * K, sh.shape[-1]), cg_ref[:].astype(dt),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt).reshape(B, K, -1)

    # replicated-ht stacks per distinct d3 (built once, shared by classes)
    ht_rep: Dict[int, jnp.ndarray] = {1: ht}

    def get_ht(d3):
        if d3 not in ht_rep:
            ht_rep[d3] = jnp.concatenate([ht] * d3, axis=0)
        return ht_rep[d3]

    for ci, spec in enumerate(specs):
        d3 = spec.d3
        t_k = t_refs[ci][:]  # (He, fan, mul) bf16; bias row folded in
        inv = 1.0 / math.sqrt(spec.fan)

        # coupled segments per d component, stacked along the leading axis
        segs = []
        for dd in range(d3):
            pieces = []
            for p in spec.paths:
                C_p = None
                for i in range(p.d1):
                    a_i = xp[:, :, p.xp_start + i * p.mul
                             : p.xp_start + (i + 1) * p.mul]  # (B, K, u)
                    w_id = W_all[:, :, p.cg_col + i * d3 + dd]  # (B, K)
                    term = a_i * w_id[..., None]
                    C_p = term if C_p is None else C_p + term
                pieces.append(C_p)
            segs.append(
                pieces[0] if len(pieces) == 1
                else jnp.concatenate(pieces, axis=-1)
            )
        seg = segs[0] if d3 == 1 else jnp.concatenate(segs, axis=0)

        # neighbor reduction, all d components at once: natural-layout
        # batched dot (d3*B, He, K) x (d3*B, K, fan) -> (d3*B, He, fan)
        P = jax.lax.dot_general(
            get_ht(d3), seg,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dt)

        # weight application: one He-batched matmul; the He-sum then
        # collapses hidden channels AND adds the bias row
        Pt = jnp.transpose(P, (1, 0, 2))  # (He, d3*B, fan)
        R = jax.lax.dot_general(
            Pt, t_k,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (He, d3*B, mul) f32
        res = (jnp.sum(R, axis=0) * inv).astype(out_ref.dtype)

        for dd in range(d3):
            off = spec.out_off + dd * spec.mul_out
            out_ref[:, off : off + spec.mul_out] = (
                res[dd * B : (dd + 1) * B]
            )


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _pick_block_rows(K: int, xp_dim: int, J: int, He: int) -> int:
    """Receiver-tile size: transients scale with B*K and B*He; keep the
    largest per-class buffers (P/Pt/R at fan-lane padding 128) within a
    ~40 MB budget of the 100 MB VMEM window."""
    per_row = (3 * K * 128 + 3 * 3 * He * 128 * 2 + K * (xp_dim + J)) * 2
    b = max(8, int(40e6 // max(per_row, 1)))
    return int(min(128, 1 << int(math.floor(math.log2(b)))))


def _forward_pallas(tp, x_nbr, edge_sh, h, mw, out_kernel, out_bias,
                    block_rows=None, interpret=False):
    """Summed messages (N, dim_out). ``h`` must already be scaled by
    mask*edge_weight (as in ``_tp_message_reduced``)."""
    specs, cg_full, xp_dim, out_dim = build_specs2(tp)
    N, K, _ = x_nbr.shape
    H = h.shape[-1]
    dt = jnp.bfloat16 if x_nbr.dtype == jnp.bfloat16 else x_nbr.dtype

    xp = pack_neighbors2(specs, _input_slices(tp), x_nbr).astype(dt)
    edge_sh = edge_sh.astype(dt)

    # hidden + bias row, pre-transposed to (N, He, K)
    He = _round_up(H + 1, 16)
    h_aug = jnp.concatenate(
        [h.astype(dt), mw.astype(dt)[..., None]], axis=-1
    )  # (N, K, H+1)
    h_aug = jnp.pad(h_aug, ((0, 0), (0, 0), (0, He - H - 1)))
    ht = jnp.swapaxes(h_aug, -1, -2)  # (N, He, K)

    # per-class weights with the bias as row H (zeros padding above)
    t_list = []
    off = 0
    for s in specs:
        fan, mul = s.fan, s.mul_out
        t_k = out_kernel[:, off : off + fan * mul].reshape(H, fan, mul)
        b_k = out_bias[off : off + fan * mul].reshape(1, fan, mul)
        pad = jnp.zeros((He - H - 1, fan, mul), t_k.dtype)
        t_list.append(jnp.concatenate([t_k, b_k, pad], axis=0).astype(dt))
        off += fan * mul

    B = block_rows or _pick_block_rows(K, xp_dim, edge_sh.shape[-1], He)
    n_pad = (-N) % B
    if n_pad:
        pad = lambda a: jnp.pad(a, [(0, n_pad)] + [(0, 0)] * (a.ndim - 1))
        xp, edge_sh, ht = map(pad, (xp, edge_sh, ht))
    Np = N + n_pad

    grid = (Np // B,)
    in_specs = [
        pl.BlockSpec((B, K, xp_dim), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, K, edge_sh.shape[-1]), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((B, He, K), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(cg_full.shape, lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for t_k in t_list:
        in_specs.append(pl.BlockSpec(t_k.shape, lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))

    kernel = functools.partial(_kernel, specs, len(t_list))
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
    )(xp, edge_sh, ht, jnp.asarray(cg_full), *t_list)
    out = out[:N]

    # kernel emits each class (d-major, w-minor); reorder to the e3nn
    # (w-major, d-minor) convention
    parts = []
    for s in specs:
        seg = out[:, s.out_off : s.out_off + s.mul_out * s.d3]
        if s.d3 > 1:
            seg = seg.reshape(N, s.d3, s.mul_out)
            seg = jnp.swapaxes(seg, -1, -2).reshape(N, s.mul_out * s.d3)
        parts.append(seg)
    return jnp.concatenate(parts, axis=-1)


def _forward_xla(tp, x_nbr, edge_sh, h, mw, out_kernel, out_bias):
    """The einsum reference path (semantics of
    ``models/tpconv.py:_tp_message_reduced`` minus the FC): used for the
    backward pass and as the numeric oracle in tests."""
    cd = h.dtype
    outs = []
    for k, ((offset, fan, mul), ek) in enumerate(
        zip(tp.weight_slices(), tp.irreps_out)
    ):
        d3 = ek.ir.dim
        coupled = tp.coupled_class_merged(k, x_nbr, edge_sh)
        p_h = jnp.einsum("rkh,rkF->rhF", h, coupled,
                         preferred_element_type=jnp.float32)
        p_b = jnp.einsum("rk,rkF->rF", mw.astype(cd), coupled,
                         preferred_element_type=jnp.float32)
        t_k = out_kernel[:, offset : offset + fan * mul].reshape(
            out_kernel.shape[0], fan, mul
        )
        b_k = out_bias[offset : offset + fan * mul].reshape(fan, mul)
        tt = tp.expand_weight_identity(t_k.astype(cd), d3)
        bb = tp.expand_bias_identity(b_k.astype(cd), d3)
        H = h.shape[-1]
        out_k = (
            jnp.einsum(
                "rG,GW->rW",
                p_h.astype(cd).reshape(p_h.shape[0], H * fan * d3), tt,
                preferred_element_type=jnp.float32,
            )
            + jnp.einsum("rF,FW->rW", p_b.astype(cd), bb,
                         preferred_element_type=jnp.float32)
        ) / jnp.sqrt(jnp.asarray(fan, jnp.float32))
        outs.append(out_k)
    return jnp.concatenate(outs, axis=-1).astype(jnp.float32)


def make_factored_tp_messages(tp, interpret: bool = False,
                              block_rows=None):
    """Fused factored TP messages with gradients.

    Returns ``f(x_nbr, edge_sh, h, mw, out_kernel, out_bias) -> (N, dim)``
    where the forward runs the Pallas kernel and the backward differentiates
    the XLA reference path (numerically identical reassociation).
    """

    @jax.custom_vjp
    def f(x_nbr, edge_sh, h, mw, out_kernel, out_bias):
        return _forward_pallas(tp, x_nbr, edge_sh, h, mw,
                               out_kernel, out_bias,
                               block_rows=block_rows, interpret=interpret)

    def fwd(x_nbr, edge_sh, h, mw, out_kernel, out_bias):
        return f(x_nbr, edge_sh, h, mw, out_kernel, out_bias), (
            x_nbr, edge_sh, h, mw, out_kernel, out_bias
        )

    def bwd(res, g):
        _, vjp = jax.vjp(lambda *a: _forward_xla(tp, *a), *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f
