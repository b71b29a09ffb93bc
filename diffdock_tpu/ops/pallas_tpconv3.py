"""Pallas TPU kernel, generation 3: fused p_h contraction (hybrid split).

Round-2 profiling (scripts/profile_bench.py, /tmp/k2*.log) showed:

* the XLA factored path runs at 94.75% of HBM roofline; its dominant
  traffic is the ``p_h`` (R, H, fan*d3) intermediate materialized between
  the neighbor-reduction einsum and the weight-application einsum
  (~8.7 GB of a rec-cross block's 15.2 GB at bench scale) — XLA cannot
  fuse across two dots;
* gen-2 (``pallas_tpconv2.py``), which moved the *coupling construction*
  into the kernel as well, lost to XLA (0.58-0.64x): building the coupled
  segments in-kernel needs hundreds of lane-misaligned (B, K, mul) slices
  and elementwise ops, which Mosaic executes as masked VPU ops.

Gen 3 splits the work where each compiler is strong:

* **XLA** computes the per-edge hidden activations ``h``, the gathered
  neighbors, and ONE merged coupled tensor
  ``coupled = concat_k coupled_k -> (R, K, F_tot)``
  (``ops/tensor_product.py:coupled_class_merged`` — small matmuls +
  elementwise, fused by XLA into lane-aligned stores);
* **Pallas** fuses the whole remaining contraction into two MXU dots per
  receiver tile, so ``p_h`` never touches HBM:

      P   = ht @ coupled            (B, He, F_tot)   [VMEM only]
      out = sum_h P[:,h,:] @ T3[h]  (B, W_tot)

  where ``T3`` is a single (He, F_tot, W_tot) block-diagonal weight tensor
  carrying the d3-identity expansion (``expand_weight_identity``
  semantics), the per-class 1/sqrt(fan) normalization, and the FC bias as
  hidden row H (its ``ht`` activation is the mask*edge_weight vector).
  W_tot = sum_k mul_k*d3_k is <= 128 for DiffDock-L-scale irreps, so the
  single merged weight dot wastes no lanes and the kernel's output is
  directly in e3nn (class-major, w-major, d-minor) layout.

Reference hot op: ``models/tensor_layers.py:125-231`` (tp + scatter).
Numerics: identical reassociation to ``models/tpconv.py:_tp_message_reduced``
(f32 accumulation inside each dot). The custom-VJP backward differentiates
the XLA einsum path, so training and inference share one entry point.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(ht_ref, c_ref, t_ref, out_ref):
    ht = ht_ref[:]  # (B, He, K) hidden rows (mask-scaled) + bias(mask) row
    coupled = c_ref[:]  # (B, K, F_tot)
    t3 = t_ref[:]  # (He, F_tot, W_tot)
    dt = ht.dtype

    # neighbor reduction for every class at once:
    # (B, He, K) x (B, K, F_tot) -> (B, He, F_tot)
    P = jax.lax.dot_general(
        ht, coupled,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)

    # weight application, batched over hidden rows; the He-sum collapses
    # hidden channels AND adds the bias row's contribution
    Pt = jnp.transpose(P, (1, 0, 2))  # (He, B, F_tot)
    R = jax.lax.dot_general(
        Pt, t3,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (He, B, W_tot) f32
    out_ref[:] = jnp.sum(R, axis=0)


def _pick_block_rows(K: int, He: int, f_tot: int, w_tot: int) -> int:
    """Receiver-tile size: the big transients are P/Pt at (B, He, F_pad);
    keep them + inputs within ~55 MB of the VMEM window."""
    f_pad = _round_up(f_tot, 128)
    per_row = 2 * K * (f_pad + He)  # coupled + ht, bf16
    per_row += He * f_pad * (4 + 2 + 2)  # P f32 + P bf16 + Pt bf16
    per_row += He * _round_up(w_tot, 128) * 4  # R f32
    b = max(8, int(55e6 // max(per_row, 1)))
    return int(min(256, 1 << int(math.floor(math.log2(b)))))


def _forward_pallas(tp, x_nbr, edge_sh, h, mw, out_kernel, out_bias,
                    block_rows=None, interpret=False):
    """Summed messages (N, dim_out) f32. ``h`` must already be scaled by
    mask*edge_weight (``_tp_message_reduced`` semantics)."""
    N, K, _ = x_nbr.shape
    H = h.shape[-1]
    dt = jnp.bfloat16 if x_nbr.dtype == jnp.bfloat16 else x_nbr.dtype

    # XLA side: merged coupled tensor over non-empty classes
    classes = []  # (k, offset, fan, d3, mul)
    coupled_parts = []
    for k, ((offset, fan, mul), ek) in enumerate(
        zip(tp.weight_slices(), tp.irreps_out)
    ):
        if fan == 0:
            continue
        classes.append((k, offset, fan, ek.ir.dim, mul))
        coupled_parts.append(
            tp.coupled_class_merged(k, x_nbr.astype(dt), edge_sh.astype(dt))
        )
    coupled = jnp.concatenate(coupled_parts, axis=-1).astype(dt)
    f_tot = coupled.shape[-1]

    # hidden + bias row, pre-transposed to (N, He, K)
    He = _round_up(H + 1, 16)
    h_aug = jnp.concatenate(
        [h.astype(dt), mw.astype(dt)[..., None]], axis=-1
    )  # (N, K, H+1)
    h_aug = jnp.pad(h_aug, ((0, 0), (0, 0), (0, He - H - 1)))
    ht = jnp.swapaxes(h_aug, -1, -2)  # (N, He, K)

    # one block-diagonal weight tensor (He, F_tot, W_tot): per class the
    # d3-identity expansion of T (rows 0..H-1) and the bias (row H), with
    # 1/sqrt(fan) folded in
    w_tot = sum(mul * d3 for _, _, _, d3, mul in classes)
    blocks = []
    f_off = w_off = 0
    for _, offset, fan, d3, mul in classes:
        t_k = out_kernel[:, offset : offset + fan * mul].reshape(H, fan, mul)
        b_k = out_bias[offset : offset + fan * mul].reshape(fan, mul)
        inv = 1.0 / math.sqrt(fan)
        tt = tp.expand_weight_identity(t_k, d3) * inv  # (H*fan*d3, mul*d3)
        bb = tp.expand_bias_identity(b_k, d3) * inv  # (fan*d3, mul*d3)
        blk = jnp.concatenate(
            [
                tt.reshape(H, fan * d3, mul * d3),
                bb[None],
                jnp.zeros((He - H - 1, fan * d3, mul * d3), tt.dtype),
            ],
            axis=0,
        )
        blocks.append(((f_off, w_off), blk))
        f_off += fan * d3
        w_off += mul * d3
    t3 = jnp.zeros((He, f_tot, w_tot), dt)
    for (fo, wo), blk in blocks:
        t3 = jax.lax.dynamic_update_slice(t3, blk.astype(dt), (0, fo, wo))

    B = block_rows or _pick_block_rows(K, He, f_tot, w_tot)
    n_pad = (-N) % B
    if n_pad:
        pad = lambda a: jnp.pad(a, [(0, n_pad)] + [(0, 0)] * (a.ndim - 1))
        ht, coupled = pad(ht), pad(coupled)
    Np = N + n_pad

    out = pl.pallas_call(
        _kernel,
        grid=(Np // B,),
        in_specs=[
            pl.BlockSpec((B, He, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, K, f_tot), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((He, f_tot, w_tot), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, w_tot), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Np, w_tot), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ht, coupled, t3)
    out = out[:N]

    # re-insert zero blocks for empty classes; kernel output is already in
    # e3nn (class-major, w-major, d-minor) order
    if len(classes) == len(tp.irreps_out):
        return out
    parts = []
    live = {k: i for i, (k, *_rest) in enumerate(classes)}
    w_offs = [0]
    for _, _, _, d3, mul in classes:
        w_offs.append(w_offs[-1] + mul * d3)
    for k, ek in enumerate(tp.irreps_out):
        if k in live:
            i = live[k]
            parts.append(out[:, w_offs[i] : w_offs[i + 1]])
        else:
            parts.append(jnp.zeros((N, ek.dim), out.dtype))
    return jnp.concatenate(parts, axis=-1)


def _forward_xla(tp, x_nbr, edge_sh, h, mw, out_kernel, out_bias):
    """The einsum reference path (``models/tpconv.py:_tp_message_reduced``
    semantics minus the FC): backward pass + numeric oracle in tests."""
    cd = h.dtype
    outs = []
    for k, ((offset, fan, mul), ek) in enumerate(
        zip(tp.weight_slices(), tp.irreps_out)
    ):
        if fan == 0:
            outs.append(jnp.zeros(h.shape[:1] + (ek.dim,), jnp.float32))
            continue
        d3 = ek.ir.dim
        coupled = tp.coupled_class_merged(k, x_nbr.astype(cd),
                                          edge_sh.astype(cd))
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


def make_fused_tp_messages(tp, interpret: bool = False, block_rows=None):
    """Fused factored TP messages with gradients.

    Returns ``f(x_nbr, edge_sh, h, mw, out_kernel, out_bias) -> (N, dim)``:
    forward = gen-3 Pallas kernel, backward = VJP of the XLA einsum path
    (numerically identical reassociation).
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
