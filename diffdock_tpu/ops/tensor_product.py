"""Clebsch-Gordan tensor products over fixed irrep layouts.

The compute core of the whole framework: replaces e3nn's
``o3.FullyConnectedTensorProduct`` (reference ``models/tensor_layers.py:307``)
and ``o3.FullTensorProduct`` (``models/cg_model.py:240``) with explicit
einsums over precomputed real Wigner-3j constants. Everything is shape-static
and trace-friendly; XLA fuses the small contractions into the surrounding
gather/reduce, and a Pallas kernel can later consume the same path metadata.

Normalization follows e3nn defaults so the reference's closed-form lmax=1
product (``FasterTensorProduct``, ``tensor_layers.py:44-122``) is a golden
test: 'component' irrep normalization (CG scaled by sqrt(2*l_out+1)) and
'element' path normalization (concatenated per-output weights divided by
sqrt(fan_in)).

Weight layout: flat, grouped by output entry (in irreps_out order), within a
group ordered by (in1 entry, in2 entry); each block is (fan_in_k, mul_out_k)
row-major. ``weight_layout()`` exposes this for checkpoint converters.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from diffdock_tpu.ops.irreps import Irrep, Irreps, MulIrrep
from diffdock_tpu.ops.wigner import real_wigner_3j


class _Path(NamedTuple):
    i: int  # index into irreps_in1
    j: int  # index into irreps_in2
    cg: np.ndarray  # (d1, d2, d3) including component normalization


def _reshape_entry(x: jnp.ndarray, irreps: Irreps, idx: int, sl: slice) -> jnp.ndarray:
    e = irreps[idx]
    return x[..., sl].reshape(x.shape[:-1] + (e.mul, e.ir.dim))


class FullyConnectedTensorProduct:
    """Weighted TP with externally supplied per-example weights.

    Usage::

        tp = FullyConnectedTensorProduct("16x0e + 4x1o", "0e + 1o + 2e",
                                         "16x0e + 4x1o + 4x1e")
        out = tp(x1, x2, weights)   # weights: (..., tp.weight_numel)
    """

    def __init__(self, irreps_in1, irreps_in2, irreps_out):
        self.irreps_in1 = Irreps(irreps_in1)
        self.irreps_in2 = Irreps(irreps_in2)
        self.irreps_out = Irreps(irreps_out)

        self._sl1 = self.irreps_in1.slices()
        self._sl2 = self.irreps_in2.slices()
        self._sl_out = self.irreps_out.slices()

        self.paths: List[List[_Path]] = []
        self.fan_in: List[int] = []
        for k, ek in enumerate(self.irreps_out):
            paths_k: List[_Path] = []
            fan = 0
            for i, e1 in enumerate(self.irreps_in1):
                for j, e2 in enumerate(self.irreps_in2):
                    if ek.ir in e1.ir * e2.ir:
                        cg = real_wigner_3j(e1.ir.l, e2.ir.l, ek.ir.l)
                        cg = cg * math.sqrt(ek.ir.dim)  # component normalization
                        paths_k.append(_Path(i, j, cg.astype(np.float32)))
                        fan += e1.mul * e2.mul
            self.paths.append(paths_k)
            self.fan_in.append(fan)

        self.weight_numel = sum(
            fan * ek.mul for fan, ek in zip(self.fan_in, self.irreps_out)
        )

    def weight_layout(self) -> List[Tuple[int, List[Tuple[int, int]], int, int]]:
        """[(out_entry, [(in1_entry, in2_entry), ...], fan_in, mul_out), ...]"""
        return [
            (k, [(p.i, p.j) for p in pk], fan, ek.mul)
            for k, (pk, fan, ek) in enumerate(
                zip(self.paths, self.fan_in, self.irreps_out)
            )
        ]

    def coupled_class(
        self, k: int, x1: jnp.ndarray, x2: jnp.ndarray
    ) -> jnp.ndarray:
        """The weight-independent coupled tensor for output entry ``k``:
        (..., fan_k, d3). The weighted TP is the linear contraction
        ``einsum('...uk,...uw->...wk', coupled, W_k / sqrt(fan_k))`` — this
        factorization is what lets conv layers reduce over neighbors BEFORE
        applying weights (see ``models/tpconv.py``)."""
        ek = self.irreps_out[k]
        segs = []
        for p in self.paths[k]:
            a = _reshape_entry(x1, self.irreps_in1, p.i, self._sl1[p.i])
            b = _reshape_entry(x2, self.irreps_in2, p.j, self._sl2[p.j])
            cg = jnp.asarray(p.cg, dtype=x1.dtype)
            seg = jnp.einsum("...ui,...vj,ijk->...uvk", a, b, cg)
            segs.append(seg.reshape(seg.shape[:-3] + (-1, ek.ir.dim)))
        return jnp.concatenate(segs, axis=-2)

    def coupled_class_merged(
        self, k: int, x1: jnp.ndarray, x2: jnp.ndarray
    ) -> jnp.ndarray:
        """Like :meth:`coupled_class` but returns (..., fan_k * d3) with the
        (fan, d3) axes merged, produced TPU-layout-friendly.

        Rationale (v5e profile): materializing (..., fan, d3) with d3 in
        {3, 5} as the minor axis forces 17-57x tile-padding expansions in
        HBM (bf16 tiles are (16, 128)); the merged form pads at most
        128/(fan*d3). The CG contraction is restructured as one matmul
        against a static (sh_dim, i*d3) matrix per path followed by an
        unrolled elementwise accumulation over i, which XLA fuses into the
        consumer's operand buffer instead of emitting transposed copies.
        """
        ek = self.irreps_out[k]
        d3 = ek.ir.dim
        segs = []
        for p in self.paths[k]:
            e1 = self.irreps_in1[p.i]
            a = _reshape_entry(x1, self.irreps_in1, p.i, self._sl1[p.i])
            sh = x2[..., self._sl2[p.j]]  # (..., J) — edge sh entries have mul 1
            d1, d2 = e1.ir.dim, sh.shape[-1]
            # W[..., i*d3] = sum_j sh_j * cg[i, j, d]
            cgm = jnp.asarray(
                p.cg.transpose(1, 0, 2).reshape(d2, d1 * d3), dtype=x1.dtype
            )
            W = sh @ cgm  # (..., i*d3)
            # C[..., u, d] = sum_i a[..., u, i] * W[..., i, d], unrolled over i
            C = None
            for i_idx in range(d1):
                term = (
                    a[..., :, i_idx, None]
                    * W[..., None, i_idx * d3 : (i_idx + 1) * d3]
                )
                C = term if C is None else C + term
            segs.append(C.reshape(C.shape[:-2] + (e1.mul * d3,)))
        return jnp.concatenate(segs, axis=-1)

    @staticmethod
    def expand_weight_identity(t: jnp.ndarray, d3: int) -> jnp.ndarray:
        """(H, fan, mul) weights -> (H * fan * d3, mul * d3) with an identity
        over the d3 components: lets the (h, fan) contraction against a
        merged (..., fan*d3) operand run as ONE clean matmul."""
        H, fan, mul = t.shape
        eye = jnp.eye(d3, dtype=t.dtype)
        tt = jnp.einsum("huw,de->hudwe", t, eye)
        return tt.reshape(H * fan * d3, mul * d3)

    @staticmethod
    def expand_bias_identity(b: jnp.ndarray, d3: int) -> jnp.ndarray:
        """(fan, mul) -> (fan * d3, mul * d3), identity over d3."""
        fan, mul = b.shape
        eye = jnp.eye(d3, dtype=b.dtype)
        bb = jnp.einsum("uw,de->udwe", b, eye)
        return bb.reshape(fan * d3, mul * d3)

    def weight_slices(self):
        """Per-output-entry (offset, fan, mul) into the flat weight vector."""
        out, offset = [], 0
        for k, ek in enumerate(self.irreps_out):
            fan = self.fan_in[k]
            out.append((offset, fan, ek.mul))
            offset += fan * ek.mul
        return out

    def __call__(
        self, x1: jnp.ndarray, x2: jnp.ndarray, weights: jnp.ndarray
    ) -> jnp.ndarray:
        """x1 (..., dim_in1), x2 (..., dim_in2), weights (..., weight_numel)
        -> (..., dim_out). Leading dims must broadcast elementwise."""
        outs = []
        offset = 0
        for k, ek in enumerate(self.irreps_out):
            pk, fan = self.paths[k], self.fan_in[k]
            if not pk or fan == 0:
                outs.append(
                    jnp.zeros(
                        jnp.broadcast_shapes(x1.shape[:-1], weights.shape[:-1])
                        + (ek.dim,),
                        dtype=x1.dtype,
                    )
                )
                continue
            segs = []
            for p in pk:
                a = _reshape_entry(x1, self.irreps_in1, p.i, self._sl1[p.i])
                b = _reshape_entry(x2, self.irreps_in2, p.j, self._sl2[p.j])
                cg = jnp.asarray(p.cg, dtype=x1.dtype)
                seg = jnp.einsum("...ui,...vj,ijk->...uvk", a, b, cg)
                segs.append(seg.reshape(seg.shape[:-3] + (-1, ek.ir.dim)))
            coupled = jnp.concatenate(segs, axis=-2)  # (..., fan, d3)
            nweights = fan * ek.mul
            w = weights[..., offset : offset + nweights]
            w = w.reshape(w.shape[:-1] + (fan, ek.mul)) / math.sqrt(fan)
            offset += nweights
            out_k = jnp.einsum("...uk,...uw->...wk", coupled, w)
            outs.append(out_k.reshape(out_k.shape[:-2] + (ek.dim,)))
        assert offset == self.weight_numel
        return jnp.concatenate(outs, axis=-1)


class DepthwiseTensorProduct:
    """'uvu' depthwise TP (reference depthwise conv variant,
    ``models/tensor_layers.py:248-292``): each input channel couples with
    the edge harmonics independently (one weight per channel per path, no
    cross-channel mixing — that happens in a following
    :class:`diffdock_tpu.ops.linear.IrrepsLinear`).

    ``irreps_out`` filters which output irrep TYPES are kept; the actual
    output layout is ``irreps_mid`` (multiplicities preserved from in1,
    sorted by output irrep like e3nn's ``irreps_mid.sort()``).
    """

    def __init__(self, irreps_in1, irreps_in2, irreps_out):
        self.irreps_in1 = Irreps(irreps_in1)
        self.irreps_in2 = Irreps(irreps_in2)
        keep = {(e.ir.l, e.ir.p) for e in Irreps(irreps_out)}
        self._sl1 = self.irreps_in1.slices()
        self._sl2 = self.irreps_in2.slices()

        paths = []  # (i, j, ir3, cg)
        for i, e1 in enumerate(self.irreps_in1):
            for j, e2 in enumerate(self.irreps_in2):
                for ir3 in e1.ir * e2.ir:
                    if (ir3.l, ir3.p) in keep:
                        cg = real_wigner_3j(e1.ir.l, e2.ir.l, ir3.l)
                        cg = cg * math.sqrt(ir3.dim)
                        paths.append((i, j, ir3, cg.astype(np.float32)))
        # e3nn sorts irreps_mid by output irrep; keep a stable sort so the
        # weight layout is reproducible
        order = sorted(range(len(paths)),
                       key=lambda k: (paths[k][2].l, paths[k][2].p, k))
        self.paths = [paths[k] for k in order]
        self.irreps_mid = Irreps(
            [MulIrrep(self.irreps_in1[i].mul, ir3)
             for i, _, ir3, _ in self.paths]
        )
        self.weight_numel = sum(self.irreps_in1[i].mul
                                for i, _, _, _ in self.paths)

    def __call__(
        self, x1: jnp.ndarray, x2: jnp.ndarray, weights: jnp.ndarray
    ) -> jnp.ndarray:
        """x1 (..., dim_in1), x2 (..., dim_in2), weights
        (..., weight_numel) -> (..., irreps_mid.dim)."""
        outs = []
        off = 0
        for i, j, ir3, cg in self.paths:
            e1 = self.irreps_in1[i]
            a = _reshape_entry(x1, self.irreps_in1, i, self._sl1[i])
            b = _reshape_entry(x2, self.irreps_in2, j, self._sl2[j])
            seg = jnp.einsum(
                "...ui,...vj,ijk->...uk", a, b,
                jnp.asarray(cg, dtype=x1.dtype),
            )  # 'uvu': v has mul 1 for sh inputs
            w = weights[..., off : off + e1.mul]
            off += e1.mul
            seg = seg * w[..., None]
            outs.append(seg.reshape(seg.shape[:-2] + (e1.mul * ir3.dim,)))
        assert off == self.weight_numel
        return jnp.concatenate(outs, axis=-1)


class FullTensorProduct:
    """Unweighted full TP: every coupling, multiplicities multiply.

    Matches e3nn ``o3.FullTensorProduct`` semantics with component
    normalization; output entries are ordered (in1-major, in2, then l_out) —
    our canonical order, exposed via ``irreps_out``.
    """

    def __init__(self, irreps_in1, irreps_in2):
        self.irreps_in1 = Irreps(irreps_in1)
        self.irreps_in2 = Irreps(irreps_in2)
        self._sl1 = self.irreps_in1.slices()
        self._sl2 = self.irreps_in2.slices()

        out_entries = []
        self._prods: List[Tuple[int, int, Irrep, np.ndarray]] = []
        for i, e1 in enumerate(self.irreps_in1):
            for j, e2 in enumerate(self.irreps_in2):
                for ir3 in e1.ir * e2.ir:
                    cg = real_wigner_3j(e1.ir.l, e2.ir.l, ir3.l) * math.sqrt(ir3.dim)
                    self._prods.append((i, j, ir3, cg.astype(np.float32)))
                    out_entries.append(MulIrrep(e1.mul * e2.mul, ir3))
        self.irreps_out = Irreps(out_entries)

    def __call__(self, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
        outs = []
        for i, j, ir3, cg in self._prods:
            a = _reshape_entry(x1, self.irreps_in1, i, self._sl1[i])
            b = _reshape_entry(x2, self.irreps_in2, j, self._sl2[j])
            seg = jnp.einsum(
                "...ui,...vj,ijk->...uvk", a, b, jnp.asarray(cg, dtype=x1.dtype)
            )
            outs.append(seg.reshape(seg.shape[:-3] + (-1,)))
        return jnp.concatenate(outs, axis=-1)
