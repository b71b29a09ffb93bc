"""Real-basis Wigner 3j symbols, computed from scratch on the host.

The reference gets its Clebsch-Gordan machinery from e3nn; here we derive it:

1. complex-basis Wigner 3j via the Racah formula (exact with log-factorials
   for the small l <= 4 this model needs),
2. change of basis to real spherical harmonics (m ordered -l..l, so l=1 maps
   to (y, z, x), matching our closed-form SH in ``ops/spherical.py``),
3. the transformed tensor is purely real when l1+l2+l3 is even and purely
   imaginary when odd; take the nonvanishing part (fixed global phase).

The result is normalized like e3nn's ``o3.wigner_3j``: the invariant tensor
has unit Frobenius norm per (l1, l2, l3). Tensor-product layers multiply by
``sqrt(2*l3 + 1)`` for 'component' irrep normalization, reproducing e.g. the
1/sqrt(3) dot and 1/sqrt(2) cross couplings spelled out in the reference's
closed-form lmax=1 product (``models/tensor_layers.py:44-122``).
"""

from __future__ import annotations

import functools
import math

import numpy as np


@functools.lru_cache(maxsize=None)
def _logfact(n: int) -> float:
    return math.lgamma(n + 1)


def _wigner_3j_m(l1: int, l2: int, l3: int, m1: int, m2: int, m3: int) -> float:
    """Complex-basis Wigner 3j symbol via the Racah formula."""
    if m1 + m2 + m3 != 0:
        return 0.0
    if not (abs(l1 - l2) <= l3 <= l1 + l2):
        return 0.0
    if abs(m1) > l1 or abs(m2) > l2 or abs(m3) > l3:
        return 0.0

    t1 = l2 - m1 - l3
    t2 = l1 + m2 - l3
    t3 = l1 + l2 - l3
    t4 = l1 - m1
    t5 = l2 + m2
    tmin = max(0, t1, t2)
    tmax = min(t3, t4, t5)

    s = 0.0
    for t in range(tmin, tmax + 1):
        logden = (
            _logfact(t)
            + _logfact(t - t1)
            + _logfact(t - t2)
            + _logfact(t3 - t)
            + _logfact(t4 - t)
            + _logfact(t5 - t)
        )
        s += (-1.0) ** t * math.exp(-logden)

    lognum = 0.5 * (
        _logfact(l1 + l2 - l3)
        + _logfact(l1 - l2 + l3)
        + _logfact(-l1 + l2 + l3)
        - _logfact(l1 + l2 + l3 + 1)
        + _logfact(l1 + m1)
        + _logfact(l1 - m1)
        + _logfact(l2 + m2)
        + _logfact(l2 - m2)
        + _logfact(l3 + m3)
        + _logfact(l3 - m3)
    )
    return (-1.0) ** (l1 - l2 - m3) * math.exp(lognum) * s


@functools.lru_cache(maxsize=None)
def _complex_w3j(l1: int, l2: int, l3: int) -> np.ndarray:
    out = np.zeros((2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1))
    for m1 in range(-l1, l1 + 1):
        for m2 in range(-l2, l2 + 1):
            m3 = -m1 - m2
            if abs(m3) <= l3:
                out[m1 + l1, m2 + l2, m3 + l3] = _wigner_3j_m(l1, l2, l3, m1, m2, m3)
    return out


@functools.lru_cache(maxsize=None)
def _real_from_complex(l: int) -> np.ndarray:
    """U with Y_real[a] = sum_b U[a, b] Y_complex[b]; rows ordered m=-l..l.

    Complex SH use the Condon-Shortley convention. Real SH definition:
      m > 0:  (1/sqrt2) (Y_{l,-m} + (-1)^m Y_{l,m})
      m = 0:  Y_{l,0}
      m < 0:  (i/sqrt2) (Y_{l,m} - (-1)^m Y_{l,-m})
    """
    u = np.zeros((2 * l + 1, 2 * l + 1), dtype=complex)
    for m in range(-l, l + 1):
        a = m + l
        if m > 0:
            u[a, -m + l] = 1 / math.sqrt(2)
            u[a, m + l] = (-1) ** m / math.sqrt(2)
        elif m == 0:
            u[a, l] = 1.0
        else:
            u[a, m + l] = 1j / math.sqrt(2)
            u[a, -m + l] = -1j * (-1) ** m / math.sqrt(2)
    return u


@functools.lru_cache(maxsize=None)
def real_wigner_3j(l1: int, l2: int, l3: int) -> np.ndarray:
    """Real-basis invariant 3-tensor, unit Frobenius norm, float64.

    Zero tensor if the coupling is forbidden by the triangle rule.
    """
    if not (abs(l1 - l2) <= l3 <= l1 + l2):
        return np.zeros((2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1))
    c = _complex_w3j(l1, l2, l3).astype(complex)
    u1 = _real_from_complex(l1)
    u2 = _real_from_complex(l2)
    u3 = _real_from_complex(l3)
    # transform each complex index to the real basis (conjugate transform:
    # Y_c = U^H Y_r since U is unitary)
    t = np.einsum("abc,ia,jb,kc->ijk", c, u1.conj(), u2.conj(), u3.conj())
    re, im = np.real(t), np.imag(t)
    if np.abs(re).max() >= np.abs(im).max():
        assert np.abs(im).max() < 1e-10, (l1, l2, l3, np.abs(im).max())
        out = re
    else:
        assert np.abs(re).max() < 1e-10, (l1, l2, l3, np.abs(re).max())
        out = im
    # normalize Frobenius norm to 1 (matches e3nn's wigner_3j scaling) and fix
    # a deterministic global sign: first nonzero entry positive.
    norm = np.linalg.norm(out)
    if norm > 0:
        out = out / norm
        flat = out.reshape(-1)
        first = flat[np.argmax(np.abs(flat) > 1e-12)]
        if first < 0:
            out = -out
    return out
