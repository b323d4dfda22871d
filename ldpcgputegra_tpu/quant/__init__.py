"""Fixed-point LLR quantization (reference component C4).

Reproduces the observable semantics of the reference conversion stage
``code/x86/CFixPointConversion/CFastFixConversion.cpp:54-67``: float channel
LLRs are scaled by ``FACTEUR_BETA`` (default 8 = ``1 << (NB_BITS_MESSAGES/2)``,
``code/ldpc_decoder_arm/main.cpp:52``), truncated toward zero (C int cast),
and clamped to the LLR saturation range (default ±31 for 6-bit LLRs,
``constantes_sse.h:43-49``), yielding int8 storage.

The GPU channel fuses this into noise generation
(``CChanel_AWGN_SIMD.cu:17-25``: ``(char)fminf(fmaxf(8*v,-31),31)``); the
same `QuantSpec` drives both paths here.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

__all__ = ["QuantSpec", "quantize_llr", "dequantize_llr"]


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """LLR fixed-point format.

    ``factor``: scale applied before truncation (FACTEUR_BETA).
    ``bits_llr``: quantizer bit width; saturation = 2**(bits_llr-1) - 1.
    """

    factor: int = 8
    bits_llr: int = 6

    @property
    def sat(self) -> int:
        return (1 << (self.bits_llr - 1)) - 1


def quantize_llr(
    x: jnp.ndarray, spec: QuantSpec = QuantSpec(), factor=None
) -> jnp.ndarray:
    """float LLRs -> int8, trunc-toward-zero + saturate (CFastFixConversion).

    C semantics: ``value = (int)(factor * x)`` truncates toward zero, then
    clamps to [-sat, sat].  XLA's float->int convert also rounds toward zero,
    so a plain cast after clamping reproduces it bit-exactly.

    ``factor`` (may be a traced scalar) overrides ``spec.factor`` — used by
    the adaptive-quantizer channel mode without recompilation per SNR.
    """
    f = float(spec.factor) if factor is None else factor
    v = jnp.clip(x * f, -float(spec.sat), float(spec.sat))
    return v.astype(jnp.int8)


def optimal_llr_factor(sigma: float, spec: QuantSpec = QuantSpec()) -> float:
    """Adaptive quantizer scale (the reference's -ollr idea: its
    COptimFixConversion maps the channel's dynamic range R = 1 + qbeta
    onto the saturation point; the implementation is commented out at
    ``code/ldpc_decoder_arm/main.cpp:402-410``, so the capability is
    re-derived here): scale so that |y| <= 1 + k*sigma maps onto the full
    quantizer range, with k the Gaussian quantile covering all but
    2^(1-bits) of the noise mass."""
    from statistics import NormalDist

    tail = 2.0 ** (1 - spec.bits_llr)
    k = NormalDist().inv_cdf(1.0 - tail / 2.0)
    return spec.sat / (1.0 + k * sigma)


def dequantize_llr(q: jnp.ndarray, spec: QuantSpec = QuantSpec()) -> jnp.ndarray:
    """int8 fixed-point LLRs -> float (inverse scale; lossy)."""
    return q.astype(jnp.float32) / float(spec.factor)


def llr_histogram(q, spec: QuantSpec = QuantSpec()) -> dict[int, float]:
    """Occupancy histogram of quantized LLRs, as percentages.

    Equivalent of the reference's ``-histo`` dump
    (``CFastFixConversion.cpp:31-47``, the "(HISTO)" lines): quantizer
    health check — a healthy channel uses the full +/-sat range without
    piling everything on the saturation rails.
    """
    import numpy as np

    q = np.asarray(q).ravel()
    vals, counts = np.unique(q, return_counts=True)
    total = q.size
    return {int(v): 100.0 * c / total for v, c in zip(vals, counts)}


def print_llr_histogram(q, spec: QuantSpec = QuantSpec()) -> None:
    h = llr_histogram(q, spec)
    print("(HISTO) START")
    for v in range(-spec.sat - 1, spec.sat + 2):
        if v in h:
            print(f"(HISTO) {v:4d}\t{h[v]:f}")
    print("(HISTO) STOP")
