"""Decoder API + factory (reference L3: ``CGPUDecoder``/``CreateDecoder``).

``make_decoder`` replaces the reference's (type, arch, format) dispatch
(``code/x86/CDecoder/DecoderLibrary.h:44-137``; string-keyed ``new`` chains
in ``code/gpu_fixed/main.cpp:212-228``) with backend selection:

* ``pallas`` — the fused single-kernel TPU path (QC codes on TPU devices);
* ``xla``    — the gather/roll XLA path (any code, any backend);
* ``auto``   — pallas when supported on the current backend, else xla.

All backends share ``LayeredSpec`` and return the same
``decode(llr[B, N] int8) -> (bits[B, N] uint8, iters_used)`` contract.
"""

from __future__ import annotations

from typing import Optional

import jax

from ..codes.code import LdpcCode
from ..ops.layered import LayeredSpec, make_layered_decoder

__all__ = ["make_decoder", "LayeredSpec", "backend_for"]


def _on_tpu() -> bool:
    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return False
    kind = (getattr(dev, "device_kind", "") or "").lower()
    return dev.platform in ("tpu", "axon") or "tpu" in kind


def backend_for(code: LdpcCode, spec: LayeredSpec, backend: str = "auto") -> str:
    from ..kernels import pallas_supported

    if backend == "auto":
        return "pallas" if (pallas_supported(code, spec) and _on_tpu()) else "xla"
    return backend


def make_decoder(
    code: LdpcCode,
    spec: LayeredSpec = LayeredSpec(),
    backend: str = "auto",
    batch_tile: Optional[int] = None,
    interpret: bool = False,
):
    resolved = backend_for(code, spec, backend)
    if resolved == "pallas":
        from ..kernels import make_pallas_decoder

        return make_pallas_decoder(
            code, spec, batch_tile=batch_tile, interpret=interpret
        )
    if resolved == "xla":
        return make_layered_decoder(code, spec)
    raise ValueError(f"unknown backend {backend!r}")
