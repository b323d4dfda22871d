"""Decoder API + factory (reference L3: ``CGPUDecoder``/``CreateDecoder``).

``make_decoder`` replaces the reference's (type, arch, format) dispatch
(``code/x86/CDecoder/DecoderLibrary.h:44-137``; string-keyed ``new`` chains
in ``code/gpu_fixed/main.cpp:212-228``) with backend selection:

* ``pallas`` — the fused single-kernel TPU path (QC codes on TPU devices);
* ``pallas-streamed`` — HBM-streamed messages (QC codes beyond VMEM);
* ``pallas-gather``   — fused static-gather kernel (non-QC codes, colored
  schedule, ``kernels/pallas_gather.py``);
* ``xla``    — the gather/roll XLA path (any code, any backend);
* ``auto``   — the best supported Pallas variant on TPU, else xla.

Staircase (DVB-S2-family) codes are transparently replaced by their Z=360
QC view (``codes.dvbs2.to_qc_form``) so they hit the fast roll/Pallas
paths; the view handles the column permutation internally, so callers see
the original column order.

All backends share ``LayeredSpec`` and return the same
``decode(llr[B, N] int8) -> (bits[B, N] uint8, iters_used)`` contract.
"""

from __future__ import annotations

from typing import Optional

import jax

from ..codes.code import LdpcCode
from ..ops.layered import LayeredSpec, make_layered_decoder

__all__ = ["make_decoder", "LayeredSpec", "backend_for", "effective_code"]

_qc_view_cache: dict[str, Optional[LdpcCode]] = {}


def _on_tpu() -> bool:
    try:
        dev = jax.devices()[0]
    except RuntimeError:
        return False
    kind = (getattr(dev, "device_kind", "") or "").lower()
    return dev.platform in ("tpu", "axon") or "tpu" in kind


def effective_code(code: LdpcCode) -> LdpcCode:
    """The code actually decoded: the QC view for staircase codes."""
    if code.Z is not None or code.col_perm is not None:
        return code
    if code.name not in _qc_view_cache:
        from ..codes.dvbs2 import is_staircase, to_qc_form

        view = None
        if is_staircase(code):
            try:
                view = to_qc_form(code)
            except ValueError:
                view = None
        _qc_view_cache[code.name] = view
    return _qc_view_cache[code.name] or code


def _pallas_fits(code: LdpcCode, early_term: bool = False) -> bool:
    from ..kernels.pallas_layered import pick_batch_tile, vmem_per_lane

    tb = pick_batch_tile(code, early_term=early_term)
    return tb * vmem_per_lane(code, early_term) <= (100 << 20)


# Gather compile ceiling, measured on the v5e remote compile service
# (benchmarks/COMPILE.md): the unrolled kernel emits one VREG load +
# store per edge; it compiles for 4000x2000 (12000 edges, ~68 s) but
# crashes the Mosaic backend for 8000x4000 (24000 edges, HTTP 500).
# The chunked kernel has NO edge-count ceiling: its Mosaic op count is
# constant (fori_loop body of one chunk) and since round 4 its index
# table streams from HBM through a fixed ~16 KB SMEM group buffer (the
# round-3 scalar-prefetch design put the whole table in SMEM, which
# crashed the compile service beyond ~96 KB); its only limit is VMEM.
_UNROLL_EDGE_MAX = 16000


def _gather_fits(code: LdpcCode, spec: LayeredSpec) -> bool:
    from ..kernels.pallas_gather import pick_sublanes

    return code.M <= _UNROLL_EDGE_MAX and pick_sublanes(code, spec) != 0


def _gather_chunked_fits(code: LdpcCode, spec: LayeredSpec) -> bool:
    from ..kernels.pallas_gather import pick_sublanes

    return pick_sublanes(code, spec, chunked=True) != 0


def backend_for(code: LdpcCode, spec: LayeredSpec, backend: str = "auto") -> str:
    from ..kernels import pallas_supported
    from ..kernels.pallas_gather import gather_supported

    code = effective_code(code)
    if backend == "auto":
        if _on_tpu():
            if pallas_supported(code, spec):
                return ("pallas" if _pallas_fits(code, spec.early_term)
                        else "pallas-streamed")
            if gather_supported(code, spec):
                # chunked FIRST: it measured faster than the unrolled
                # kernel even where both compile (4000x2000 on silicon,
                # round 4: 3494 vs 2740 Mbps — the compact fori_loop body
                # schedules better than a 24k-op unroll), compiles in
                # seconds instead of minutes, and is the only variant
                # with no edge-count compile ceiling
                if _gather_chunked_fits(code, spec):
                    return "pallas-gather-chunked"
                if _gather_fits(code, spec):
                    return "pallas-gather"
        return "xla"
    return backend


def make_decoder(
    code: LdpcCode,
    spec: LayeredSpec = LayeredSpec(),
    backend: str = "auto",
    batch_tile: Optional[int] = None,
    interpret: bool = False,
    emit_mask: bool = False,
):
    """``emit_mask=True`` makes the decoder return a third value,
    ``ok[B] bool`` (per-frame TRUE syndrome of the output bits) — the
    phase-1 interface of two-phase ET.  The fused Pallas QC kernel
    computes it in-kernel (~3 VPU ops/edge, once); every other backend
    gets a fused syndrome check appended inside one jitted call (one
    dispatch, no extra host traffic)."""
    orig_code = code
    if spec.schedule == "flooding":
        # Flooding works on ANY code via gather/segment-sum and gains nothing
        # from the QC view, so dispatch on the ORIGINAL code: the QC view
        # carries a column permutation that make_flooding_decoder does not
        # apply, which would decode permuted H against unpermuted LLRs.
        from ..ops.flooding import make_flooding_decoder

        return _with_mask(make_flooding_decoder(code, spec), orig_code,
                          emit_mask)
    code = effective_code(code)
    resolved = backend_for(code, spec, backend)
    if resolved == "pallas":
        from ..kernels import make_pallas_decoder

        return make_pallas_decoder(
            code, spec, batch_tile=batch_tile, interpret=interpret,
            emit_mask=emit_mask,
        )
    if resolved == "pallas-streamed":
        from ..kernels.pallas_streamed import make_streamed_decoder

        return _with_mask(
            make_streamed_decoder(code, spec, batch_tile=batch_tile),
            orig_code, emit_mask,
        )
    if resolved == "pallas-gather":
        from ..kernels.pallas_gather import make_gather_decoder

        return _with_mask(
            make_gather_decoder(code, spec, interpret=interpret),
            orig_code, emit_mask,
        )
    if resolved == "pallas-gather-chunked":
        # compile-size-bounded gather variant (fori_loop over SMEM-indexed
        # check chunks): the fallback when the unrolled kernel's Mosaic op
        # count makes the remote backend compile impractical
        from ..kernels.pallas_gather import make_gather_decoder

        return _with_mask(
            make_gather_decoder(code, spec, interpret=interpret,
                                chunked=True),
            orig_code, emit_mask,
        )
    if resolved == "xla":
        return _with_mask(make_layered_decoder(code, spec), orig_code,
                          emit_mask)
    raise ValueError(f"unknown backend {backend!r}")


def _with_mask(dec, code: LdpcCode, emit_mask: bool):
    """Append a fused per-frame true-syndrome check to a (bits, iters)
    decoder, yielding the emit_mask contract ``(bits, iters, ok[B])`` in
    ONE jitted dispatch.  Same criterion as the fused Pallas QC kernel's
    in-kernel syndrome pass — every backend routes identically."""
    if not emit_mask:
        return dec
    from .twophase import syndrome_fn

    ok_fn = syndrome_fn(code)

    @jax.jit
    def dec_mask(llr):
        bits, iters = dec(llr)
        return bits, iters, ok_fn(bits)

    return dec_mask
