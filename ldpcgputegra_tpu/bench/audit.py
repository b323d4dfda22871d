"""Op-count audit from the COMPILED kernel's Mosaic module (round 4).

The roofline fraction is only as honest as its numerator.  The
structural model (``roofline.ops_per_edge``) mirrors the kernel source,
but the compiler's view differs in both directions: it fuses/elides some
source ops (~9% overcount on regular QC schedules) and the model misses
the sub-pass merge machinery entirely (~29% undercount on 64800's
split block-rows) — measured by ``tools/audit_ops.py``.  This module
counts the real vector ops in the Mosaic MLIR that Pallas emits
(``pallas_call(debug=True)``, local lowering, no hardware) for the QC
kernel's iteration loop; the suite uses these audited counts for
``pallas``-backend rows and labels each record with its op-count source.
"""

from __future__ import annotations

import contextlib
import io
import re

import jax
import numpy as np

from ..codes.code import LdpcCode
from ..ops.layered import LayeredSpec

__all__ = [
    "audited_ops_per_edge", "audited_ops_per_edge_gather",
    "count_loop_ops", "count_nested_loop_ops", "dump_qc_mosaic",
    "dump_gather_mosaic",
]

ALU_OPS = {
    "arith.minsi", "arith.maxsi", "arith.cmpi", "arith.subi",
    "arith.addi", "arith.xori", "arith.select", "arith.andi",
    "arith.ori", "arith.muli", "math.absi", "arith.shrsi", "arith.shli",
}
CAST_OPS = {"arith.extsi", "arith.extui", "arith.trunci", "arith.sitofp"}
MEM_OPS = {"vector.load", "vector.store"}
ROT_OPS = {"tpu.dynamic_rotate", "tpu.rotate"}

_cache: dict[tuple[int, str, str, bool], float] = {}


def dump_qc_mosaic(code: LdpcCode, spec: LayeredSpec) -> str:
    """Build the QC Pallas kernel with debug=True; return captured MLIR."""
    from jax.experimental import pallas as pl

    from ..kernels import pallas_layered as PL

    orig = pl.pallas_call

    def patched(*a, **k):
        k["debug"] = True
        return orig(*a, **k)

    buf = io.StringIO()
    try:
        PL.pl.pallas_call = patched
        dec = PL.make_pallas_decoder(code, spec)
        with contextlib.redirect_stdout(buf):
            jax.export.export(jax.jit(dec), platforms=["tpu"])(
                np.zeros((128, code.N), np.int8)
            )
    finally:
        PL.pl.pallas_call = orig
    return buf.getvalue()


def count_loop_ops(mlir: str, iters: int | None = None) -> dict:
    """Vector-result op counts inside the first (iteration) scf.for.

    With ``iters``, the loop is located by its upper bound instead (the
    streamed kernel peels iteration 0, so its decode loop is
    ``scf.for 1..iters``, not the first loop in the module)."""
    lines = mlir.splitlines()
    try:
        if iters is None:
            start = next(i for i, l in enumerate(lines) if "scf.for" in l)
        else:
            start = next(
                i for i, l in enumerate(lines)
                if (m := _TRIP_RE.search(l)) and int(m.group(2)) == iters
            )
    except StopIteration:
        raise RuntimeError("no iteration scf.for found in Mosaic dump")
    depth = 0
    body = []
    for l in lines[start:]:
        depth += l.count("{") - l.count("}")
        body.append(l)
        if depth == 0:
            break
    counts: dict[str, int] = {}
    for l in body:
        m = re.match(r"\s*%\S+ = (\S+)", l)
        if m and "vector<" in l:
            counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    alu = sum(v for k, v in counts.items() if k in ALU_OPS)
    rot = sum(v for k, v in counts.items() if k in ROT_OPS)
    cast = sum(v for k, v in counts.items() if k in CAST_OPS)
    mem = sum(v for k, v in counts.items() if k in MEM_OPS)
    other = sum(
        v for k, v in counts.items()
        if k not in ALU_OPS | ROT_OPS | CAST_OPS | MEM_OPS
    )
    return {"alu": alu, "rotate": rot, "cast": cast, "mem": mem,
            "other": other, "by_op": counts}


def dump_gather_mosaic(code: LdpcCode, spec: LayeredSpec,
                       chunked: bool = True) -> str:
    """Build the gather Pallas kernel (production auto config) with
    debug=True; return captured MLIR."""
    from jax.experimental import pallas as pl

    from ..kernels import pallas_gather as PG

    orig = pl.pallas_call

    def patched(*a, **k):
        k["debug"] = True
        return orig(*a, **k)

    buf = io.StringIO()
    try:
        PG.pl.pallas_call = patched
        dec = PG.make_gather_decoder(code, spec, chunked=chunked)
        with contextlib.redirect_stdout(buf):
            jax.export.export(jax.jit(dec), platforms=["tpu"])(
                np.zeros((1024, code.N), np.int8)
            )
    finally:
        PG.pl.pallas_call = orig
    return buf.getvalue()


_TRIP_RE = re.compile(
    r"scf\.for\s+%\S+\s*=\s*%c(\d+)\S*\s+to\s+%c(\d+)\S*\s+step\s+%c(\d+)"
)


def count_nested_loop_ops(mlir: str, iters: int) -> dict:
    """Trip-count-weighted vector-op counts for ONE iteration of the
    decode loop in a kernel with nested chunk loops (the chunked gather
    kernel: outer ``scf.for 0..iters`` over iterations, one inner
    ``scf.for`` per colored layer over its check chunks — all with
    constant bounds, so the audit needs no hardware).

    Ops directly in the outer body count once; ops inside an inner loop
    count ``trip`` times (nested inner loops multiply).  Counts are in
    ELEMENT units (each op weighted by its result vector's element
    count): the chunk loop body mixes vector<4x8x128> chunk ops with
    vector<8x128> per-row ops, so a flat op count would undercount 4x."""
    lines = mlir.splitlines()
    start = None
    for i, l in enumerate(lines):
        m = _TRIP_RE.search(l)
        if m and int(m.group(1)) == 0 and int(m.group(2)) == iters \
                and int(m.group(3)) == 1:
            start = i
            break
    if start is None:
        raise RuntimeError(f"no scf.for 0..{iters} (iteration loop) found")
    depth = 0
    # stack of (entry_depth, trip) for ACTIVE inner loops
    stack: list[tuple[int, int]] = []
    counts: dict[str, float] = {}
    for l in lines[start:]:
        opening = l.count("{")
        closing = l.count("}")
        m = _TRIP_RE.search(l)
        if m is not None and depth > 0:  # an inner loop header
            lo, hi, st = (int(m.group(k)) for k in (1, 2, 3))
            trip = max(0, -(-(hi - lo) // max(st, 1)))
            stack.append((depth, trip))
        else:
            mm = re.match(r"\s*%\S+ = (\S+)", l)
            mv = re.search(r"vector<([\dx]+)x\w+>", l)
            if mm and mv and depth > 0:
                elems = 1
                for d in mv.group(1).split("x"):
                    elems *= int(d)
                w = float(elems)
                for _, t in stack:
                    w *= t
                counts[mm.group(1)] = counts.get(mm.group(1), 0.0) + w
        depth += opening - closing
        while stack and depth <= stack[-1][0]:
            stack.pop()
        if depth <= 0 and l is not lines[start]:
            break
    alu = sum(v for k, v in counts.items() if k in ALU_OPS)
    rot = sum(v for k, v in counts.items() if k in ROT_OPS)
    cast = sum(v for k, v in counts.items() if k in CAST_OPS)
    mem = sum(v for k, v in counts.items() if k in MEM_OPS)
    return {"alu": alu, "rotate": rot, "cast": cast, "mem": mem,
            "by_op": counts}


def audited_ops_per_edge_gather(code: LdpcCode, spec: LayeredSpec,
                                chunked: bool = True) -> float | None:
    """Audited VPU ops (ALU + rotate) per edge per iteration for the
    gather kernels (VERDICT r4 #6: the chunked backend carried 8 RESULTS
    rows with a modeled numerator).  Normalization: counts are
    element-weighted and divided by (edges x frames-per-tile), giving
    element ops per (edge x frame); padded chunks are charged to real
    edges (honest — the hardware does execute them)."""
    from ..kernels.pallas_gather import (
        gather_supported, pick_chunked_config, pick_sublanes,
    )

    if not gather_supported(code, spec):
        return None
    if not chunked and code.M > 16000:
        return None  # unrolled dump impractical above the compile ceiling
    key = (id(code), spec.algo, spec.minclamp, spec.early_term,
           "gather-chunked" if chunked else "gather")
    if key in _cache:
        return _cache[key]
    try:
        c = count_nested_loop_ops(
            dump_gather_mosaic(code, spec, chunked), spec.iters
        )
        sub = (pick_chunked_config(code, spec)[0] if chunked
               else pick_sublanes(code, spec))
        if not sub:
            return None
    except Exception:  # noqa: BLE001 — audit failure falls back to model
        return None
    val = (c["alu"] + c["rotate"]) / (code.M * sub * 128)
    _cache[key] = val
    return val


def dump_streamed_mosaic(code: LdpcCode, spec: LayeredSpec) -> str:
    """Build the HBM-streamed QC kernel with debug=True; return MLIR."""
    from jax.experimental import pallas as pl

    from ..kernels import pallas_streamed as PS

    orig = pl.pallas_call

    def patched(*a, **k):
        k["debug"] = True
        return orig(*a, **k)

    buf = io.StringIO()
    try:
        PS.pl.pallas_call = patched
        dec = PS.make_streamed_decoder(code, spec)
        with contextlib.redirect_stdout(buf):
            jax.export.export(jax.jit(dec), platforms=["tpu"])(
                np.zeros((256, code.N), np.int8)
            )
    finally:
        PS.pl.pallas_call = orig
    return buf.getvalue()


def audited_ops_per_edge_streamed(code: LdpcCode,
                                  spec: LayeredSpec) -> float | None:
    """Audited VPU ops per edge per iteration for the streamed QC
    kernel.  Its decode loop is ``scf.for 1..iters`` (iteration 0 is
    peeled to fill the message stream), located by upper bound; the
    steady-state body is one full iteration, so QC-style normalization
    (flat count / block-edges) applies."""
    from ..kernels.pallas_layered import pallas_supported

    if not pallas_supported(code, spec):  # streamed = QC schedule too
        return None
    key = (id(code), spec.algo, spec.minclamp, spec.early_term,
           "streamed")
    if key in _cache:
        return _cache[key]
    try:
        c = count_loop_ops(dump_streamed_mosaic(code, spec), spec.iters)
    except Exception:  # noqa: BLE001 — audit failure falls back to model
        return None
    n_slabs = sum(l.deg for l in code.layers)
    val = (c["alu"] + c["rotate"]) / n_slabs
    _cache[key] = val
    return val


def audited_ops_per_edge(code: LdpcCode,
                         spec: LayeredSpec) -> float | None:
    """Audited VPU ops (ALU + rotate) per edge per iteration for the QC
    Pallas kernel, or None when the code doesn't take that kernel (the
    gather/streamed kernels' nested loop structure needs trip-count
    analysis this audit doesn't do).  Cached per (code, algo, minclamp,
    early_term); iteration count doesn't affect the per-iteration body."""
    from ..kernels.pallas_layered import pallas_supported

    if not pallas_supported(code, spec):
        return None
    key = (id(code), spec.algo, spec.minclamp, spec.early_term)
    if key in _cache:
        return _cache[key]
    try:
        c = count_loop_ops(dump_qc_mosaic(code, spec))
    except Exception:  # noqa: BLE001 — audit failure falls back to model
        return None
    n_slabs = sum(l.deg for l in code.layers)
    val = (c["alu"] + c["rotate"]) / n_slabs
    _cache[key] = val
    return val
