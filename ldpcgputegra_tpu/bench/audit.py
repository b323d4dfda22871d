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

__all__ = ["audited_ops_per_edge", "count_loop_ops", "dump_qc_mosaic"]

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


def count_loop_ops(mlir: str) -> dict:
    """Vector-result op counts inside the first (iteration) scf.for."""
    lines = mlir.splitlines()
    try:
        start = next(i for i, l in enumerate(lines) if "scf.for" in l)
    except StopIteration:
        raise RuntimeError("no scf.for found in Mosaic dump")
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
