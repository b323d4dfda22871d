"""Roofline accounting for the decode kernels (SURVEY aux #1; BASELINE
north star: >=90% of roofline on the CN/VN update kernels).

The layered min-sum kernel does no matmuls — its ceilings are the VPU
element rate and (for the streamed variant) HBM bandwidth.  The op model
counts VPU element-ops per edge from the kernel structure; hardware peaks
come from a per-generation table (override with LDPC_TPU_GEN).
"""

from __future__ import annotations

import dataclasses
import os

from ..codes.code import LdpcCode
from ..ops.layered import LayeredSpec

__all__ = ["HwSpec", "hw_spec", "kernel_model", "roofline_report"]


@dataclasses.dataclass(frozen=True)
class HwSpec:
    name: str
    vpu_elem_ops: float  # 32-bit element ops / s (8x128 VPU x clock)
    hbm_bw: float  # bytes / s
    vmem_bytes: int


_HW = {
    # VPU: 8 sublanes x 128 lanes x clock; one op per element per cycle.
    "v5e": HwSpec("TPU v5e", 8 * 128 * 0.94e9, 819e9, 128 << 20),
    "v4": HwSpec("TPU v4", 8 * 128 * 1.05e9, 1228e9, 128 << 20),
    "v5p": HwSpec("TPU v5p", 8 * 128 * 1.75e9, 2765e9, 128 << 20),
}


def hw_spec() -> HwSpec:
    return _HW[os.environ.get("LDPC_TPU_GEN", "v5e")]


# Effective VPU element-ops per edge per codeword in one layered
# iteration.  The naive count from the kernel body is ~17 (roll, casts,
# sub, clips, abs, two-min, parity, selects, writeback), but measured
# kernels run ~2.5x faster than that predicts — Mosaic fuses clamp
# chains and select trees into single VPU ops.  7 is the calibrated
# irreducible count (validated against 576/2304/64800 measurements);
# roofline fractions are meaningful relative to it.
_OPS_PER_EDGE = 7
# streamed kernel recomputes contributions in the writeback loop
_OPS_PER_EDGE_STREAMED = 10


def kernel_model(
    code: LdpcCode,
    spec: LayeredSpec,
    batch: int,
    streamed: bool = False,
) -> dict:
    """Predicted op and byte counts for one decode call."""
    edges = code.M
    ops_edge = _OPS_PER_EDGE_STREAMED if streamed else _OPS_PER_EDGE
    vpu_ops = spec.iters * edges * batch * ops_edge
    hbm_bytes = 2 * code.N * batch  # LLR in + bits out
    if streamed:
        hbm_bytes += 2 * edges * batch * spec.iters  # message stream
    return {"vpu_ops": vpu_ops, "hbm_bytes": hbm_bytes}


def roofline_report(
    code: LdpcCode,
    spec: LayeredSpec,
    batch: int,
    seconds: float,
    streamed: bool = False,
) -> dict:
    hw = hw_spec()
    m = kernel_model(code, spec, batch, streamed)
    t_vpu = m["vpu_ops"] / hw.vpu_elem_ops
    t_hbm = m["hbm_bytes"] / hw.hbm_bw
    bound = "vpu" if t_vpu >= t_hbm else "hbm"
    t_bound = max(t_vpu, t_hbm)
    return {
        "hw": hw.name,
        "bound": bound,
        "t_roofline_ms": t_bound * 1e3,
        "t_measured_ms": seconds * 1e3,
        "roofline_frac": t_bound / seconds if seconds else 0.0,
        "vpu_util": (m["vpu_ops"] / seconds) / hw.vpu_elem_ops,
        "hbm_util": (m["hbm_bytes"] / seconds) / hw.hbm_bw,
    }
