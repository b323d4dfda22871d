"""Roofline accounting for the decode kernels (SURVEY aux #1; BASELINE
north star: >=90% of roofline on the CN/VN update kernels).

The layered min-sum kernel does no matmuls — its ceilings are the VPU
element rate and (for the streamed variant) HBM bandwidth.  Honesty rules
(round-1's model reported impossible fractions > 1 and was scrapped):

* the op count is STRUCTURAL — every term below maps to a named op in the
  kernel body (``kernels/pallas_layered.py::layer_pass``), no calibration;
* the ceiling is MEASURED — ``vpu_probe.measure_vpu_rate`` times the same
  op mix on-chip (the VPU co-issues independent ops, so a paper
  one-op-per-cycle rate understates the ceiling; a measured sustained rate
  on decode-shaped dependency chains is the only defensible denominator).
  The per-generation table is only the fallback when no device is
  available (fractions against it are labeled ``ceiling="table"``).
"""

from __future__ import annotations

import dataclasses
import os

from ..codes.code import LdpcCode
from ..ops.layered import LayeredSpec

__all__ = [
    "HwSpec", "hw_spec", "ops_per_edge", "kernel_model", "roofline_report",
]


@dataclasses.dataclass(frozen=True)
class HwSpec:
    name: str
    vpu_elem_ops: float  # 32-bit element ops / s (8x128 VPU x clock x 1 issue)
    hbm_bw: float  # bytes / s
    vmem_bytes: int


_HW = {
    # VPU: 8 sublanes x 128 lanes x clock; ONE op per element per cycle
    # (no co-issue assumed — the probe measures the real issue rate).
    "v5e": HwSpec("TPU v5e", 8 * 128 * 0.94e9, 819e9, 128 << 20),
    "v4": HwSpec("TPU v4", 8 * 128 * 1.05e9, 1228e9, 128 << 20),
    "v5p": HwSpec("TPU v5p", 8 * 128 * 1.75e9, 2765e9, 128 << 20),
}


def hw_spec() -> HwSpec:
    return _HW[os.environ.get("LDPC_TPU_GEN", "v5e")]


def ops_per_edge(
    code: LdpcCode, spec: LayeredSpec, streamed: bool = False
) -> float:
    """Structural int32 VPU element-ops per edge per iteration.

    Mirrors ``pallas_layered.layer_pass`` term by term; per-check work is
    amortized over the mean check degree.
    """
    pre = spec.minclamp == "pre"
    n = 0
    n += 1  # roll APP slab to the edge's check frame
    n += 1  # roll updated slab BACK to frame 0 at writeback (the
    # round-4 delta-shift schedule that removed this roll was reverted
    # at 0178a29 — measured net-negative; see pallas_layered.py's NOTE)
    n += 1  # message int8 -> int32 cast
    n += 3  # contribution: sub + clip(min,max)
    n += 3 if pre else 1  # |v|: (clip(2) then abs) when pre, else abs
    n += 1  # sign compare (c > 0)
    n += 3  # running two-min: max, min, min
    n += 1  # parity xor
    n += 2  # writeback magnitude select: cmp(a==min1) + where
    n += 3  # sign apply: xor, cmp, select
    n += 2 if pre else 0  # message post-clip
    n += 3  # APP update: add + clip(2)
    n += 1  # message int32 -> int8 cast
    if spec.early_term:
        # snapshot ET (round 4): per-check unsat max-accumulate (1/deg per
        # edge) + the hard-bit snapshot pass (cast+cmp+select per VN,
        # charged every iteration as an upper bound)
        n += 1 / (code.M / max(code.n_checks, 1))
        n += 3 * code.N / max(code.M, 1)
    if streamed:
        n += 6  # streamed kernel re-derives contributions in writeback
    # per-check f-constants, amortized over mean degree
    f_ops = {"MS": 2, "OMS": 6, "NMS": 4, "2NMS": 4}[spec.algo]
    mean_deg = code.M / max(code.n_checks, 1)
    return n + f_ops / mean_deg


def kernel_model(
    code: LdpcCode,
    spec: LayeredSpec,
    batch: int,
    streamed: bool = False,
) -> dict:
    """Structural op and byte counts for one decode call."""
    edges = code.M
    vpu_ops = spec.iters * edges * batch * ops_per_edge(code, spec, streamed)
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
    vpu_rate: float | None = None,
    hbm_rate: float | None = None,
    ops_override: float | None = None,
) -> dict:
    """Roofline fraction for a measured decode time.

    ``vpu_rate``/``hbm_rate`` should come from ``vpu_probe`` on the live
    chip; without them the per-generation table is used and the result is
    labeled ``ceiling="table"`` (treat those fractions as approximate).
    ``ops_override`` replaces the structural per-edge op count with an
    AUDITED one (``bench.audit`` counts the compiled kernel's Mosaic
    vector ops); records carry ``ops_src`` accordingly.
    """
    hw = hw_spec()
    vr = vpu_rate if vpu_rate is not None else hw.vpu_elem_ops
    hr = hbm_rate if hbm_rate is not None else hw.hbm_bw
    m = kernel_model(code, spec, batch, streamed)
    ope = ops_per_edge(code, spec, streamed)
    if ops_override is not None:
        m["vpu_ops"] = m["vpu_ops"] * (ops_override / ope)
        ope = ops_override
    t_vpu = m["vpu_ops"] / vr
    t_hbm = m["hbm_bytes"] / hr
    bound = "vpu" if t_vpu >= t_hbm else "hbm"
    t_bound = max(t_vpu, t_hbm)
    # the honesty label must key on the rate that actually SETS the
    # ceiling: a partially failed probe (vpu measured, hbm probe raised)
    # must not report an hbm-bound table fraction as "probed"
    probed = (vpu_rate is not None) if bound == "vpu" else (
        hbm_rate is not None
    )
    return {
        "hw": hw.name,
        "ceiling": "probed" if probed else "table",
        "bound": bound,
        "ops_src": "mosaic-audit" if ops_override is not None else "model",
        "ops_per_edge": round(ope, 2),
        "t_roofline_ms": t_bound * 1e3,
        "t_measured_ms": seconds * 1e3,
        "roofline_frac": t_bound / seconds if seconds else 0.0,
        "vpu_util": (m["vpu_ops"] / seconds) / vr,
        "hbm_util": (m["hbm_bytes"] / seconds) / hr,
    }
