#!/usr/bin/env python3
"""Produce BER/FER waterfall curves on the live backend -> benchmarks/BER.md.

The statistical oracle of SURVEY §4: a correct fixed-point layered decoder
must reproduce the expected waterfall.  Bit-exactness against the golden
oracles already pins the semantics; these curves document the channel
quality end-to-end (channel + quantizer + decoder + analyzer).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ldpcgputegra_tpu.sim.sweep import SweepConfig, run_sweep  # noqa: E402
from ldpcgputegra_tpu.utils import enable_compile_cache  # noqa: E402

CURVES = [
    ("1944x972", "OMS", 10, 0.5, 2.75, 0.25),
    ("576x288", "OMS", 10, 0.5, 3.5, 0.5),
    ("2304x1152", "NMS", 10, 0.5, 2.5, 0.25),
    ("576x288", "2NMS", 10, 1.0, 3.5, 0.5),
    ("64800x32400", "OMS", 10, 0.5, 1.5, 0.25),
]


def main() -> None:
    from ldpcgputegra_tpu.utils import device_available

    if not device_available():
        print("(EE) backend unavailable (TPU relay down); aborting")
        return
    enable_compile_cache()
    out = os.path.join(
        os.path.dirname(__file__), "..", "benchmarks", "BER.md"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    lines = [
        "# BER/FER waterfalls (live TPU, fixed-point layered decoding)\n",
        "\nAWGN, BPSK, all-zero codeword, factor-8 int8 LLRs (+/-31), "
        "adaptive FE limit 100, early termination on.\n",
    ]
    for code, algo, iters, lo, hi, step in CURVES:
        cfg = SweepConfig(
            code=code,
            algo=algo,
            iters=iters,
            snr_min=lo,
            snr_max=hi,
            snr_step=step,
            batch=4096,
            max_fe=100,
            max_frames=3_000_000,
            timer_s=90.0,
            early_term=True,
        )
        print(f"== {code} {algo} {iters}it ==", flush=True)
        res = run_sweep(cfg, progress=True)
        lines.append(f"\n## {code} — {algo}, {iters} iterations\n\n")
        lines.append("| Eb/N0 (dB) | BER | FER | frames | FE |\n")
        lines.append("|---|---|---|---|---|\n")
        for p in res.points:
            lines.append(
                f"| {p.snr_db:.2f} | {p.ber:.3e} | {p.fer:.3e} "
                f"| {p.frames} | {p.fe} |\n"
            )
    with open(out, "w") as f:
        f.writelines(lines)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
