#!/usr/bin/env python3
"""Kernel-ET operating-point hunt: per-tile iteration predication
(VERDICT r4 #8 — "one kernel-ET row above fixed-10 at >=3.5 dB").

The snapshot-ET kernel predicates a whole iteration off once EVERY lane
in a batch tile has converged.  At the default 256-lane tile that needs
p^256 ~ 1; at high SNR with a 128-lane tile (one VREG of lanes — the
smallest dispatchable tile) p^128 becomes large enough that tiles
genuinely skip iterations.  This tool measures fixed-10 vs snapshot-ET
at 256- and 128-lane tiles across high-SNR points and appends the first
kernel-ET rows that (if any) beat fixed-10 to benchmarks/ET.md.

Run on the live chip: python tools/run_kernel_et.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ldpcgputegra_tpu.bench.harness import measure_call  # noqa: E402
from ldpcgputegra_tpu.codes.registry import load_code  # noqa: E402
from ldpcgputegra_tpu.kernels import make_pallas_decoder  # noqa: E402
from ldpcgputegra_tpu.ops.layered import LayeredSpec  # noqa: E402
from ldpcgputegra_tpu.utils import enable_compile_cache  # noqa: E402

# (code, batch, snr, algo) — high-SNR operating points where whole-tile
# convergence has a real probability
CONFIGS = [
    ("576x288", 16384, 3.5, "2NMS"),
    ("576x288", 16384, 4.0, "2NMS"),
    ("576x288", 16384, 4.5, "2NMS"),
    # low-FER production regime: whole-tile convergence by ~4-5
    # iterations has P ~ 1, so the predication actually skips work
    ("576x288", 16384, 5.5, "2NMS"),
    ("576x288", 16384, 6.5, "2NMS"),
    ("2304x1152", 8192, 3.5, "2NMS"),
    ("2304x1152", 8192, 4.0, "2NMS"),
    ("2304x1152", 8192, 5.0, "2NMS"),
    ("2304x1152", 8192, 6.0, "2NMS"),
    ("1944x972", 8192, 3.5, "2NMS"),
    ("1944x972", 8192, 4.0, "2NMS"),
    ("1944x972", 8192, 5.0, "2NMS"),
    ("1944x972", 8192, 6.0, "2NMS"),
]


def main() -> None:
    from ldpcgputegra_tpu.utils import apply_platform_env, device_available

    apply_platform_env()
    if not device_available():
        print("(EE) backend unavailable; aborting")
        return
    enable_compile_cache()
    import jax

    from ldpcgputegra_tpu.channel.awgn import AwgnChannel, ChannelSpec

    recs = []
    for name, batch, snr, algo in CONFIGS:
        code = load_code(name)
        mc = "pre" if algo == "OMS" else "post"
        base = LayeredSpec(algo=algo, iters=10, minclamp=mc)
        et = dataclasses.replace(base, early_term=True)
        chan = AwgnChannel(code.N, code.K, ChannelSpec())
        chan.configure(snr)
        inputs = [
            chan.generate_zero_int8(jax.random.key(7000 + i), batch)
            for i in range(6)
        ]
        row = {"code": name, "algo": algo, "snr_db": snr, "batch": batch}
        variants = [
            ("fixed10", make_pallas_decoder(code, base)),
            ("et_tb256", make_pallas_decoder(code, et)),
            ("et_tb128", make_pallas_decoder(code, et, batch_tile=128)),
        ]
        for label, dec in variants:
            bits, iters = dec(inputs[0])
            jax.block_until_ready(bits)
            sec = measure_call(dec, inputs)
            row[label + "_mbps"] = round(batch * code.N / sec / 1e6, 1)
            row[label + "_iters"] = int(iters)
        row["best_et_vs_fixed10"] = round(
            max(row["et_tb256_mbps"], row["et_tb128_mbps"])
            / row["fixed10_mbps"], 2,
        )
        recs.append(row)
        print("(PERF) " + json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                       "ET.md")
    with open(out, "a") as f:
        f.write(
            f"\n## Kernel-ET per-tile predication ({time.strftime('%Y-%m-%d')})\n\n"
            "Snapshot-ET with whole-tile iteration predication at 256- "
            "and 128-lane tiles (p^128 vs p^256: the 128-lane tile is "
            "the smallest dispatchable unit, so it is the finest "
            "iteration-skip granularity a TPU kernel can have).  "
            "`iters` = the slowest tile's executed iterations (max over "
            "tiles).  Slope harness, 6 disjoint inputs.\n\n"
            "| code | algo | SNR | fixed-10 Mbps | ET tb=256 Mbps "
            "(iters) | ET tb=128 Mbps (iters) | best ET / fixed-10 |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for r in recs:
            f.write(
                f"| {r['code']} | {r['algo']} | {r['snr_db']} "
                f"| {r['fixed10_mbps']} "
                f"| {r['et_tb256_mbps']} ({r['et_tb256_iters']}) "
                f"| {r['et_tb128_mbps']} ({r['et_tb128_iters']}) "
                f"| {r['best_et_vs_fixed10']}x |\n"
            )
        f.write("\n```json\n")
        for r in recs:
            f.write(json.dumps(r) + "\n")
        f.write("```\n")
    print(f"(II) appended to {out}")


if __name__ == "__main__":
    main()
