#!/usr/bin/env python3
"""Pipelined two-phase ET measurement (ET.md addendum).

The serial two-phase number on a relayed backend measures the ~25 ms
per-call host round trip (the convergence-mask fetch), not decode: the
round-4 study saw 300-500 Mbps at effective 5.1-5.6 iters/frame.  This
tool measures `decode_pipelined` — every batch's phase 1 dispatched up
front so mask fetches overlap compute, exactly how the production sweep
consumes a decoder — and appends the rows to benchmarks/ET.md.

Run on the live chip: python tools/run_et_pipelined.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from ldpcgputegra_tpu.codes.registry import load_code  # noqa: E402
from ldpcgputegra_tpu.decoder.twophase import make_twophase_decoder  # noqa: E402
from ldpcgputegra_tpu.ops.layered import LayeredSpec  # noqa: E402
from ldpcgputegra_tpu.utils import enable_compile_cache  # noqa: E402

# (code, batch, SNR, algo) — the study's operating points
CONFIGS = [
    ("576x288", 16384, 3.0, "2NMS"),
    ("1944x972", 8192, 2.75, "2NMS"),
    ("2304x1152", 8192, 2.5, "2NMS"),
    ("4000x2000", 4096, 2.25, "2NMS"),
    ("576x288", 16384, 3.0, "OMS"),
]
N_BATCH = 12


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
        spec = LayeredSpec(algo=algo, iters=10, minclamp=mc)
        tp = make_twophase_decoder(code, spec, k1=5)
        chan = AwgnChannel(code.N, code.K, ChannelSpec())
        chan.configure(snr)
        llrs = [
            chan.generate_zero_int8(jax.random.key(4000 + i), batch)
            for i in range(2 * N_BATCH)
        ]
        tp.warm_buckets(llrs[0])
        # warm with a FULL-SIZE disjoint pipelined call: the K-batch mask
        # stack is its own executable, and a smaller warm run left its
        # first-use compile inside the timed region (round 4: 0.70 s vs
        # 0.09 s on identical shapes); disjoint batches keep the timed
        # half dedup-proof
        tp.pipelined(llrs[:N_BATCH])
        t0 = time.perf_counter()
        outs, agg = tp.pipelined(llrs[N_BATCH:])
        jax.block_until_ready(outs[-1])
        sec = time.perf_counter() - t0
        mbps = N_BATCH * batch * code.N / sec / 1e6
        rec = {
            "code": name, "algo": algo, "snr_db": snr, "batch": batch,
            "n_batches": N_BATCH, "wall_s": round(sec, 3),
            "pipelined_twophase_mbps": round(mbps, 1),
            "eff_iters_per_frame": round(agg["eff_iters_per_frame"], 2),
            "phase2_frac": round(
                agg["phase2_frames"] / max(agg["frames"], 1), 4
            ),
        }
        recs.append(rec)
        print("(PERF) " + json.dumps(rec), flush=True)

    out = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                       "ET.md")
    with open(out, "a") as f:
        f.write(
            f"\n## Pipelined two-phase ET ({time.strftime('%Y-%m-%d')})\n\n"
            "The serial two-phase rows above pay the mandatory per-call "
            "host round trip (~25 ms on the relay) SERIALLY — they "
            "measure RTT, not decode.  `decode_pipelined` dispatches all "
            "phase-1 executables up front so the mask fetches overlap "
            "compute (the production sweep's consumption pattern, "
            "`sim/sweep.py:352`); wall-clock over "
            f"{N_BATCH} batches:\n\n"
            "| code | algo | SNR | pipelined two-phase Mbps | eff iters "
            "| phase-2 frac |\n|---|---|---|---|---|---|\n"
        )
        for r in recs:
            f.write(
                f"| {r['code']} | {r['algo']} | {r['snr_db']} "
                f"| {r['pipelined_twophase_mbps']} "
                f"| {r['eff_iters_per_frame']} | {r['phase2_frac']} |\n"
            )
        f.write("\n```json\n")
        for r in recs:
            f.write(json.dumps(r) + "\n")
        f.write("```\n")
    print(f"(II) appended to {out}")


if __name__ == "__main__":
    main()
