#!/usr/bin/env python3
"""Pipelined two-phase ET measurement (ET.md addendum).

The serial two-phase number on a relayed backend measures the ~25 ms
per-call host round trip (the convergence-count fetch), not decode.
This tool measures `decode_pipelined` — every batch's phase 1 dispatched
up front, ONE stacked count fetch per window, on-device compaction
(round 5: the in-kernel emit_mask output replaced the separate syndrome
pass, and argsort compaction replaced host-built gather indices) — and
an apples-to-apples FIXED-10 baseline driven the exact same way (all
dispatches queued, one block at the end).  Appends rows to
benchmarks/ET.md.

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
from ldpcgputegra_tpu.decoder import make_decoder  # noqa: E402
from ldpcgputegra_tpu.decoder.twophase import make_twophase_decoder  # noqa: E402
from ldpcgputegra_tpu.ops.layered import LayeredSpec  # noqa: E402
from ldpcgputegra_tpu.utils import enable_compile_cache  # noqa: E402

# (code, batch, SNR, algo, k1) — the study's operating points; the
# second SNR per code is the P(conv<=5)>=0.99 point (ET_convergence.md).
# k1 is chosen per point to minimize k1 + (1 - P(conv<=k1)) * iters
# (the two-phase cost model): at the fat-tail points k1=5 pays a 13-27%
# phase-2 tail and LOSES to fixed-10 (round-5 rows 0.58x/0.9x); one more
# phase-1 iteration collapses the tail (4000x2000@2.25: P(conv<=6) =
# 0.957 vs P(conv<=5) = 0.724) and flips the economics.
CONFIGS = [
    ("576x288", 16384, 3.0, "2NMS", 5),
    ("576x288", 16384, 3.5, "2NMS", 5),
    ("1944x972", 8192, 2.75, "2NMS", 5),
    ("1944x972", 8192, 3.25, "2NMS", 5),
    ("1944x972", 8192, 3.5, "2NMS", 5),
    ("2304x1152", 8192, 2.5, "2NMS", 5),
    ("2304x1152", 8192, 2.5, "2NMS", 6),
    ("2304x1152", 8192, 3.0, "2NMS", 5),
    ("2304x1152", 8192, 3.5, "2NMS", 5),
    ("4000x2000", 4096, 2.25, "2NMS", 5),
    ("4000x2000", 4096, 2.25, "2NMS", 6),
    ("4000x2000", 4096, 2.25, "2NMS", 7),
    ("576x288", 16384, 3.0, "OMS", 5),
]
# windows must dwarf the one count-fetch RTT (~25 ms) AND relay timing
# noise: 96 batches put ~0.2-1 s on the wall (VERDICT r4 weak #5 flagged
# 12-batch ~0.1 s walls as RTT-noise-dominated).  Walls still jitter
# ~2x run-to-run on the relay, so each number is the MIN of R disjoint
# timed windows (disjoint inputs: dedup-proof).
N_BATCH = 96
REPEATS = 3


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--only", default=None,
        help="substring filter on 'code@snr/algo/kK' — run a subset "
        "(e.g. 'k6' for the tail-tuned points) without re-measuring "
        "the already-published rows",
    )
    args = ap.parse_args()
    from ldpcgputegra_tpu.utils import apply_platform_env, device_available

    apply_platform_env()
    if not device_available():
        print("(EE) backend unavailable; aborting")
        return
    enable_compile_cache()
    import jax

    from ldpcgputegra_tpu.channel.awgn import AwgnChannel, ChannelSpec

    recs = []
    for name, batch, snr, algo, k1 in CONFIGS:
        if args.only and args.only not in f"{name}@{snr}/{algo}/k{k1}":
            continue
        code = load_code(name)
        mc = "pre" if algo == "OMS" else "post"
        spec = LayeredSpec(algo=algo, iters=10, minclamp=mc)
        tp = make_twophase_decoder(code, spec, k1=k1)
        d10 = make_decoder(code, spec)
        chan = AwgnChannel(code.N, code.K, ChannelSpec())
        chan.configure(snr)
        def window(r):  # disjoint inputs per repeat (relay-dedup-proof)
            return [
                chan.generate_zero_int8(
                    jax.random.key(4000 + r * N_BATCH + i), batch
                )
                for i in range(N_BATCH)
            ]

        # warm with a FULL-SIZE disjoint pipelined call: the K-batch count
        # stack is its own executable, and a smaller warm run left its
        # first-use compile inside the timed region (round 4: 0.70 s vs
        # 0.09 s on identical shapes); disjoint batches keep the timed
        # half dedup-proof
        w = window(0)
        tp.warm_buckets(w[0])
        _, warm_agg = tp.pipelined(w)
        jax.block_until_ready([d10(x)[0] for x in w])  # warm fixed-10
        # fused-mode tail bucket: 1.5x the observed mean unconverged
        # count, rounded to the next 128 (overflow repair catches the
        # rest; the warm window measures the operating point's tail)
        mean_bad = warm_agg["phase2_frames"] / max(len(w), 1)
        ftail = max(128, -(-int(1.5 * mean_bad + 1) // 128) * 128)
        tp.warm_fused(w[0], ftail)
        del w

        sec = float("inf")
        agg = None
        for r in range(1, REPEATS + 1):
            llrs = window(r)
            t0 = time.perf_counter()
            outs, a = tp.pipelined(llrs)
            jax.block_until_ready(outs)
            s = time.perf_counter() - t0
            if s < sec:
                sec, agg = s, a
            del llrs, outs
        mbps = N_BATCH * batch * code.N / sec / 1e6

        # fused single-dispatch variant (same windows, disjoint inputs)
        fu_sec = float("inf")
        fu_agg = None
        for r in range(3 * REPEATS + 1, 4 * REPEATS + 1):
            llrs = window(r)
            t0 = time.perf_counter()
            outs, a = tp.pipelined_fused(llrs, ftail)
            jax.block_until_ready(outs)
            s = time.perf_counter() - t0
            if s < fu_sec:
                fu_sec, fu_agg = s, a
            del llrs, outs
        fu_mbps = N_BATCH * batch * code.N / fu_sec / 1e6

        # fixed-10 baseline, driven IDENTICALLY: queue every dispatch,
        # block once (the old study compared pipelined two-phase against
        # a slope-harness fixed-10 — different consumption patterns)
        f_sec = float("inf")
        for r in range(REPEATS + 1, 2 * REPEATS + 1):
            llrs = window(r)
            t0 = time.perf_counter()
            f_outs = [d10(x)[0] for x in llrs]
            jax.block_until_ready(f_outs)
            f_sec = min(f_sec, time.perf_counter() - t0)
            del llrs, f_outs
        f_mbps = N_BATCH * batch * code.N / f_sec / 1e6

        best = max(mbps, fu_mbps)
        rec = {
            "code": name, "algo": algo, "snr_db": snr, "k1": k1,
            "batch": batch,
            "n_batches": N_BATCH, "wall_s": round(sec, 3),
            "pipelined_twophase_mbps": round(mbps, 1),
            "fused_twophase_mbps": round(fu_mbps, 1),
            "fused_tail": ftail,
            "fused_overflows": fu_agg["overflows"],
            "fixed10_pipelined_mbps": round(f_mbps, 1),
            "vs_fixed10": round(best / f_mbps, 2),
            "best_variant": "fused" if fu_mbps > mbps else "bucketed",
            "eff_iters_per_frame": round(agg["eff_iters_per_frame"], 2),
            "eff_iters_fused": round(fu_agg["eff_iters_per_frame"], 2),
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
            f"\n## Pipelined two-phase ET ({time.strftime('%Y-%m-%d')}, "
            "in-kernel mask + on-device compaction)\n\n"
            "Phase 1 emits the convergence word from the decode kernel "
            "itself (`emit_mask`), the host fetches one COUNT per batch "
            "(stacked, one transfer per window), and compaction is "
            "on-device (2D cumsum + searchsorted; tail gather = exact "
            "one-hot bf16 matmul on the MXU) — no syndrome stage, no "
            "host-built indices (VERDICT r4 #6).  `fused` = the whole "
            "two-phase step as ONE executable with a fixed tail bucket "
            "(overflow repaired per window).  `fixed10` is measured with the "
            "same dispatch-all/block-once pattern over the same "
            f"{N_BATCH}-batch windows:\n\n"
            "| code | algo | SNR | k1 | bucketed Mbps | fused Mbps "
            "| fixed-10 Mbps | best ratio | eff iters | phase-2 frac |\n"
            "|---|---|---|---|---|---|---|---|---|---|\n"
        )
        for r in recs:
            f.write(
                f"| {r['code']} | {r['algo']} | {r['snr_db']} "
                f"| {r['k1']} "
                f"| {r['pipelined_twophase_mbps']} "
                f"| {r['fused_twophase_mbps']} "
                f"| {r['fixed10_pipelined_mbps']} | {r['vs_fixed10']}x "
                f"| {r['eff_iters_per_frame']} | {r['phase2_frac']} |\n"
            )
        f.write("\n```json\n")
        for r in recs:
            f.write(json.dumps(r) + "\n")
        f.write("```\n")
    print(f"(II) appended to {out}")


if __name__ == "__main__":
    main()
