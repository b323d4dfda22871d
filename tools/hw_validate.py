#!/usr/bin/env python3
"""Hardware cross-backend validation + throughput (VERDICT items 2 and 7).

On the live chip:

* ``streamed``: decode identical noisy batches with the fused VMEM kernel
  and the HBM-streamed kernel on QC codes where both fit; assert
  bit-identical outputs and time both.  The streamed kernel is the
  designated path for codes beyond VMEM (SURVEY §7 hard-part 5) and had
  only ever run under the CPU interpreter before this.
* ``gather``: decode identical batches with the Pallas static-gather
  kernel and the XLA gather path on the non-QC codes (the paper's
  headline (4000,2000) config, `paper/ldpcGpuTegra.tex:349-356`, plus
  8000x4000 / 9972x4986); assert bit-identical and time both.

Results append to ``benchmarks/HWVALIDATE.md`` and print as JSON lines.

Usage: python tools/hw_validate.py [--which streamed,gather] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from ldpcgputegra_tpu.bench.harness import measure_call, throughput_report  # noqa: E402
from ldpcgputegra_tpu.channel.awgn import AwgnChannel, ChannelSpec  # noqa: E402
from ldpcgputegra_tpu.codes.registry import load_code  # noqa: E402
from ldpcgputegra_tpu.decoder import make_decoder  # noqa: E402
from ldpcgputegra_tpu.ops.layered import LayeredSpec  # noqa: E402
from ldpcgputegra_tpu.utils import enable_compile_cache  # noqa: E402

STREAMED = [("16200x7560", 1024), ("64800x32400", 256)]
GATHER = [("4000x2000", 4096), ("8000x4000", 2048), ("9972x4986", 2048)]
# QC roll kernel vs the XLA reference path ON HARDWARE (interpret-mode
# bit-exactness is already CPU-tested; this pins the Mosaic compilation)
QC = [("576x288", 4096), ("1944x972", 2048), ("2304x1152", 2048)]

OUT = os.path.join(os.path.dirname(__file__), "..", "benchmarks", "HWVALIDATE.md")


def _inputs(code, batch, n, snr=2.0):
    chan = AwgnChannel(code.N, code.K, ChannelSpec())
    chan.configure(snr)
    return [
        chan.generate_zero_int8(jax.random.key(1000 + i), batch)
        for i in range(n)
    ]


def compare_pair(name, batch, back_a, back_b, quick, spec=None):
    code = load_code(name)
    spec = spec or LayeredSpec(algo="OMS", iters=10, early_term=False)
    dec_a = make_decoder(code, spec, backend=back_a)
    dec_b = make_decoder(code, spec, backend=back_b)
    inputs = _inputs(code, batch, 2 if quick else 4)

    mismatches = 0
    for x in inputs:
        bits_a, it_a = dec_a(x)
        bits_b, it_b = dec_b(x)
        mismatches += int(np.sum(np.asarray(bits_a) != np.asarray(bits_b)))
    exact = mismatches == 0
    print(
        f"(II) {name}: {back_a} vs {back_b} on {len(inputs)}x{batch} frames "
        f"-> {'BIT-EXACT' if exact else f'{mismatches} bit mismatches'}",
        flush=True,
    )

    rows = []
    ks, kl = (2, 6) if quick else (4, 20)
    for back, dec in ((back_a, dec_a), (back_b, dec_b)):
        sec = measure_call(dec, inputs, k_small=ks, k_large=kl)
        rep = throughput_report(sec, batch, code.N)
        row = {
            "code": name,
            "backend": back,
            "iters": spec.iters,
            "batch": batch,
            **{k: round(v, 3) for k, v in rep.items()},
            "bit_exact_pair": exact,
        }
        rows.append(row)
        print("(PERF) " + json.dumps(row), flush=True)
    if not exact:
        raise SystemExit(f"(EE) {name}: {back_a} vs {back_b} NOT bit-exact")
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="qc,streamed,gather")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    from ldpcgputegra_tpu.utils import (
        apply_platform_env,
        device_available,
    )

    apply_platform_env()

    if not device_available():
        print("(EE) backend unavailable (TPU relay down); aborting")
        return
    enable_compile_cache()
    which = set(args.which.split(","))

    all_rows = []
    if "qc" in which:
        for name, batch in QC:
            all_rows += compare_pair(name, batch, "pallas", "xla", args.quick)
    if "streamed" in which:
        for name, batch in STREAMED:
            all_rows += compare_pair(name, batch, "pallas", "pallas-streamed", args.quick)
    if "gather" in which:
        for name, batch in GATHER:
            all_rows += compare_pair(name, batch, "pallas-gather", "xla", args.quick)

    dev = jax.devices()[0].device_kind
    write_header = not os.path.exists(OUT)
    with open(OUT, "a") as f:
        if write_header:
            f.write("# Cross-backend hardware validation\n\n")
            f.write(
                "Identical noisy inputs decoded by two backends on the live "
                "chip; outputs asserted bit-identical; both slope-timed "
                "(dedup-proof harness).\n\n"
            )
            f.write("| code | backend | iters | batch | ms/call | Mbps coded | bit-exact pair |\n")
            f.write("|---|---|---|---|---|---|---|\n")
        for r in all_rows:
            f.write(
                f"| {r['code']} | {r['backend']} | {r['iters']} | {r['batch']} "
                f"| {r['ms_per_call']} | {r['coded_mbps']} | {r['bit_exact_pair']} |\n"
            )
    print(f"(II) appended {len(all_rows)} rows to {OUT} (device {dev})")


if __name__ == "__main__":
    main()
