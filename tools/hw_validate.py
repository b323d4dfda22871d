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
# the synthetic beyond-VMEM QC code (262144 bits, 786k edges): the ONLY
# code that REQUIRES pallas-streamed (VERDICT r3 weak #6) — validated
# against the XLA path since the all-VMEM kernel cannot hold it
STREAMED_ONLY = [("synthqc-256x128x6-z1024", 256)]
# 20000x10000 has no unrolled tile (VMEM); its pallas-gather pair fails
# fast (caught) and the chunked sub=2 pair is the real A/B there
GATHER = [("4000x2000", 4096), ("8000x4000", 2048), ("9972x4986", 2048),
          ("20000x10000", 1024)]
# compile pricing runs smallest-first so a compile-service blowup on the
# big unrolls still leaves 4000x2000 priced (VERDICT r2 next-step 2)
COMPILE = ["4000x2000", "8000x4000", "9972x4986", "20000x10000"]
# QC roll kernel vs the XLA reference path ON HARDWARE (interpret-mode
# bit-exactness is already CPU-tested; this pins the Mosaic compilation)
QC = [("576x288", 4096), ("1944x972", 2048), ("2304x1152", 2048)]
# Registry tail (VERDICT r4 #4): every imported code gets >=1 silicon
# bit-exact pair — auto-resolved best backend vs the XLA reference path.
TAIL = [
    ("155x93", 4096), ("200x100", 4096), ("816x408", 2048),
    ("1024x518", 2048), ("1200x600", 2048), ("1248x624", 2048),
    ("2640x1320", 1024), ("802_11e_576x288", 4096),
    ("802_11e_1920x960", 2048), ("802_11e_2304x1152", 2048),
    ("802_11n-1944x972", 2048), ("16200x10800", 512),
    ("64800x32400-dvbs2", 256), ("64800x6480-dvbs2", 256),
    ("64800x7200-dvbs2", 256),
]

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


def price_compiles(quick: bool) -> list[dict]:
    """Time the remote backend compile of the gather kernels — unrolled
    vs chunked — BEFORE any timed suite touches them (VERDICT r2 weak #3:
    the unrolled kernel's per-check Mosaic op count is a compile-time
    risk nobody had priced; 9972x4986 unrolls ~70k ops).

    Measures wall seconds of (first call) - (second call) per decoder.
    With the persistent compile cache enabled a prior session's hit shows
    up as compile_s ~ 0 — recorded as-is (the cache IS the production
    path; cold numbers come from the first-ever chip contact).  Appends
    to benchmarks/COMPILE.md.  A per-code failure (OOM / compile-service
    timeout) is caught and recorded, not fatal — the chunked variant is
    the designated fallback.
    """
    import time

    from ldpcgputegra_tpu.kernels.pallas_gather import make_gather_decoder

    rows = []
    for name in COMPILE:
        code = load_code(name)
        spec = LayeredSpec(algo="OMS", iters=10, early_term=False)
        x = _inputs(code, 1024, 1)[0]
        for variant, kw in (("unrolled", {}), ("chunked", {"chunked": True})):
            if variant == "unrolled" and code.M > 16000:
                # measured ceiling (round 3): the unrolled kernel's Mosaic
                # op count crashes the compile service beyond ~16k edges —
                # don't burn minutes of chip window re-proving it
                rows.append({"code": name, "variant": variant, "ok": False,
                             "error": "skipped: above measured "
                             "_UNROLL_EDGE_MAX compile ceiling"})
                print("(COMPILE) " + json.dumps(rows[-1]), flush=True)
                continue
            row = {"code": name, "variant": variant}
            try:
                dec = make_gather_decoder(code, spec, **kw)
                t0 = time.perf_counter()
                jax.block_until_ready(dec(x)[0])
                t1 = time.perf_counter()
                jax.block_until_ready(dec(x)[0])
                t2 = time.perf_counter()
                row["compile_s"] = round((t1 - t0) - (t2 - t1), 1)
                row["ok"] = True
            except Exception as e:  # noqa: BLE001
                row["ok"] = False
                row["error"] = f"{type(e).__name__}: {e}"[:300]
            rows.append(row)
            print("(COMPILE) " + json.dumps(row), flush=True)
        if quick:
            break
    out = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                       "COMPILE.md")
    hdr = not os.path.exists(out)
    with open(out, "a") as f:
        if hdr:
            f.write("# Gather-kernel compile pricing (remote compile "
                    "service)\n\nFirst-call minus second-call wall "
                    "seconds; ~0 = persistent-cache hit.\n\n"
                    "| code | variant | compile_s | ok |\n|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['code']} | {r['variant']} "
                    f"| {r.get('compile_s', '—')} | {r['ok']} |\n")
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="compile,qc,streamed,gather,tail")
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

    compile_rows = []
    if "compile" in which:
        compile_rows = price_compiles(args.quick)

    def safe(name, batch, a, b):
        # a compile-service failure on one pair must not forfeit the rest
        # of a hardware window; bit-mismatch still aborts (SystemExit)
        try:
            return compare_pair(name, batch, a, b, args.quick)
        except SystemExit:
            raise
        except Exception as e:  # noqa: BLE001
            print(f"(EE) {name} {a} vs {b} failed: "
                  f"{type(e).__name__}: {e}", flush=True)
            return []

    all_rows = []
    if "qc" in which:
        for name, batch in QC:
            all_rows += safe(name, batch, "pallas", "xla")
    if "streamed" in which:
        for name, batch in STREAMED:
            all_rows += safe(name, batch, "pallas", "pallas-streamed")
        for name, batch in STREAMED_ONLY:
            all_rows += safe(name, batch, "pallas-streamed", "xla")
    if "tail" in which:
        from ldpcgputegra_tpu.decoder import backend_for
        from ldpcgputegra_tpu.ops.layered import LayeredSpec as _LS

        for name, batch in TAIL:
            auto = backend_for(load_code(name), _LS(algo="OMS", iters=10))
            if auto == "xla":
                print(f"(WW) {name}: auto backend is xla on this device — "
                      "no fused pair to validate", flush=True)
                continue
            all_rows += safe(name, batch, auto, "xla")
    if "gather" in which:
        for name, batch in GATHER:
            if load_code(name).M <= 16000:  # measured unrolled ceiling
                all_rows += safe(name, batch, "pallas-gather", "xla")
            # the chunked variant must be proven bit-exact + timed on
            # silicon too — it is the ONLY fused path for the codes above
            # the unrolled compile ceiling (VERDICT r3 missing #1)
            all_rows += safe(name, batch, "pallas-gather-chunked", "xla")

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
