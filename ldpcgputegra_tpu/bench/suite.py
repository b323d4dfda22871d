"""Full benchmark suite: throughput + roofline across codes/backends.

Covers the reference's measurement surface (M4): per-config coded Mbps at
5 and 10 iterations (the paper's two operating points), decode-only
(PERF-style) timing with device-resident inputs, and roofline
utilization.  Writes ``benchmarks/RESULTS.md``.

Run:  python -m ldpcgputegra_tpu.bench.suite [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax

from ..channel.awgn import AwgnChannel, ChannelSpec
from ..codes.registry import load_code
from ..decoder import backend_for, effective_code, make_decoder
from ..ops.layered import LayeredSpec
from ..utils import enable_compile_cache
from .harness import measure_call, throughput_report
from .roofline import roofline_report

# (code, batch, {iters: published baseline Mbps [best device, 3 streams]})
# 10-iter: paper/ldpcGpuTegra.tex:337,345,353 (GTX 680); 5-iter: :338,346,354
CONFIGS = [
    ("576x288", 16384, {10: 127.0, 5: 217.0}),
    ("2304x1152", 8192, {10: 132.0, 5: 226.0}),
    ("1944x972", 8192, {}),
    ("2048x384", 8192, {}),   # deg-32 CN: highest per-check register pressure
    ("4000x2000", 4096, {10: 131.0, 5: 230.0}),
    ("4896x2448", 4096, {}),
    ("8000x4000", 2048, {10: 33.0}),  # TK1 heterogeneous, tex:318
    ("9972x4986", 2048, {}),
    ("16200x7560", 1024, {}),
    ("20000x10000", 1024, {}),
    ("64800x32400", 512, {}),
    # rate 2/3: the sub-pass-split schedule (repeated block-columns) —
    # measures the corrected schedule's ~10% extra layer passes
    ("64800x21600", 512, {}),
    # ---- registry tail (VERDICT r4 #4: every imported code gets a
    # published throughput row; 10-iter only to bound suite time) ----
    ("155x93", 16384, {}, (10,)),   # smallest QC code; odd Z=31 padding
    ("200x100", 16384, {}, (10,)),
    ("816x408", 8192, {}, (10,)),
    ("1024x518", 8192, {}, (10,)),
    # the reference's compile-time DEFAULT code (matrix/code.h:1)
    ("1200x600", 8192, {}, (10,)),
    ("1248x624", 8192, {}, (10,)),
    ("2640x1320", 4096, {}, (10,)),
    ("802_11e_576x288", 16384, {}, (10,)),
    ("802_11e_1920x960", 8192, {}, (10,)),
    ("802_11e_2304x1152", 8192, {}, (10,)),
    ("802_11n-1944x972", 8192, {}, (10,)),
    # batches match tools/hw_validate.py's TAIL entries so the suite
    # reuses the validated executables from the compile cache — the
    # rate-9/10 view's deg-30 layers took ~80 min on the remote compile
    # service; a different batch would recompile from scratch
    ("16200x10800", 512, {}, (10,)),
    ("64800x32400-dvbs2", 256, {}, (10,)),
    # DVB-S2 rate extremes (9/10 and 8/9)
    ("64800x6480-dvbs2", 256, {}, (10,)),
    ("64800x7200-dvbs2", 256, {}, (10,)),
    # the beyond-VMEM synthetic QC workload (786k edges, N=262144): the
    # only code that REQUIRES pallas-streamed — its published row is the
    # kernel's existence proof (VERDICT r4 #5); batch matches
    # hw_validate's STREAMED_ONLY pair so the executable is cache-shared
    ("synthqc-256x128x6-z1024", 256, {}, (10,)),
]


def bench_one(name: str, batch: int, iters: int, quick: bool,
              rates: dict | None = None, repeats: int = 1) -> dict:
    """One suite row; with repeats > 1 the published time is the MIN of
    R disjoint slope measurements (relay walls jitter ~2x run to run —
    the ET study's protocol, CLAUDE.md round-5 notes)."""
    code = load_code(name)
    spec = LayeredSpec(algo="OMS", iters=iters, early_term=False)
    backend = backend_for(code, spec)
    dec = make_decoder(code, spec)
    chan = AwgnChannel(code.N, code.K, ChannelSpec())
    chan.configure(2.5)
    n_inputs = 2 if quick else 6
    inputs = [
        chan.generate_zero_int8(jax.random.key(i), batch)
        for i in range(n_inputs)
    ]
    ks, kl = (2, 6) if quick else (4, 20)
    sec = min(
        measure_call(dec, inputs, k_small=ks, k_large=kl)
        for _ in range(max(1, repeats))
    )
    rep = throughput_report(sec, batch, code.N)
    eff = effective_code(code)
    rates = rates or {}
    ops_override = None
    if backend == "pallas":
        # audited op count from the compiled kernel's Mosaic module —
        # the structural model runs ~9% high on regular QC schedules and
        # ~29% LOW on sub-pass-split ones (benchmarks/ROOFLINE_AUDIT.md)
        from .audit import audited_ops_per_edge

        ops_override = audited_ops_per_edge(eff, spec)
    elif backend in ("pallas-gather", "pallas-gather-chunked"):
        # gather kernels: trip-weighted nested-loop audit (VERDICT r4 #6
        # — the chunked backend carried 8 RESULTS rows with ops_src:
        # model); measured ~13% below the structural model (elided ops)
        from .audit import audited_ops_per_edge_gather

        ops_override = audited_ops_per_edge_gather(
            eff, spec, chunked=backend.endswith("chunked")
        )
    elif backend == "pallas-streamed":
        # steady-state iteration body of the peeled decode loop
        from .audit import audited_ops_per_edge_streamed

        ops_override = audited_ops_per_edge_streamed(eff, spec)
    roof = roofline_report(
        eff, spec, batch, sec, streamed=(backend == "pallas-streamed"),
        vpu_rate=rates.get("vpu"), hbm_rate=rates.get("hbm"),
        ops_override=ops_override,
    )
    from .roofline import kernel_model, ops_per_edge

    m = kernel_model(eff, spec, batch,
                     streamed=(backend == "pallas-streamed"))
    if ops_override is not None:
        m["vpu_ops"] *= ops_override / ops_per_edge(
            eff, spec, backend == "pallas-streamed"
        )
    return {
        "code": name,
        "backend": backend,
        "iters": iters,
        "batch": batch,
        **{k: round(v, 3) for k, v in rep.items()},
        "roofline_frac": round(roof["roofline_frac"], 3),
        "bound": roof["bound"],
        "ceiling": roof["ceiling"],
        "ops_src": roof["ops_src"],
        "ops_per_edge": roof["ops_per_edge"],
        "_sec": sec,
        "_vpu_ops": m["vpu_ops"],
        "_hbm_bytes": m["hbm_bytes"],
    }


def bench_latency(name: str, iters: int, quick: bool,
                  repeats: int = 1) -> dict:
    """Minimum-batch (one 128-lane tile) decode latency — the reference's
    latency axis (``code/ldpc_decoder_arm/main.cpp:612-625`` reports
    per-frame latency alongside Mbps; the paper quotes the per-stage
    breakdown at ``ldpcGpuTegra.tex:298``).  Throughput batches amortize;
    this measures the smallest dispatchable unit."""
    code = load_code(name)
    spec = LayeredSpec(algo="OMS", iters=iters, early_term=False)
    backend = backend_for(code, spec)
    dec = make_decoder(code, spec)
    chan = AwgnChannel(code.N, code.K, ChannelSpec())
    chan.configure(2.5)
    batch = 128
    n_inputs = 2 if quick else 6
    inputs = [
        chan.generate_zero_int8(jax.random.key(1000 + i), batch)
        for i in range(n_inputs)
    ]
    ks, kl = (2, 6) if quick else (4, 20)
    sec = min(
        measure_call(dec, inputs, k_small=ks, k_large=kl)
        for _ in range(max(1, repeats))
    )
    return {
        "code": name,
        "backend": backend,
        "iters": iters,
        "batch": batch,
        "ms_per_call": round(sec * 1e3, 3),
        "us_per_frame": round(sec / batch * 1e6, 2),
        "coded_mbps": round(batch * code.N / sec / 1e6, 1),
    }


LAT_CONFIGS = ["576x288", "1944x972", "4000x2000", "64800x32400"]


def probe_rates() -> dict:
    """Measure the chip's sustained VPU/HBM ceilings once per suite run."""
    from .vpu_probe import measure_hbm_bw, measure_vpu_rate

    rates = {}
    try:
        rates["vpu"] = measure_vpu_rate()
        rates["hbm"] = measure_hbm_bw()
        print(
            f"(II) probed ceilings: VPU {rates['vpu']/1e12:.2f} Telem-ops/s, "
            f"HBM {rates['hbm']/1e9:.0f} GB/s",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001
        print(f"(WW) ceiling probe failed ({e}); using table ceilings")
    return rates


CKPT = "benchmarks/logs/suite_ckpt.json"


def _ckpt_save(rows, lat_rows, rates) -> None:
    os.makedirs(os.path.dirname(CKPT), exist_ok=True)
    tmp = CKPT + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"rows": rows, "lat_rows": lat_rows, "rates": rates}, f)
    os.replace(tmp, CKPT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="benchmarks/RESULTS.md")
    ap.add_argument(
        "--fresh", action="store_true",
        help="ignore (and overwrite) the row checkpoint; default resumes "
        "a killed/timed-out run so multi-hour tail compiles are not "
        "re-paid (the remote compile cache does not survive container "
        "resets)",
    )
    ap.add_argument(
        "--remeasure", action="store_true",
        help="drop the checkpoint's measured rows but KEEP its probed "
        "ceilings — re-times every config against the warm compile "
        "cache (minutes, not hours); combine with --repeats for the "
        "min-of-R relay-jitter protocol",
    )
    ap.add_argument(
        "--repeats", type=int, default=1,
        help="min-of-R disjoint slope measurements per row (relay walls "
        "jitter ~2x; the ET study's protocol)",
    )
    args = ap.parse_args()
    from ..utils import device_available

    if not device_available():
        print("(EE) backend unavailable (TPU relay down); aborting")
        return
    enable_compile_cache()

    rows, lat_rows, rates = [], [], None
    if not args.fresh and os.path.exists(CKPT):
        with open(CKPT) as f:
            ck = json.load(f)
        rows, lat_rows = ck["rows"], ck["lat_rows"]
        rates = ck.get("rates")
        if args.remeasure:
            print(f"(II) --remeasure: dropping {len(rows)} measured rows "
                  f"(+{len(lat_rows)} latency), keeping probed ceilings",
                  flush=True)
            rows, lat_rows = [], []
        else:
            print(
                f"(II) resuming: {len(rows)} rows + {len(lat_rows)} "
                f"latency rows from {CKPT}", flush=True,
            )
    if rates is None:
        rates = probe_rates()
        _ckpt_save(rows, lat_rows, rates)
    done = {(r["code"], r["iters"], r["batch"]) for r in rows}

    for ent in CONFIGS:
        name, batch, baselines = ent[:3]
        iters_list = ent[3] if len(ent) > 3 else (10, 5)
        for iters in iters_list:
            if (name, iters, batch) in done:
                continue
            t0 = time.time()
            try:
                r = bench_one(name, batch, iters, args.quick, rates,
                              repeats=args.repeats)
            except Exception as e:  # noqa: BLE001
                print(f"(EE) {name}@{iters}it failed: {e}")
                continue
            base = baselines.get(iters)
            r["baseline_mbps"] = base
            if base:
                r["vs_baseline"] = round(r["coded_mbps"] / base, 1)
            rows.append(r)
            _ckpt_save(rows, lat_rows, rates)
            print(
                f"(PERF) {name} {iters}it [{r['backend']}]: "
                f"{r['ms_per_call']} ms, {r['coded_mbps']} Mbps coded, "
                f"roofline {r['roofline_frac']} ({r['bound']}-bound, "
                f"{r['ceiling']} ceiling) [{time.time()-t0:.0f}s]",
                flush=True,
            )

    lat_done = {r["code"] for r in lat_rows}
    for name in LAT_CONFIGS:
        if name in lat_done:
            continue
        try:
            r = bench_latency(name, 10, args.quick,
                              repeats=args.repeats)
        except Exception as e:  # noqa: BLE001
            print(f"(EE) latency {name} failed: {e}")
            continue
        lat_rows.append(r)
        _ckpt_save(rows, lat_rows, rates)
        print(
            f"(PERF) latency {name} [{r['backend']}]: {r['ms_per_call']} ms "
            f"/128-frame tile, {r['us_per_frame']} us/frame",
            flush=True,
        )

    # Final ceiling = max(probed rate, best DEMONSTRATED sustained rate
    # across the measured rows).  The probes upper-bound what their own
    # dependency structures can issue, but the live chip demonstrated
    # more on the real kernels (round 4: 576x288 sustained 4.2 Tops/s of
    # AUDITED vector-ALU ops against a 3.3 Tops/s probe best) — and a
    # kernel's own sustained rate is an existence proof of the ceiling.
    # Fractions are recomputed against it: <= 1 by construction for the
    # best row, honest relative numbers for the rest.
    vpu_ceiling = rates.get("vpu", 0.0)
    best_code = "probe"
    for r in rows:
        demonstrated = r["_vpu_ops"] / r["_sec"]
        if demonstrated > vpu_ceiling:
            vpu_ceiling = demonstrated
            best_code = f"{r['code']}@{r['iters']}it"
    hbm_rate = rates.get("hbm")
    for r in rows:
        t_vpu = r["_vpu_ops"] / vpu_ceiling if vpu_ceiling else 0.0
        t_hbm = (r["_hbm_bytes"] / hbm_rate) if hbm_rate else 0.0
        bound = "vpu" if t_vpu >= t_hbm else "hbm"
        r["bound"] = bound
        r["roofline_frac"] = round(max(t_vpu, t_hbm) / r["_sec"], 3)
        if bound == "vpu":
            # only call the ceiling "measured" when a probe actually ran;
            # without one the ceiling is the rows' own best modeled rate —
            # self-referential (best row's frac == 1.0 by construction),
            # so it must keep a distinguishable provenance tag (ADVICE r4)
            r["ceiling"] = (
                f"measured(max of probe, demonstrated by {best_code})"
                if rates.get("vpu")
                else f"demonstrated-only({best_code}; no VPU probe ran)"
            )
        if r["roofline_frac"] > 1.0:
            r["roofline_suspect"] = True
            print(
                f"(EE) {r['code']}@{r['iters']}it roofline_frac="
                f"{r['roofline_frac']} > 1 against the demonstrated "
                "ceiling — investigate before publishing", flush=True,
            )
        del r["_sec"], r["_vpu_ops"], r["_hbm_bytes"]
    print(
        f"(II) final VPU ceiling {vpu_ceiling/1e12:.2f} Tops/s "
        f"(best demonstrated: {best_code})", flush=True,
    )

    # Provenance stamp: carried into every raw record so downstream
    # consumers (bench.py's stale fallback) can report measurement date
    # and harness version accurately instead of guessing.
    stamp = {
        "measured": time.strftime("%Y-%m-%d"),
        "harness": "salted-slope",
        "vpu_ceiling_tops": round(vpu_ceiling / 1e12, 3),
    }
    rows = [{**r, **stamp} for r in rows]
    lat_rows = [{**r, **stamp} for r in lat_rows]

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("# Benchmark results (single chip)\n\n")
        f.write(f"Measured {stamp['measured']}, salted slope harness. ")
        f.write(f"Device: {jax.devices()[0].device_kind}; ")
        f.write("coded-bit throughput, OMS, reference accounting "
                "(`main.cpp:311-315`).\n\n")
        f.write("| code | backend | iters | batch | ms/call | Mbps coded "
                "| roofline | vs best GPU baseline |\n")
        f.write("|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            vs = (
                f"{r['vs_baseline']}x (vs {r['baseline_mbps']})"
                if r.get("vs_baseline")
                else "—"
            )
            f.write(
                f"| {r['code']} | {r['backend']} | {r['iters']} "
                f"| {r['batch']} | {r['ms_per_call']} | {r['coded_mbps']} "
                f"| {r['roofline_frac']} ({r['bound']}) | {vs} |\n"
            )
        if lat_rows:
            f.write(
                "\nMinimum-batch latency (one 128-lane tile, 10 iters; "
                "the reference's latency axis, "
                "`ldpc_decoder_arm/main.cpp:612-625`):\n\n"
            )
            f.write("| code | backend | ms / 128-frame call | us/frame "
                    "| Mbps at this batch |\n")
            f.write("|---|---|---|---|---|\n")
            for r in lat_rows:
                f.write(
                    f"| {r['code']} | {r['backend']} | {r['ms_per_call']} "
                    f"| {r['us_per_frame']} | {r['coded_mbps']} |\n"
                )
        f.write("\nRaw records:\n\n```json\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
        for r in lat_rows:
            f.write(json.dumps({"latency": True, **r}) + "\n")
        f.write("```\n")
    print(f"(II) wrote {args.out}")


if __name__ == "__main__":
    main()
