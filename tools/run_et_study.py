"""Early-termination operating-point study (VERDICT round-1 item 5).

Measures, per (code, algo, SNR): fixed-iteration throughput, in-kernel ET
throughput (per-lane freeze + whole-tile iteration predication), and
two-phase compaction-ET throughput (decoder/twophase.py), plus the
convergence statistics that explain them.  Matches the reference's
production configuration 2NMS + EARLY_TERM=1 (``CUDA_2NMS_SIMD.cu:17``).

Run on the live chip:  python tools/run_et_study.py [--quick]
Writes benchmarks/ET.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from ldpcgputegra_tpu.bench.harness import (  # noqa: E402
    measure_call,
    measure_host_call,
    throughput_report,
)
from ldpcgputegra_tpu.channel.awgn import AwgnChannel, ChannelSpec  # noqa: E402
from ldpcgputegra_tpu.codes.registry import load_code  # noqa: E402
from ldpcgputegra_tpu.decoder import make_decoder  # noqa: E402
from ldpcgputegra_tpu.decoder.twophase import (  # noqa: E402
    make_twophase_decoder,
    syndrome_fn,
)
from ldpcgputegra_tpu.ops.layered import LayeredSpec  # noqa: E402
from ldpcgputegra_tpu.utils import enable_compile_cache  # noqa: E402

# (code, batch, [operating SNRs dB])
CONFIGS = [
    ("576x288", 16384, [3.0, 3.5]),
    ("1944x972", 8192, [2.25, 2.75]),
    ("2304x1152", 8192, [2.0, 2.5]),
    # the non-QC gather-path family (SNRs at FER ~4e-3 / ~2e-4 per BER.md)
    ("4000x2000", 4096, [2.0, 2.25]),
]
ALGOS = ["2NMS", "OMS"]


def noisy_inputs(code, batch, snr, n, seed0=0):
    chan = AwgnChannel(code.N, code.K, ChannelSpec())
    chan.configure(snr)
    return [
        chan.generate_zero_int8(jax.random.key(seed0 + i), batch)
        for i in range(n)
    ]


def convergence_stats(code, algo, mc, inputs):
    """P(frame converged WITHIN <= k iterations) at this operating point.

    Measured with ``early_term=True`` so a frame that converges is FROZEN
    at its first convergence (per-lane freeze): the fraction is then
    monotone in k by construction.  Decoding at a fixed depth k instead
    measures "syndrome OK at depth k", which is NOT the same thing —
    2NMS on the (3,6)-regular 4000x2000 actually UNDOES convergence at
    deeper fixed iteration counts (P(ok at 6) = 0.96 vs P(ok at 10) =
    0.70 at 2.25 dB), so the un-frozen stat under-reports the ET
    opportunity exactly where ET matters most (the reference's
    production config is 2NMS + EARLY_TERM=1, CUDA_2NMS_SIMD.cu:17,
    whose per-thread break freezes the same way).

    Backend-independent (decoders are bit-exact across backends), so this
    half of the study can be measured on CPU while throughput waits for
    chip time.
    """
    ok = syndrome_fn(code)
    conv = {}
    for k in (4, 5, 6, 10):
        dk = make_decoder(
            code,
            LayeredSpec(algo=algo, iters=k, minclamp=mc, early_term=True),
        )
        conv[k] = float(np.asarray(ok(dk(inputs[0])[0])).mean())
    return conv


def study_one(name, batch, snr, algo, quick):
    code = load_code(name)
    mc = "pre" if algo == "OMS" else "post"
    spec10 = LayeredSpec(algo=algo, iters=10, minclamp=mc)
    spec_et = LayeredSpec(algo=algo, iters=10, minclamp=mc, early_term=True)
    n_inp = 4 if quick else 12
    ks, kl = (2, 6) if quick else (3, 12)
    inputs = noisy_inputs(code, batch, snr, n_inp)

    # convergence stats at this SNR (per-frame syndrome after k iters)
    conv = convergence_stats(code, algo, mc, inputs)

    rows = {}
    d_fix = make_decoder(code, spec10)
    sec = measure_call(d_fix, inputs, k_small=ks, k_large=kl)
    rows["fixed10"] = throughput_report(sec, batch, code.N)

    d_et = make_decoder(code, spec_et)
    sec = measure_call(d_et, inputs, k_small=ks, k_large=kl)
    it_used = int(d_et(inputs[0])[1])
    rows["kernel_et"] = {
        **throughput_report(sec, batch, code.N), "iters_used": it_used,
    }

    k1 = 5
    tp = make_twophase_decoder(code, spec10, k1=k1)
    # disjoint warm/small/large slices (see measure_host_call): 2+ks+kl
    tp_inputs = noisy_inputs(code, batch, snr, 2 + ks + kl, seed0=1000)
    # compile EVERY phase-2 bucket executable up front: the round-3 study
    # accidentally timed remote recompiles (one per first-seen bucket) and
    # published 2-5 Mbps for two-phase ET (ADVICE r3 #1)
    sizes = tp.warm_buckets(tp_inputs[0])
    print(f"(II) {name} twophase: warmed phase-2 buckets {sizes}",
          flush=True)
    sec = measure_host_call(tp, tp_inputs, k_small=ks, k_large=kl,
                            repeats=1)
    _, stats = tp(np.asarray(tp_inputs[0]))
    rows["twophase_k5"] = {
        **throughput_report(sec, batch, code.N), **stats,
    }
    return {
        "code": name, "algo": algo, "snr_db": snr, "batch": batch,
        "frac_converged": conv, "rows": rows,
    }


def conv_only(out):
    """Measure and write ONLY the convergence statistics (CPU-feasible);
    ET throughput stays pending the chip (tools/hw_runbook.sh et)."""
    import jax

    recs = []
    for name, batch, snrs in CONFIGS:
        code = load_code(name)
        for algo in ALGOS:
            mc = "pre" if algo == "OMS" else "post"
            for snr in snrs:
                inputs = noisy_inputs(code, batch, snr, 1)
                conv = convergence_stats(code, algo, mc, inputs)
                recs.append({
                    "code": name, "algo": algo, "snr_db": snr,
                    "batch": batch, "frac_converged": conv,
                    "backend": jax.default_backend(),
                })
                print(f"(II) {name} {algo} @{snr} dB: "
                      + " ".join(f"P(<={k})={v:.3f}"
                                 for k, v in conv.items()), flush=True)
    if os.path.dirname(out):  # bare filename -> cwd, nothing to make
        os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        f.write("# Early-termination convergence statistics\n\n")
        f.write(
            "Fraction of frames whose syndrome clears within k layered "
            "iterations at each operating SNR (batch per cell as listed; "
            "backend-independent — decoders are bit-exact across "
            "backends — so these CPU-measured numbers are exactly the "
            "chip's).  They bound the achievable early-termination "
            "speedup: mean iters >= sum_k k*P(conv=k), and the in-kernel "
            "whole-tile predication only helps once EVERY lane in a tile "
            "has converged.  Throughput at these operating points is "
            "measured on hardware (tools/hw_runbook.sh et -> ET.md).\n\n"
            "Measured with the per-lane early-termination FREEZE (a "
            "converged frame keeps its first-convergence bits), which is "
            "what makes the fraction monotone in k.  Without the freeze "
            "the stat is 'syndrome OK at exactly depth k', and that is "
            "materially different where ET matters most: 2NMS on the "
            "(3,6)-regular 4000x2000 UNDOES convergence as fixed-depth "
            "decoding continues (ok-at-6 = 0.957 vs ok-at-10 = 0.696 at "
            "2.25 dB) — deep unfrozen 2NMS iterations actively hurt this "
            "code, so the reference's production EARLY_TERM (per-thread "
            "break, CUDA_2NMS_SIMD.cu:17) and this framework's freeze "
            "are correctness features there, not just speed.\n\n"
        )
        f.write("| code | algo | SNR (dB) | P(<=4) | P(<=5) | P(<=6) "
                "| P(<=10) |\n|---|---|---|---|---|---|---|\n")
        for r in recs:
            c = r["frac_converged"]
            f.write(f"| {r['code']} | {r['algo']} | {r['snr_db']} "
                    f"| {c[4]:.3f} | {c[5]:.3f} | {c[6]:.3f} "
                    f"| {c[10]:.3f} |\n")
        f.write("\nRaw records:\n\n```json\n")
        for r in recs:
            f.write(json.dumps(r) + "\n")
        f.write("```\n")
    print(f"(II) wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="one tiny config (tool smoke test, any backend); "
                    "does not overwrite the default output")
    ap.add_argument("--conv-only", action="store_true",
                    help="measure only the (backend-independent) "
                    "convergence fractions -> benchmarks/ET_convergence.md")
    ap.add_argument("--out", default="benchmarks/ET.md")
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
    if args.conv_only:
        out = args.out
        if out == "benchmarks/ET.md":
            out = "benchmarks/ET_convergence.md"
        conv_only(out)
        return
    configs, algos = CONFIGS, ALGOS
    if args.smoke:
        configs, algos = [("576x288", 512, [3.0])], ["OMS"]
        args.quick = True
        if args.out == "benchmarks/ET.md":
            args.out = "/tmp/ET_smoke.md"
    recs = []
    for name, batch, snrs in configs:
        for algo in algos:
            for snr in snrs:
                try:
                    r = study_one(name, batch, snr, algo, args.quick)
                except Exception as e:  # noqa: BLE001
                    print(f"(EE) {name} {algo} {snr}: {e}")
                    continue
                recs.append(r)
                f10 = r["rows"]["fixed10"]["coded_mbps"]
                ket = r["rows"]["kernel_et"]["coded_mbps"]
                tp5 = r["rows"]["twophase_k5"]["coded_mbps"]
                print(
                    f"(PERF) {name} {algo} @{snr} dB: fixed10 {f10:.0f} | "
                    f"kernelET {ket:.0f} (iters {r['rows']['kernel_et']['iters_used']}) | "
                    f"twophase {tp5:.0f} Mbps "
                    f"(eff iters {r['rows']['twophase_k5']['eff_iters_per_frame']:.1f})",
                    flush=True,
                )
    if not recs:
        print("(EE) no configuration succeeded; leaving existing output "
              "untouched")
        return
    if os.path.dirname(args.out):
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("# Early-termination operating-point study\n\n")
        f.write(
            "Reference production config: 2NMS + EARLY_TERM "
            "(`CUDA_2NMS_SIMD.cu:17`).  `kernel ET` = per-lane freeze + "
            "whole-tile iteration predication; `twophase` = compaction ET "
            "(`decoder/twophase.py`; frames converged by k1 are frozen "
            "exactly, late-converging frames run the full budget).\n\n"
        )
        f.write("| code | algo | SNR | P(conv<=5) | fixed10 Mbps | "
                "kernel-ET Mbps (iters) | twophase Mbps (eff iters) |\n")
        f.write("|---|---|---|---|---|---|---|\n")
        for r in recs:
            rows = r["rows"]
            f.write(
                f"| {r['code']} | {r['algo']} | {r['snr_db']} "
                f"| {r['frac_converged'][5]:.3f} "
                f"| {rows['fixed10']['coded_mbps']:.0f} "
                f"| {rows['kernel_et']['coded_mbps']:.0f} "
                f"({rows['kernel_et']['iters_used']}) "
                f"| {rows['twophase_k5']['coded_mbps']:.0f} "
                f"({rows['twophase_k5']['eff_iters_per_frame']:.1f}) |\n"
            )
        f.write("\nRaw records:\n\n```json\n")
        for r in recs:
            f.write(json.dumps(r) + "\n")
        f.write("```\n")
    print(f"(II) wrote {args.out}")


if __name__ == "__main__":
    main()
