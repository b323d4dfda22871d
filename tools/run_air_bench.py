#!/usr/bin/env python3
"""End-to-end "air throughput" + pipeline-overlap benchmark (VERDICT r3
next-step 5; depth cadence + stage breakdown reworked per VERDICT r4 #3).

The reference's headline metric is the FULL simulation loop — noise
generation + interleave + decode + error count — not decode alone
(``code/gpu_fixed/main.cpp:305-318`` times the whole loop;
``paper/ldpcGpuTegra.tex:298`` gives the per-stage breakdown, and the
3-stream overlap buys +30% there).  This tool measures the same loop on
the live chip:

* the whole batch — channel generation, decode, error count — is ONE
  jitted executable (the sweep's ``sim_step`` fusion, sim/sweep.py:236);
* ``pipeline_depth`` batches are kept in flight like ``run_sweep``'s
  dispatch window, and the tiny per-batch counters are fetched ONE
  STACKED TRANSFER PER WINDOW DRAIN, with the host->device copy started
  asynchronously so the ~25 ms relay round trip overlaps the next
  window's dispatch/compute.  (The round-4 cadence fetched
  half-a-window per loop — at depth 2 that is one blocking RTT per
  batch, which is why depth 2 LOST to depth 1: VERDICT r4 weak #5.)
* wall-clock over many batches (>=128: walls must dwarf RTT noise) with
  per-batch distinct PRNG keys — no computation ever repeats, so relay
  dedup cannot shrink the time;
* a per-stage device-time breakdown (channel / decode / count / fused
  step, slope-harness measured) is published next to the air numbers so
  the dispatch overhead is visible, comparable to the reference's
  table (``tex:298``).

Writes benchmarks/AIR.md.  Run: python tools/run_air_bench.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ldpcgputegra_tpu.bench.harness import measure_call  # noqa: E402
from ldpcgputegra_tpu.channel.awgn import AwgnChannel, ChannelSpec  # noqa: E402
from ldpcgputegra_tpu.codes.registry import load_code  # noqa: E402
from ldpcgputegra_tpu.decoder import backend_for, make_decoder  # noqa: E402
from ldpcgputegra_tpu.ops.layered import LayeredSpec  # noqa: E402
from ldpcgputegra_tpu.sim.analyzer import count_errors_async  # noqa: E402
from ldpcgputegra_tpu.utils import enable_compile_cache  # noqa: E402

# flagship codes, one per kernel family (suite batch sizes)
CONFIGS = [
    ("576x288", 16384),
    ("2304x1152", 8192),
    ("4000x2000", 4096),
    ("64800x32400", 512),
]
DEPTHS = [1, 2, 4, 8, 16]
SNR_DB = 2.5


def build_parts(code, spec, batch):
    """The fused sim step plus its three stages as separate jitted fns
    (breakdown only — production uses the fused executable)."""
    chan = AwgnChannel(code.N, code.K, ChannelSpec())
    chan.configure(SNR_DB)
    decoder = make_decoder(code, spec)
    from ldpcgputegra_tpu.channel.awgn import _generate_zero_int8

    @jax.jit
    def chan_fn(i):
        # int32 seed input (not a typed PRNG key): measure_call's probe
        # cannot reduce key<fry> arrays
        key = jax.random.fold_in(jax.random.key(3), i)
        return _generate_zero_int8(
            key, (batch, code.N), chan.sigma, chan.factor, chan.spec
        )

    @jax.jit
    def dec_fn(llr):
        return decoder(llr)[0]

    @jax.jit
    def cnt_fn(bits):
        return count_errors_async(bits)

    @jax.jit
    def step(key, sigma_t, factor_t):
        llr = _generate_zero_int8(
            key, (batch, code.N), sigma_t, factor_t, chan.spec
        )
        decoded, _ = decoder(llr)
        return count_errors_async(decoded)

    @jax.jit
    def step_i(i):  # int32-seeded variant for the slope harness
        key = jax.random.fold_in(jax.random.key(3), i)
        return step(key, chan.sigma, chan.factor)

    return step, chan, chan_fn, dec_fn, cnt_fn, step_i


def run_loop(step, chan, depth: int, n_batches: int, seed0: int) -> float:
    """Wall seconds for n_batches at a given in-flight window depth.

    Fetch cadence: ONE stacked counter transfer per window drain, with
    the device->host copy started async so the round trip overlaps the
    NEXT window's dispatch and compute."""
    base = jax.random.key(7)
    inflight: list = []
    pending = None
    next_k = 0
    t0 = time.perf_counter()
    while next_k < n_batches or inflight or pending is not None:
        while next_k < n_batches and len(inflight) < depth:
            key = jax.random.fold_in(base, seed0 + next_k)
            inflight.append(step(key, chan.sigma, chan.factor))
            next_k += 1
        stacked = None
        if inflight:
            stacked = jnp.stack(
                [jnp.stack([be, fe]) for be, fe in inflight]
            )
            inflight = []
            try:
                stacked.copy_to_host_async()
            except Exception:  # noqa: BLE001 - overlap is best-effort
                pass
        if pending is not None:
            np.asarray(pending)  # one RTT per window, overlapped above
        pending = stacked
    return time.perf_counter() - t0


def build_scan_step(code, spec, batch, scan_steps: int):
    """S sim steps folded into ONE executable via lax.scan.

    The depth-pipelined loop above still pays one relay dispatch per
    batch (~2.7 ms measured — compare depth-8's 5.3 ms/batch wall
    against the 2.7 ms fused device step at 576x288); folding S steps
    into one executable amortizes the dispatch S-fold, which is the
    TPU answer to the reference's multi-stream dispatch economics
    (`paper/ldpcGpuTegra.tex:298`).  The scan body is traced once, so
    the executable is the same size as the single step.
    """
    chan = AwgnChannel(code.N, code.K, ChannelSpec())
    chan.configure(SNR_DB)
    decoder = make_decoder(code, spec)
    from ldpcgputegra_tpu.channel.awgn import _generate_zero_int8

    @jax.jit
    def multi_step(i0, sigma_t, factor_t):
        def body(carry, i):
            key = jax.random.fold_in(jax.random.key(3), i)
            llr = _generate_zero_int8(
                key, (batch, code.N), sigma_t, factor_t, chan.spec
            )
            decoded, _ = decoder(llr)
            be, fe = count_errors_async(decoded)
            return carry, jnp.stack([be, fe])

        _, cs = jax.lax.scan(
            body, 0, i0 + jnp.arange(scan_steps, dtype=jnp.int32)
        )
        return cs  # [S, 2] counters

    return multi_step, chan


def run_loop_scan(multi_step, chan, depth: int, n_calls: int,
                  scan_steps: int, seed0: int) -> float:
    """Wall seconds for n_calls scan-folded steps at window depth."""
    inflight: list = []
    pending = None
    next_k = 0
    t0 = time.perf_counter()
    while next_k < n_calls or inflight or pending is not None:
        while next_k < n_calls and len(inflight) < depth:
            i0 = jnp.asarray(seed0 + next_k * scan_steps, jnp.int32)
            inflight.append(multi_step(i0, chan.sigma, chan.factor))
            next_k += 1
        stacked = None
        if inflight:
            stacked = jnp.stack(inflight)
            inflight = []
            try:
                stacked.copy_to_host_async()
            except Exception:  # noqa: BLE001 - overlap is best-effort
                pass
        if pending is not None:
            np.asarray(pending)
        pending = stacked
    return time.perf_counter() - t0


def bench_scan(name: str, batch: int, quick: bool) -> list[dict]:
    """Scan-folded air rows (S steps per executable x window depth)."""
    code = load_code(name)
    spec = LayeredSpec(algo="OMS", iters=10, early_term=False)
    backend = backend_for(code, spec)
    _, chan0, chan_fn, dec_fn, _, _ = build_parts(code, spec, batch)
    llrs = [chan_fn(jnp.asarray(i, jnp.int32)) for i in range(4)]
    jax.block_until_ready([dec_fn(x) for x in llrs])
    t_dec = measure_call(dec_fn, llrs)
    decode_mbps = batch * code.N / t_dec / 1e6
    n_batches = 16 if quick else 128
    rows = []
    for scan_steps in (8,):
        multi_step, chan = build_scan_step(code, spec, batch, scan_steps)
        n_calls = max(1, n_batches // scan_steps)
        for depth in (1, 2, 4):
            run_loop_scan(multi_step, chan, depth, 2 * depth, scan_steps,
                          seed0=10**7 + depth)
            sec = run_loop_scan(multi_step, chan, depth, n_calls,
                                scan_steps, seed0=depth * 10**6)
            mbps = n_calls * scan_steps * batch * code.N / sec / 1e6
            row = {
                "code": name, "backend": backend, "iters": spec.iters,
                "batch": batch, "scan_steps": scan_steps, "depth": depth,
                "n_batches": n_calls * scan_steps,
                "wall_s": round(sec, 3),
                "air_mbps": round(mbps, 1),
                "air_vs_decode_only": round(mbps / decode_mbps, 2),
            }
            rows.append(row)
            print("(PERF) " + json.dumps(row), flush=True)
    return rows


def bench_one(name: str, batch: int, quick: bool) -> list[dict]:
    code = load_code(name)
    spec = LayeredSpec(algo="OMS", iters=10, early_term=False)
    backend = backend_for(code, spec)
    step, chan, chan_fn, dec_fn, cnt_fn, step_i = build_parts(
        code, spec, batch
    )
    n_batches = 16 if quick else 128

    # stage breakdown (device ms, slope harness — dedup-proof)
    idxs = [jnp.asarray(i, jnp.int32) for i in range(8)]
    llrs = [chan_fn(i) for i in idxs]
    bitss = [dec_fn(x) for x in llrs]
    jax.block_until_ready(bitss)
    t_chan = measure_call(chan_fn, idxs)
    t_dec = measure_call(dec_fn, llrs)
    t_cnt = measure_call(cnt_fn, bitss)
    t_step = measure_call(step_i, idxs)
    stages = {
        "chan_ms": round(t_chan * 1e3, 3),
        "decode_ms": round(t_dec * 1e3, 3),
        "count_ms": round(t_cnt * 1e3, 3),
        "fused_step_ms": round(t_step * 1e3, 3),
    }
    decode_mbps = batch * code.N / t_dec / 1e6
    print(f"(II) {name} stages: {json.dumps(stages)} "
          f"(decode-only {decode_mbps:.0f} Mbps)", flush=True)

    rows = []
    base_mbps = None
    for depth in DEPTHS:
        # warm this depth's stack executable outside the timed region
        run_loop(step, chan, depth, 2 * depth, seed0=10**6 + depth)
        sec = run_loop(step, chan, depth, n_batches, seed0=depth * 10**5)
        mbps = n_batches * batch * code.N / sec / 1e6
        row = {
            "code": name, "backend": backend, "iters": spec.iters,
            "batch": batch, "depth": depth, "n_batches": n_batches,
            "wall_s": round(sec, 3),
            "air_mbps": round(mbps, 1),
            "air_vs_decode_only": round(mbps / decode_mbps, 2),
            **stages,
        }
        if depth == 1:
            base_mbps = mbps
        else:
            row["gain_vs_depth1"] = round(mbps / base_mbps, 2)
        rows.append(row)
        print("(PERF) " + json.dumps(row), flush=True)
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="benchmarks/AIR.md")
    ap.add_argument(
        "--scan-only", action="store_true",
        help="run only the scan-folded variant and APPEND its section "
        "to --out (the standard depth sweep's document is preserved)",
    )
    args = ap.parse_args()
    from ldpcgputegra_tpu.utils import apply_platform_env, device_available

    apply_platform_env()
    if not device_available():
        print("(EE) backend unavailable (TPU relay down); aborting")
        return
    enable_compile_cache()

    if args.scan_only:
        scan_rows = []
        for name, batch in CONFIGS:
            try:
                scan_rows += bench_scan(name, batch, args.quick)
            except Exception as e:  # noqa: BLE001
                print(f"(EE) scan {name} failed: "
                      f"{type(e).__name__}: {e}", flush=True)
        with open(args.out, "a") as f:
            f.write(
                f"\n## Scan-folded dispatch ({time.strftime('%Y-%m-%d')})"
                "\n\nS=8 sim steps folded into ONE executable via "
                "`lax.scan` over fold_in indices — amortizes the ~2.7 ms "
                "per-call relay dispatch 8-fold on top of the in-flight "
                "window.  Same accounting as above; counters come back "
                "[S,2] per call, one stacked fetch per window drain.\n\n"
                "| code | batch | S | depth | air Mbps | vs decode-only "
                "|\n|---|---|---|---|---|---|\n"
            )
            for r in scan_rows:
                f.write(
                    f"| {r['code']} | {r['batch']} | {r['scan_steps']} "
                    f"| {r['depth']} | {r['air_mbps']} "
                    f"| {r['air_vs_decode_only']} |\n"
                )
            f.write("\n```json\n")
            for r in scan_rows:
                f.write(json.dumps(r) + "\n")
            f.write("```\n")
        print(f"(II) appended scan section to {args.out}")
        return

    all_rows = []
    for name, batch in CONFIGS:
        try:
            all_rows += bench_one(name, batch, args.quick)
        except Exception as e:  # noqa: BLE001
            print(f"(EE) {name} failed: {type(e).__name__}: {e}", flush=True)

    stamp = time.strftime("%Y-%m-%d")
    with open(args.out, "w") as f:
        f.write("# End-to-end air throughput (single chip)\n\n")
        f.write(
            f"Measured {stamp}.  FULL loop per batch — on-device AWGN "
            "channel + decode + error count, one fused executable — "
            "dispatched through a `pipeline_depth`-deep in-flight window "
            "(the sweep's dispatch loop, `sim/sweep.py:352`); counters "
            "are fetched one stacked transfer per window drain with the "
            "host copy started async, so the ~25 ms relay RTT overlaps "
            "the next window's compute.  This is the reference's "
            "accounting (`main.cpp:305-318`): its best 3-stream GPU "
            "figures are air throughput, and its multi-stream overlap "
            "bought +30% (`paper/ldpcGpuTegra.tex:298`).  Distinct PRNG "
            "keys per batch make every executable+operand pair unique "
            "(relay-dedup-proof).\n\n"
        )
        f.write("## Stage breakdown (device ms per batch, slope harness)"
                "\n\n| code | batch | channel | decode | count | fused "
                "step |\n|---|---|---|---|---|---|\n")
        seen = set()
        for r in all_rows:
            if r["code"] in seen:
                continue
            seen.add(r["code"])
            f.write(
                f"| {r['code']} | {r['batch']} | {r['chan_ms']} "
                f"| {r['decode_ms']} | {r['count_ms']} "
                f"| {r['fused_step_ms']} |\n"
            )
        f.write("\n## Air throughput vs pipeline depth\n\n")
        f.write("| code | backend | batch | depth | air Mbps | gain vs "
                "depth 1 | vs decode-only |\n|---|---|---|---|---|---|"
                "---|\n")
        for r in all_rows:
            f.write(
                f"| {r['code']} | {r['backend']} | {r['batch']} "
                f"| {r['depth']} | {r['air_mbps']} "
                f"| {r.get('gain_vs_depth1', '—')} "
                f"| {r['air_vs_decode_only']} |\n"
            )
        f.write("\nRaw records:\n\n```json\n")
        for r in all_rows:
            f.write(json.dumps({**r, "measured": stamp}) + "\n")
        f.write("```\n")
    print(f"(II) wrote {args.out}")


if __name__ == "__main__":
    main()
