#!/usr/bin/env python3
"""Headline throughput benchmark — decoded coded-Mbit/s on one chip.

Config matches the paper's largest published per-config figure at equal
iteration count: the (2304,1152) 802.16e QC code, 10 layered OMS
iterations, vs 132 Mbps (GTX 680, 3 streams, ``paper/ldpcGpuTegra.tex:345``).
Throughput accounting is the reference's: coded bits per wall second
(``code/gpu_fixed/main.cpp:311-315``).

Timing uses the slope harness (``ldpcgputegra_tpu.bench.harness``) —
distinct device-resident inputs, single scalar fetch — which is immune to
the remote-backend hazards (async dispatch, computation dedup, RTT).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys

import jax

BASELINE_MBPS = 132.0  # GTX 680, 3 streams, 10 iters, (2304,1152)


def _device_available(timeout_s: int = 180) -> bool:
    """Probe the backend in a subprocess: a dead TPU relay makes
    jax.devices() block forever, which must not hang the caller."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _last_measured() -> tuple[float, str] | None:
    """The most recent 2304x1152@10it record in benchmarks/RESULTS.md,
    returned as (coded_mbps, provenance).  Records written by a live
    bench/suite.py run carry `measured` (ISO date) and `harness` keys;
    records without them predate provenance stamping — i.e. they are the
    ROUND-1 measurement taken with the pre-salt harness whose dedup
    exposure is documented in bench/harness.py."""
    import os

    path = os.path.join(os.path.dirname(__file__), "benchmarks", "RESULTS.md")
    try:
        for line in open(path):
            line = line.strip()
            if line.startswith("{"):
                r = json.loads(line)
                if r.get("code") == "2304x1152" and r.get("iters") == 10:
                    if "measured" in r:
                        prov = (f"measured {r['measured']} with the "
                                f"{r.get('harness', '?')} harness")
                    else:
                        prov = ("the ROUND-1 measurement, pre-salt harness "
                                "(dedup exposure documented in "
                                "bench/harness.py) — old and of unverified "
                                "accuracy")
                    return float(r["coded_mbps"]), prov
    except OSError:
        pass
    return None


def _stale_fallback(reason: str) -> None:
    rec = _last_measured()
    last, prov = rec if rec else (None, "no prior record")
    print(json.dumps({
        "metric": "decode_throughput_2304x1152_oms_10it",
        "value": round(last, 1) if last else 0.0,
        "unit": "coded-Mbps/chip",
        "vs_baseline": round(last / BASELINE_MBPS, 2) if last else 0.0,
        "stale": True,
        "error": f"{reason}; value replays benchmarks/RESULTS.md: {prov}",
    }))


def main() -> None:
    if not _device_available():
        _stale_fallback("TPU relay down at bench time")
        return
    try:
        _measure()
    except Exception as e:  # noqa: BLE001
        _stale_fallback(f"bench failed at runtime: {type(e).__name__}: {e}")


def _measure() -> None:
    from ldpcgputegra_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from ldpcgputegra_tpu.bench import measure_call, throughput_report
    from ldpcgputegra_tpu.channel.awgn import AwgnChannel, ChannelSpec
    from ldpcgputegra_tpu.codes.registry import load_code
    from ldpcgputegra_tpu.decoder import make_decoder
    from ldpcgputegra_tpu.ops.layered import LayeredSpec

    code = load_code("2304x1152")
    batch = 8192
    spec = LayeredSpec(algo="OMS", iters=10, early_term=False,
                       minclamp="pre", schedule="auto")
    decoder = make_decoder(code, spec)

    chan = AwgnChannel(code.N, code.K, ChannelSpec())
    chan.configure(3.0)
    inputs = [
        chan.generate_zero_int8(jax.random.key(i), batch) for i in range(8)
    ]

    sec = measure_call(decoder, inputs)
    rep = throughput_report(sec, batch, code.N)
    print(
        f"(PERF) 2304x1152 OMS 10it: {rep['ms_per_call']:.3f} ms/call, "
        f"{rep['coded_gbps']:.3f} Gbps coded",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "decode_throughput_2304x1152_oms_10it",
        "value": round(rep["coded_mbps"], 1),
        "unit": "coded-Mbps/chip",
        "vs_baseline": round(rep["coded_mbps"] / BASELINE_MBPS, 2),
    }))


if __name__ == "__main__":
    main()
