#!/usr/bin/env python3
"""Investigate the 1944x972 per-edge efficiency outlier (VERDICT item 8).

Round-1 measurements put 1944x972 (Z=81) at ~55% of the per-edge
throughput of its neighbors 576x288 (Z=24) and 2304x1152 (Z=96).  Static
accounting explains only part of it:

* degree sum per Z-row: 86 edges vs 76 for both neighbors (+13%);
* sublane padding: Z=81 pads to 88 sublane rows (+8.6% memory/vector
  work); Z=24/96 are 8-aligned (zero padding).

The remaining suspect is the cyclic sublane roll itself: a roll over an
8-aligned Z is whole-VREG shuffles, while Z=81 wraps across the ragged
padded boundary every time.  This script isolates that with a roll-only
Pallas microkernel at Z in {24, 81, 88, 96}, then cross-checks the full
decoder against the static-gather kernel (which replaces rolls with
precomputed row gathers) on the same code.

Run on the live chip: python tools/profile_1944.py [--trace]
Appends findings to benchmarks/PROFILE_1944.md.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from ldpcgputegra_tpu.bench.harness import measure_call, throughput_report  # noqa: E402
from ldpcgputegra_tpu.channel.awgn import AwgnChannel, ChannelSpec  # noqa: E402
from ldpcgputegra_tpu.codes.registry import load_code  # noqa: E402
from ldpcgputegra_tpu.decoder import make_decoder  # noqa: E402
from ldpcgputegra_tpu.ops.layered import LayeredSpec  # noqa: E402
from ldpcgputegra_tpu.utils import enable_compile_cache  # noqa: E402

OUT = os.path.join(
    os.path.dirname(__file__), "..", "benchmarks", "PROFILE_1944.md"
)


def roll_microkernel(Z: int, TB: int = 256, n_rolls: int = 512,
                     impl: str = "roll"):
    """Time ``n_rolls`` dependent sublane rolls of one [Z, TB] int32 slab.

    Shifts walk 1..Z-1 (never 0) so every roll is a genuine rotate; the
    chain is data-dependent so Mosaic cannot elide any of them.

    ``impl='roll'`` uses ``pltpu.roll``; ``impl='slice'`` expresses the
    same rotate as a concat of two static slices — the candidate
    replacement if Mosaic's roll takes a slow path for Z % 8 != 0.
    """
    shifts = [(7 * k) % Z or 1 for k in range(1, n_rolls + 1)]

    def rot(x, s):
        if impl == "roll":
            return pltpu.roll(x, s, axis=0)
        return jnp.concatenate([x[Z - s:], x[: Z - s]], axis=0)

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        for s in shifts:
            x = rot(x, s) + 1
        o_ref[...] = x

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Z, TB), jnp.int32),
        )(x)

    inputs = [
        jnp.asarray(np.random.default_rng(i).integers(-31, 31, (Z, TB)),
                    jnp.int32)
        for i in range(24)
    ]
    sec = measure_call(run, inputs, k_small=4, k_large=20)
    return sec / n_rolls


def decode_row(name: str, backend: str, batch: int, iters: int = 10):
    code = load_code(name)
    spec = LayeredSpec(algo="OMS", iters=iters, early_term=False)
    dec = make_decoder(code, spec, backend=backend)
    chan = AwgnChannel(code.N, code.K, ChannelSpec())
    chan.configure(2.0)
    inputs = [
        chan.generate_zero_int8(jax.random.key(50 + i), batch)
        for i in range(6)
    ]
    sec = measure_call(dec, inputs, k_small=4, k_large=20)
    rep = throughput_report(sec, batch, code.N)
    edges = code.M
    per_edge_ps = sec / (batch * edges * iters) * 1e12
    row = {
        "code": name,
        "backend": backend,
        "batch": batch,
        "ms_per_call": round(rep["ms_per_call"], 3),
        "coded_mbps": round(rep["coded_mbps"], 1),
        "ps_per_edge_iter_frame": round(per_edge_ps, 3),
    }
    print("(PERF) " + json.dumps(row), flush=True)
    return row


def z_twin(Z2: int):
    """The decisive structure-vs-alignment A/B: 1944x972's OWN base
    matrix (same 12 block-rows, same 86 block-edges, same degree profile)
    re-expanded at an 8-ALIGNED Z.  If the twin's per-edge time matches
    the aligned neighbors, the deficit is the Z=81 sublane misalignment
    (unaligned pltpu.roll + 81->88 padding); if it matches 1944x972, the
    deficit is the code's structure (more block-edges per row) and the
    roll is innocent."""
    from ldpcgputegra_tpu.codes.registry import make_qc_code

    code = load_code("1944x972")
    nb = code.N // code.Z
    base = np.full((len(code.layers), nb), -1, dtype=np.int64)
    for r, lay in enumerate(code.layers):
        for c, s in zip(np.asarray(lay.qc.cols), np.asarray(lay.qc.shifts)):
            base[r, int(c)] = int(s) % Z2
    return make_qc_code(f"1944twin-Z{Z2}", base, Z2)


def decode_row_code(code, backend: str, batch: int, iters: int = 10):
    spec = LayeredSpec(algo="OMS", iters=iters, early_term=False)
    dec = make_decoder(code, spec, backend=backend)
    chan = AwgnChannel(code.N, code.K, ChannelSpec())
    chan.configure(2.0)
    inputs = [
        chan.generate_zero_int8(jax.random.key(50 + i), batch)
        for i in range(6)
    ]
    sec = measure_call(dec, inputs, k_small=4, k_large=20)
    rep = throughput_report(sec, batch, code.N)
    per_edge_ps = sec / (batch * code.M * iters) * 1e12
    row = {
        "code": code.name,
        "backend": backend,
        "batch": batch,
        "ms_per_call": round(rep["ms_per_call"], 3),
        "coded_mbps": round(rep["coded_mbps"], 1),
        "ps_per_edge_iter_frame": round(per_edge_ps, 3),
    }
    print("(PERF) " + json.dumps(row), flush=True)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true",
                    help="also capture a jax.profiler trace of one decode")
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

    lines = ["# 1944x972 efficiency investigation\n\n"]

    lines.append("## Roll microbenchmark (ns per [Z,256] int32 sublane roll)\n\n")
    lines.append("| Z | 8-aligned | pltpu.roll ns | slice-concat ns |\n")
    lines.append("|---|---|---|---|\n")
    for Z in (24, 81, 88, 96):
        ns_roll = roll_microkernel(Z, impl="roll") * 1e9
        ns_slice = roll_microkernel(Z, impl="slice") * 1e9
        print(f"(PERF) Z={Z}: roll {ns_roll:.2f} ns, slice {ns_slice:.2f} ns",
              flush=True)
        lines.append(
            f"| {Z} | {'yes' if Z % 8 == 0 else 'NO'} "
            f"| {ns_roll:.2f} | {ns_slice:.2f} |\n"
        )

    lines.append("\n## Full decode, per-edge time (10 iters, OMS)\n\n")
    lines.append("| code | backend | ms/call | Mbps | ps/edge/iter/frame |\n")
    lines.append("|---|---|---|---|---|\n")
    rows = [
        decode_row("576x288", "pallas", 16384),
        decode_row("2304x1152", "pallas", 8192),
        decode_row("1944x972", "pallas", 8192),
        # 8-aligned twins of 1944x972's OWN base matrix: same block
        # structure, only Z changes — isolates alignment from structure
        decode_row_code(z_twin(88), "pallas", 8192),
        decode_row_code(z_twin(96), "pallas", 8192),
        decode_row("1944x972", "pallas-gather", 8192),
        decode_row("1944x972", "xla", 8192),
    ]
    for r in rows:
        lines.append(
            f"| {r['code']} | {r['backend']} | {r['ms_per_call']} "
            f"| {r['coded_mbps']} | {r['ps_per_edge_iter_frame']} |\n"
        )

    if args.trace:
        import jax.profiler

        code = load_code("1944x972")
        spec = LayeredSpec(algo="OMS", iters=10, early_term=False)
        dec = make_decoder(code, spec, backend="pallas")
        chan = AwgnChannel(code.N, code.K, ChannelSpec())
        chan.configure(2.0)
        x = chan.generate_zero_int8(jax.random.key(7), 8192)
        jax.block_until_ready(dec(x))  # compile
        with jax.profiler.trace("/tmp/trace_1944"):
            jax.block_until_ready(dec(x))
        lines.append("\nTrace: /tmp/trace_1944\n")

    with open(OUT, "w") as f:
        f.writelines(lines)
    print(f"(II) wrote {OUT}")


if __name__ == "__main__":
    main()
