#!/usr/bin/env python3
"""Headline throughput benchmark — decoded coded-Mbit/s on one chip.

Mirrors the reference's throughput accounting: coded bits per wall second,
``Mbps = n_frames * N / t / 1e6`` (``code/gpu_fixed/main.cpp:311-315`` uses
4*threads frames of N bits each).  Headline config matches the paper's
(4000,2000) code at 10 layered OMS iterations; baseline to beat is the
best published figure, 131 Mbps (GTX 680, 3 streams, 10 iters,
``paper/ldpcGpuTegra.tex:353``).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

BASELINE_MBPS = 131.0  # GTX 680, 3 streams, 10 iters, (4000,2000)


def main() -> None:
    from ldpcgputegra_tpu.utils import enable_compile_cache

    enable_compile_cache()
    from ldpcgputegra_tpu.channel.awgn import AwgnChannel, ChannelSpec
    from ldpcgputegra_tpu.codes.registry import load_code
    from ldpcgputegra_tpu.ops.layered import LayeredSpec, make_layered_decoder

    code = load_code("4000x2000")
    iters = 10
    batch = 4096
    spec = LayeredSpec(algo="OMS", iters=iters, early_term=False,
                       minclamp="pre", schedule="auto")
    decoder = make_layered_decoder(code, spec)

    chan = AwgnChannel(code.N, code.K, ChannelSpec())
    chan.configure(3.0)
    llr = chan.generate_zero_int8(jax.random.key(0), batch)
    jax.block_until_ready(llr)

    # compile + warmup
    bits, _ = decoder(llr)
    jax.block_until_ready(bits)

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        bits, _ = decoder(llr)
    jax.block_until_ready(bits)
    dt = (time.perf_counter() - t0) / reps

    mbps = batch * code.N / dt / 1e6
    print(json.dumps({
        "metric": "decode_throughput_4000x2000_oms_10it",
        "value": round(mbps, 2),
        "unit": "coded-Mbps/chip",
        "vs_baseline": round(mbps / BASELINE_MBPS, 3),
    }))


if __name__ == "__main__":
    main()
