#!/usr/bin/env python3
"""Decisive mechanics check: does per-tile iteration predication SKIP?

The kernel-ET study (benchmarks/ET.md) measured ET <= fixed-10 at every
high-SNR point, but its `iters` column is the max over tiles, which is
pinned to 10 by a single straggler frame — it cannot distinguish "tiles
skip and the savings are eaten by overhead" from "the pl.when body
executes regardless".  This tool separates the two with inputs at the
extremes:

  clean  — noiseless all-zero frames (LLR = -26..-30): every lane's
           syndrome clears on iteration 1, so from iteration 2 on EVERY
           tile's `jnp.any(active)` is false and the predicated body
           (`pallas_layered.py::iteration`) should be skipped.  A
           working skip puts the ET kernel near the fixed-1 floor.
  noisy  — 0 dB frames: essentially no lane converges within 10
           iterations; the ET kernel pays 10 full iterations plus the
           ET accounting — this bounds the per-iteration ET overhead.

Interpretation:
  clean_et ~= fixed1 + eps  -> predication skips; the study's losses are
                               ET accounting + convergence-tail effects.
  clean_et ~= noisy_et      -> the predicated body runs regardless
                               (Mosaic executes both arms); per-tile ET
                               can never pay and ET.md should say so.

Run on the live chip: python tools/et_skip_diag.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from ldpcgputegra_tpu.bench.harness import measure_call  # noqa: E402
from ldpcgputegra_tpu.codes.registry import load_code  # noqa: E402
from ldpcgputegra_tpu.kernels import make_pallas_decoder  # noqa: E402
from ldpcgputegra_tpu.ops.layered import LayeredSpec  # noqa: E402
from ldpcgputegra_tpu.utils import enable_compile_cache  # noqa: E402

CONFIGS = [("576x288", 16384), ("2304x1152", 8192)]


def clean_inputs(code, batch, n):
    """Distinct noiseless all-zero-codeword LLR batches.

    Magnitudes vary per input (26..30) so the relay's executable+operand
    dedup can't collapse the timing loop; every lane still converges on
    iteration 1 (bit = app > 0 and every APP stays strongly negative).
    """
    outs = []
    for i in range(n):
        mag = 26 + ((np.arange(code.N, dtype=np.int32) + i) % 5)
        llr = np.broadcast_to(-mag.astype(np.int8), (batch, code.N))
        outs.append(np.ascontiguousarray(llr))
    return outs


def noisy_inputs(code, batch, n, snr=0.0):
    import jax

    from ldpcgputegra_tpu.channel.awgn import AwgnChannel, ChannelSpec

    chan = AwgnChannel(code.N, code.K, ChannelSpec())
    chan.configure(snr)
    return [
        chan.generate_zero_int8(jax.random.key(9100 + i), batch)
        for i in range(n)
    ]


def main() -> None:
    from ldpcgputegra_tpu.utils import apply_platform_env, device_available

    apply_platform_env()
    if not device_available():
        print("(EE) backend unavailable; aborting")
        return
    enable_compile_cache()
    import jax

    for name, batch in CONFIGS:
        code = load_code(name)
        base = LayeredSpec(algo="2NMS", iters=10, minclamp="post")
        et = dataclasses.replace(base, early_term=True)
        variants = [
            ("fixed10", make_pallas_decoder(code, base)),
            ("fixed1", make_pallas_decoder(
                code, dataclasses.replace(base, iters=1))),
            ("et_tb256", make_pallas_decoder(code, et)),
            ("et_tb128", make_pallas_decoder(code, et, batch_tile=128)),
        ]
        for kind, inputs in (
            ("clean", clean_inputs(code, batch, 6)),
            ("noisy", noisy_inputs(code, batch, 6)),
        ):
            row = {"code": name, "batch": batch, "kind": kind}
            for label, dec in variants:
                bits, iters = dec(inputs[0])
                jax.block_until_ready(bits)
                if kind == "clean":
                    assert int(np.asarray(bits).sum()) == 0, (
                        f"{name} {label}: clean input did not decode to "
                        "the all-zero codeword"
                    )
                sec = measure_call(dec, inputs)
                row[label + "_ms"] = round(sec * 1e3, 3)
                row[label + "_iters"] = int(np.max(np.asarray(iters)))
            row["et256_skip_ratio"] = round(
                row["fixed10_ms"] / row["et_tb256_ms"], 2)
            print("(PERF) " + json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
