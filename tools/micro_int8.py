#!/usr/bin/env python3
"""Characterize the XLA int8 elementwise pathology on this chip and its
implications for the decode wrappers (round 5).

Measured facts that motivated this tool: int8 [16384,576] `x+1` ran at
15 GB/s r+w while int32 ran 233 GB/s; `jnp.take` row gathers on int8
were 2 ms; a one-hot bf16 MXU matmul gather was 3.3x faster.  This tool
pins down WHICH int8 ops are slow (elementwise/cast vs pure layout
copies vs matmul operands) so wrapper code can route around the slow
ones.  Appends benchmarks/MICRO_INT8.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ldpcgputegra_tpu.bench.harness import measure_call  # noqa: E402
from ldpcgputegra_tpu.utils import enable_compile_cache  # noqa: E402


def main() -> None:
    from ldpcgputegra_tpu.utils import apply_platform_env, device_available

    apply_platform_env()
    if not device_available():
        print("(EE) backend unavailable; aborting")
        return
    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    B, N, t = 16384, 576, 256
    rng = np.random.default_rng(0)
    i8 = [jnp.asarray(rng.integers(-31, 32, size=(B, N)).astype(np.int8))
          for _ in range(6)]
    gat = jnp.asarray(rng.integers(0, B, size=(t,)).astype(np.int32))
    rows = {}

    def bench(label, f):
        f = jax.jit(f)
        jax.block_until_ready(f(i8[0]))
        sec = measure_call(f, i8)
        gbs = 2 * i8[0].nbytes / sec / 1e9
        rows[label] = {"ms": round(sec * 1e3, 3), "gbs": round(gbs, 1)}
        print(f"(II) {label}: {sec*1e3:.3f} ms (~{gbs:.0f} GB/s vs "
              f"{i8[0].nbytes/1e6:.1f} MB input)", flush=True)

    bench("int8_add1", lambda x: x + 1)
    bench("int8_to_int32_cast", lambda x: x.astype(jnp.int32))
    bench("int8_to_bf16_cast", lambda x: x.astype(jnp.bfloat16))
    bench("int8_transpose", lambda x: x.T)
    bench("int8_transpose_reshape",
          lambda x: x.T.reshape(N // 24 if N % 24 == 0 else 1, -1, B))
    bench("int8_row_take_t", lambda x: jnp.take(x, gat, axis=0))
    oh8 = (gat[:, None] == jnp.arange(B, dtype=jnp.int32)[None, :]) \
        .astype(jnp.int8)

    def dot_i8(x):
        return jax.lax.dot_general(
            oh8, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.int8)

    bench("int8xint8_mxu_gather", dot_i8)
    oh16 = oh8.astype(jnp.bfloat16)

    def dot_bf16(x):
        return jnp.dot(oh16, x.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32).astype(jnp.int8)

    bench("bf16_mxu_gather", dot_bf16)

    out = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                       "MICRO_INT8.md")
    with open(out, "w") as f:
        f.write("# int8 op pathology on this chip\n\n")
        f.write(
            f"Measured {time.strftime('%Y-%m-%d')}, [{B}, {N}] int8 "
            "operands, slope harness.  XLA elementwise/cast traffic on "
            "int8 runs far below HBM speed on this chip (int32 "
            "elementwise measured 233 GB/s in the same harness); this "
            "table pins which op classes pay it, steering wrapper "
            "design (two-phase ET's tail gather uses the MXU instead "
            "of `jnp.take` because of these numbers).\n\n"
            "| op | ms | effective GB/s |\n|---|---|---|\n"
        )
        for k, v in rows.items():
            f.write(f"| {k} | {v['ms']} | {v['gbs']} |\n")
        f.write("\n```json\n" + json.dumps(rows) + "\n```\n")
    print(f"(II) wrote {out}")


if __name__ == "__main__":
    main()
