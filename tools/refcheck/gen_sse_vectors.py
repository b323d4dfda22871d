#!/usr/bin/env python3
"""Generate committed SSE refcheck vectors: outputs of the reference's
COMPILED SSE fixed-point decoders (built unmodified) on fixed-seed LLR
batches — refcheck_nms_sse_<code>.npz (iters x normalization factors)
and refcheck_oms_sse_<code>.npz (iters x offsets).

Needs g++ and /root/reference; the committed npz makes the bit-equality
test self-contained everywhere else (mirrors the scalar-OMS refcheck
vectors).  Run from the repo root:

    python tools/refcheck/gen_sse_vectors.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from refcheck.build import (  # noqa: E402
    build_nms_sse_oracle,
    build_oms_sse_oracle,
    parse_x86_code,
    run_nms_sse_oracle,
    run_oms_sse_oracle,
)

VEC_DIR = os.path.join(
    os.path.dirname(__file__), "..", "..", "tests", "vectors"
)
CODES = ["576x288", "1944x972", "2304x1152"]
# NMS (iters, factor/32): 24 = the CUDA kernels' 0.75, 29 = the x86
# default (main_p.cpp:136), 31 ~ plain min-sum
CONFIGS = [(3, 24), (10, 24), (3, 29), (10, 29), (5, 31)]
# OMS (iters, offset): offset 1 is the default beta, 0 degenerates to MS
OMS_CONFIGS = [(3, 1), (10, 1), (5, 0), (5, 2)]


def main() -> None:
    wd = tempfile.mkdtemp(prefix="refcheck_nms_")
    for name in CODES:
        binary = build_nms_sse_oracle(name, wd)
        code = parse_x86_code(name)
        rng = np.random.default_rng(20260818)
        llr = np.clip(
            8.0 * rng.normal(-1.0, 0.9, size=(16, code.N)), -31, 31
        ).astype(np.int8)
        out = {
            "llr": llr,
            "configs": np.asarray(CONFIGS, np.int64),
            "code_N": np.asarray(code.N),
            "class_degs": np.asarray([c.deg for c in code.classes]),
            "class_counts": np.asarray([c.count for c in code.classes]),
            "edges": np.concatenate(
                [ci.reshape(-1) for ci in code.class_idx]
            ),
        }
        for ci, (iters, factor) in enumerate(CONFIGS):
            out[f"bits_{ci}"] = run_nms_sse_oracle(
                binary, llr, iters=iters, factor=factor
            )
        path = os.path.join(VEC_DIR, f"refcheck_nms_sse_{name}.npz")
        np.savez_compressed(path, **out)
        print(f"wrote {path} ({len(CONFIGS)} configs, 16 frames)")

        binary_o = build_oms_sse_oracle(name, wd)
        out_o = {k: v for k, v in out.items() if not k.startswith("bits_")}
        out_o["configs"] = np.asarray(OMS_CONFIGS, np.int64)
        for ci, (iters, offset) in enumerate(OMS_CONFIGS):
            out_o[f"bits_{ci}"] = run_oms_sse_oracle(
                binary_o, llr, iters=iters, offset=offset
            )
        path = os.path.join(VEC_DIR, f"refcheck_oms_sse_{name}.npz")
        np.savez_compressed(path, **out_o)
        print(f"wrote {path} ({len(OMS_CONFIGS)} configs, 16 frames)")


if __name__ == "__main__":
    main()
