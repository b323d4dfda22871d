#!/usr/bin/env python3
"""On-chip BER spot check (VERDICT r3 next-step 7).

The BER book (benchmarks/BER.md) is CPU-measured, justified by a
backend-independence argument: decoders are bit-exact across backends
(silicon-validated) and the channel is counter-based threefry, which is
platform-deterministic.  This tool closes the loop with direct on-chip
evidence: it runs the SAME ``run_sweep`` pipeline — same SweepConfig,
same seed, same per-batch key folding — once on the live TPU and once in
a CPU subprocess, and asserts the (frames, bit-error, frame-error)
counters are IDENTICAL.  It also checks the measured FER against the
stored curve point within 4-sigma binomial error (the stored point used
a different fold index pi and more frames, so only statistical agreement
is expected there).

Run on the live chip: python tools/ber_spotcheck.py
Appends a record block to benchmarks/BER.md.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# (code, algo, iters, snr, batch, n_batches) — one per flagship curve
# family; snr sits on the stored curve's grid (run_ber_curves.CURVES)
SPOTS = [
    ("1944x972", "OMS", 10, 2.0, 8192, 2),
    ("576x288", "OMS", 10, 2.5, 16384, 2),
    ("4000x2000", "OMS", 10, 2.0, 4096, 2),
    ("64800x32400", "OMS", 10, 1.625, 512, 4),
]

_SNIPPET = r"""
import json, sys
import numpy as np
from ldpcgputegra_tpu.utils import apply_platform_env, enable_compile_cache
apply_platform_env()
enable_compile_cache()
from ldpcgputegra_tpu.sim.sweep import SweepConfig, run_sweep
code, algo, iters, snr, batch, nb = sys.argv[1:7]
cfg = SweepConfig(
    code=code, algo=algo, iters=int(iters),
    snr_min=float(snr), snr_max=float(snr), snr_step=1.0,
    batch=int(batch), max_frames=int(nb) * int(batch),
    max_fe=10**9, auto_fe=False, early_term=True,
)
res = run_sweep(cfg, progress=False)
p = res.points[0]
import jax
print("SPOT " + json.dumps({
    "backend": jax.default_backend(),
    "frames": p.frames, "be": p.be, "fe": p.fe,
}))
"""


def run_side(spot, env_extra) -> dict:
    code, algo, iters, snr, batch, nb = spot
    env = dict(os.environ, PYTHONPATH="/root/repo:/root/.axon_site",
               **env_extra)
    p = subprocess.run(
        [sys.executable, "-u", "-c", _SNIPPET, code, algo, str(iters),
         str(snr), str(batch), str(nb)],
        capture_output=True, text=True, env=env,
        cwd=os.path.join(os.path.dirname(__file__), ".."), timeout=7200,
    )
    for line in p.stdout.splitlines():
        if line.startswith("SPOT "):
            return json.loads(line[5:])
    raise RuntimeError(
        f"{code}: no SPOT line (rc={p.returncode}): {p.stderr[-400:]}"
    )


def stored_point(code, algo, iters, snr):
    path = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                        "ber_data", f"{code}_{algo}_{iters}.json")
    if not os.path.exists(path):
        return None
    for p in json.load(open(path))["points"]:
        if abs(p["snr_db"] - snr) < 1e-9:
            return p
    return None


def main() -> None:
    from ldpcgputegra_tpu.utils import device_available

    if not device_available():
        print("(EE) backend unavailable (TPU relay down); aborting")
        return
    recs = []
    for spot in SPOTS:
        code, algo, iters, snr, batch, nb = spot
        tpu = run_side(spot, {})
        cpu = run_side(spot, {"JAX_PLATFORMS": "cpu"})
        same = (tpu["frames"], tpu["be"], tpu["fe"]) == (
            cpu["frames"], cpu["be"], cpu["fe"])
        rec = {
            "code": code, "algo": algo, "iters": iters, "snr_db": snr,
            "frames": tpu["frames"],
            "tpu": {"be": tpu["be"], "fe": tpu["fe"],
                    "backend": tpu["backend"]},
            "cpu": {"be": cpu["be"], "fe": cpu["fe"]},
            "counters_identical": same,
        }
        st = stored_point(code, algo, iters, snr)
        if st is not None and tpu["frames"]:
            fer = tpu["fe"] / tpu["frames"]
            p0 = st["fer"]
            sig = math.sqrt(max(p0 * (1 - p0), 1e-12) / tpu["frames"])
            rec["stored_fer"] = p0
            rec["tpu_fer"] = fer
            rec["within_4sigma_of_stored"] = abs(fer - p0) <= 4 * sig + 1e-12
        recs.append(rec)
        print("(SPOT) " + json.dumps(rec), flush=True)
        if not same:
            raise SystemExit(f"(EE) {code}: TPU and CPU counters differ")

    out = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                       "BER.md")
    import time

    with open(out, "a") as f:
        f.write(f"\n## On-chip spot checks ({time.strftime('%Y-%m-%d')})\n\n")
        f.write(
            "`run_sweep` with identical SweepConfig (seed 1234, same "
            "per-batch key folding) executed on the live TPU and on CPU; "
            "counters asserted IDENTICAL — direct silicon evidence for "
            "the backend-independence argument behind this CPU-measured "
            "BER book.  (`within_4sigma_of_stored` compares the "
            "spot-check FER to the stored curve point statistically; the "
            "stored point used a different PRNG fold index and more "
            "frames, so only statistical agreement applies.)\n\n```json\n"
        )
        for r in recs:
            f.write(json.dumps(r) + "\n")
        f.write("```\n")
    print(f"(II) appended spot checks to {out}")


if __name__ == "__main__":
    main()
